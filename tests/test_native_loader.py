"""Native C++ loader tests: PNG decode parity vs PIL, threaded batch, npy."""

import os

import numpy as np
import pytest

from stable_nerf_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def png_files(tmp_path_factory, ):
    from PIL import Image

    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    specs = [("RGB", 3), ("RGBA", 4), ("L", 1)]
    for i, (mode, ch) in enumerate(specs):
        arr = rng.integers(0, 255, (40, 56, ch), dtype=np.uint8)
        img = Image.fromarray(arr.squeeze() if ch == 1 else arr, mode=mode)
        p = str(d / f"img{i}_{mode}.png")
        img.save(p)
        paths.append(p)
        arrays.append(np.asarray(img.convert("RGB")))
    return paths, arrays


def test_decode_matches_pil_at_native_size(png_files):
    paths, arrays = png_files
    for p, ref in zip(paths, arrays):
        out = native_loader.decode_image(open(p, "rb").read(),
                                         shape=ref.shape[:2])
        # identity resize → exact match after normalization inversion
        rgb = (out * 0.5 + 0.5) * 255.0
        np.testing.assert_allclose(rgb.transpose(1, 2, 0), ref, atol=0.51)


def test_resize_close_to_pil(png_files):
    from PIL import Image

    paths, arrays = png_files
    p, ref = paths[0], arrays[0]
    out = native_loader.decode_image(open(p, "rb").read(), shape=(20, 28))
    pil = np.asarray(
        Image.fromarray(ref).resize((28, 20), Image.BILINEAR), np.float32
    )
    ours = ((out * 0.5 + 0.5) * 255.0).transpose(1, 2, 0)
    # bilinear implementations differ at edges; bulk must agree closely
    diff = np.abs(ours - pil)
    assert np.median(diff) < 1.5, np.median(diff)
    assert np.mean(diff) < 3.0, np.mean(diff)


def test_threaded_batch(png_files):
    paths, _ = png_files
    out, status = native_loader.load_batch(paths * 4, shape=(32, 32),
                                           n_threads=4)
    assert out.shape == (12, 3, 32, 32)
    assert np.all(status == 0)
    assert np.all(np.isfinite(out))
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_batch_reports_bad_files(png_files, tmp_path):
    paths, _ = png_files
    bad = str(tmp_path / "missing.png")
    out, status = native_loader.load_batch([paths[0], bad], shape=(16, 16))
    assert status[0] == 0 and status[1] != 0


def test_npy_pose_roundtrip(tmp_path):
    pose = np.random.default_rng(0).normal(size=(4, 4)).astype(np.float32)
    p = str(tmp_path / "pose.npy")
    np.save(p, pose)
    out = native_loader.decode_npy_pose(p)
    np.testing.assert_allclose(out, pose, rtol=1e-6)
    # float64 variant
    np.save(p, pose.astype(np.float64))
    out = native_loader.decode_npy_pose(p)
    np.testing.assert_allclose(out, pose, rtol=1e-6)
