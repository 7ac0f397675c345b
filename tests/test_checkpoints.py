"""Orbax checkpoint save/restore roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stable_nerf_tpu.config import HashGridConfig, NeRFConfig
from stable_nerf_tpu.models.nerf import grid_init, nerf_init
from stable_nerf_tpu.training.checkpoints import CheckpointManager


def test_save_restore_roundtrip(tmp_path, key):
    cfg = NeRFConfig(grid_size=16,
                     encoding_sigma=HashGridConfig(n_levels=2,
                                                   log2_hashmap_size=8,
                                                   base_resolution=4))
    params = {"nerf": nerf_init(key, cfg)}
    grid_state = grid_init(cfg)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(1, params, opt_state, grid_state, extra={"epoch": 1}, wait=True)
    mgr.save(5, params, opt_state, grid_state, extra={"epoch": 5}, wait=True)
    assert mgr.latest_step() == 5

    template = {"params": params, "opt_state": opt_state,
                "grid_state": grid_state, "extra": {"epoch": 0}}
    restored = mgr.restore(template=template)
    assert restored["extra"]["epoch"] == 5
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # grid state tuple roundtrips
    np.testing.assert_array_equal(np.asarray(grid_state.density_grid),
                                  np.asarray(restored["grid_state"].density_grid
                                             if hasattr(restored["grid_state"], "density_grid")
                                             else restored["grid_state"][0]))
    mgr.close()


def test_sharded_save_single_device_restore(tmp_path, key):
    """Checkpoint portability across sharding modes: params saved while
    sharded over the 8-device mesh (the TP/FSDP training states) must
    restore into a single-device template bit-identically — the
    train-sharded → infer-anywhere path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    w = jax.device_put(jax.random.normal(key, (16, 8)),
                       NamedSharding(mesh, P("data", None)))
    b = jax.device_put(jax.random.normal(key, (8,)),
                       NamedSharding(mesh, P()))
    params = {"w": w, "b": b}

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, params, None, None, extra={"epoch": 1}, wait=True)

    template = {"params": {"w": jnp.zeros((16, 8)), "b": jnp.zeros((8,))},
                "opt_state": None, "grid_state": None,
                "extra": {"epoch": 0}}
    restored = mgr.restore(template=template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(w))
    np.testing.assert_array_equal(np.asarray(restored["params"]["b"]),
                                  np.asarray(b))
    mgr.close()


def test_max_to_keep_evicts(tmp_path, key):
    cfg = NeRFConfig(grid_size=16,
                     encoding_sigma=HashGridConfig(n_levels=2,
                                                   log2_hashmap_size=8,
                                                   base_resolution=4))
    params = {"nerf": nerf_init(key, cfg)}
    grid_state = grid_init(cfg)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(step, params, None, grid_state, wait=True)
    steps = mgr.manager.all_steps()
    assert 1 not in steps and set(steps) == {2, 3}
    mgr.close()


# ---------------------------------------------------------------------------
# FORMAT.json sidecar guards (ADVICE r3 #1-#3)
# ---------------------------------------------------------------------------

def test_write_format_refuses_conflicting_sidecar(tmp_path):
    """ADVICE r3 #2: a run whose frozen-reconstruction inputs differ from
    an existing sidecar must refuse to write (new v2 steps under a stale
    sidecar are unrestorable-correctly), while a matching run proceeds and
    an OLD sidecar missing newer keys stays compatible."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    fmt = {"version": 2, "trainable_only": True, "seed": 0,
           "pretrained_sd": False, "frozen_dtype": "bfloat16",
           "sdxl_fingerprint": None, "frozen_checksum": {"unet": 1.0}}
    mgr.write_format(fmt)
    # identical inputs: fine (derived frozen_checksum may drift — excluded)
    mgr.write_format({**fmt, "frozen_checksum": {"unet": 1.0000001}})
    # different seed: the frozen partition would rebuild differently
    with pytest.raises(ValueError, match="refusing to write"):
        mgr.write_format({**fmt, "seed": 1})
    # different pretrained-checkpoint identity
    with pytest.raises(ValueError, match="refusing to write"):
        mgr.write_format({**fmt, "sdxl_fingerprint": "deadbeef"})
    # sidecar predating a key (old runs): the new key is not a conflict
    import json
    import os

    path = os.path.join(str(tmp_path / "ckpt"), "FORMAT.json")
    old = {k: v for k, v in fmt.items() if k != "sdxl_fingerprint"}
    with open(path, "w") as f:
        json.dump(old, f)
    mgr.write_format(fmt)
    mgr.close()


def test_frozen_checksum_verify(capsys):
    """ADVICE r3 #3: the frozen-partition checksum catches a divergent
    reconstruction; sub-tolerance drift only warns."""
    from stable_nerf_tpu.training.checkpoints import (
        frozen_partition_checksum, verify_frozen_checksum,
    )

    params = {"sd": {"unet": {"w": jnp.arange(8.0)},
                     "ip": {"w": jnp.ones((2,))}},
              "nerf": {"w": jnp.ones((3,))}}
    mask = {"sd": {"unet": {"w": False}, "ip": {"w": True}},
            "nerf": {"w": True}}
    sums = frozen_partition_checksum(params, mask)
    assert sums == {"unet": 28.0}          # only the frozen sd subtree
    verify_frozen_checksum(sums, sums)     # exact match: silent
    verify_frozen_checksum(None, sums)     # old sidecar: no-op
    logs = []
    verify_frozen_checksum({"unet": 28.0 * (1 + 1e-5)}, sums,
                           log_fn=logs.append)
    assert logs and "drift" in logs[0]     # small drift: warn only
    with pytest.raises(ValueError, match="checksum mismatch"):
        verify_frozen_checksum({"unet": 30.0}, sums)
    with pytest.raises(ValueError, match="checksum mismatch"):
        verify_frozen_checksum({"vae": 1.0}, sums)   # subtree missing


def test_checkpoint_fingerprint(tmp_path):
    """ADVICE r3 #1: the fingerprint distinguishes two checkpoint dirs by
    content (size or header bytes), ignores non-weight files, and is
    stable across recomputation."""
    from stable_nerf_tpu.models.diffusion.weights import (
        checkpoint_fingerprint,
    )

    a = tmp_path / "ckpt_a" / "unet"
    a.mkdir(parents=True)
    (a / "diffusion_pytorch_model.safetensors").write_bytes(b"x" * 100)
    (a / "config.json").write_text("{}")   # non-weight: ignored
    fa = checkpoint_fingerprint(str(tmp_path / "ckpt_a"))
    assert fa["n_files"] == 1 and fa["total_bytes"] == 100
    assert fa["digest"] == checkpoint_fingerprint(
        str(tmp_path / "ckpt_a"))["digest"]

    b = tmp_path / "ckpt_b" / "unet"
    b.mkdir(parents=True)
    (b / "diffusion_pytorch_model.safetensors").write_bytes(b"y" * 100)
    fb = checkpoint_fingerprint(str(tmp_path / "ckpt_b"))
    assert fb["digest"] != fa["digest"]    # same size, different content
    (a / "config.json").write_text('{"changed": 1}')
    assert checkpoint_fingerprint(
        str(tmp_path / "ckpt_a"))["digest"] == fa["digest"]


def test_stale_tmp_swept_at_startup(tmp_path, key):
    """VERDICT r3 next #2: a process dying mid-async-save strands an
    unrestorable *.orbax-checkpoint-tmp dir (three in the r3 artifacts);
    manager startup sweeps them, leaving finalized steps intact."""
    import os

    d = tmp_path / "ckpt"
    cfg = NeRFConfig(grid_size=16,
                     encoding_sigma=HashGridConfig(n_levels=2,
                                                   log2_hashmap_size=8,
                                                   base_resolution=4))
    params = {"nerf": nerf_init(key, cfg)}
    mgr = CheckpointManager(str(d))
    mgr.save(3, params, None, grid_init(cfg), wait=True)
    mgr.close()
    stale = d / "50.orbax-checkpoint-tmp-1234"
    stale.mkdir()
    (stale / "partial.bin").write_bytes(b"x" * 10)
    mgr2 = CheckpointManager(str(d))
    assert not stale.exists()
    assert mgr2.latest_step() == 3       # real steps untouched
    mgr2.close()
