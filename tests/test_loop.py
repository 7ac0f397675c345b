"""training.loop integration test: 2 epochs end to end on a synthetic
dataset, covering grid refresh, train/val, inference, checkpointing and
metric persistence — the training() driver surface (reference
train.py:110-319)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_nerf_root(tmp_path_factory):
    """Blender-convention orbit scene (see verify SKILL: the ngp transform
    negates rotation cols 1-2, so poses must look along −z)."""
    root = tmp_path_factory.mktemp("data")
    (root / "nerf").mkdir()
    rng = np.random.default_rng(0)
    n, H = 20, 32
    poses = np.zeros((n, 4, 4), np.float32)
    images = rng.uniform(0, 1, (n, H, H, 3)).astype(np.float32)
    for i in range(n):
        th = 2 * np.pi * i / n
        c = 6.0 * np.array([np.sin(th), 0.2, np.cos(th)], np.float32)
        f = c / np.linalg.norm(c)
        up = np.array([0, 1, 0], np.float32)
        x = np.cross(up, f); x /= np.linalg.norm(x)
        y = np.cross(f, x)
        poses[i] = np.eye(4)
        poses[i, :3, :3] = np.stack([x, y, f], -1)
        poses[i, :3, 3] = c
    np.savez(root / "nerf" / "tiny_nerf_data.npz", images=images, poses=poses,
             focal=np.float32(138.0))
    return str(root)


@pytest.mark.slow
def test_train_loop_end_to_end(synthetic_nerf_root, tmp_path):
    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.training.joint import JointConfig
    from stable_nerf_tpu.training.loop import train

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=2, max_steps_train=16, max_steps_eval=16,
                          inference_every=2, num_inference_steps=4,
                          checkpoint_every=1),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    workdir = str(tmp_path / "work")
    params, grid_state, history = train(cfg, ds, workdir=workdir, epochs=2,
                                        log_fn=lambda *a: None)

    assert len(history) == 2
    for rec in history:
        assert np.isfinite(rec["train_loss"])
        assert np.isfinite(rec["val_loss"])
    # metrics persisted as JSONL: per-epoch records plus interleaved
    # inference records (kind="inference", inference_every=2 → one here)
    records = [json.loads(l) for l in
               open(os.path.join(workdir, "metrics.jsonl"))]
    epoch_recs = [r for r in records if r.get("kind") != "inference"]
    inf_recs = [r for r in records if r.get("kind") == "inference"]
    assert len(epoch_recs) == 2 and epoch_recs[0]["epoch"] == 0
    assert len(inf_recs) == 1 and inf_recs[0]["epoch"] == 1
    for k in ("inference_psnr", "inference_latent_psnr", "inference_ssim",
              "inference_l2_loss"):
        assert np.isfinite(inf_recs[0][k]), k
    # checkpoints written (epoch cadence 1 + final)
    ckpts = os.listdir(os.path.join(workdir, "checkpoints"))
    assert len(ckpts) >= 1
    # grid state advanced
    assert int(grid_state.iter_density) == 2


def test_train_loop_resume(synthetic_nerf_root, tmp_path, monkeypatch):
    """Interrupt-and-resume (the capability the reference lacks,
    train.py:303-308): train 2 epochs, resume to 4 — the second call must
    restore params/opt/grid/epoch and run exactly epochs 2..3.

    Also locks the host-restore contract: the template handed to orbax must
    hold NO jax.Array leaves — StandardRestore follows template placement,
    and a device template materializes the restored tree on device next to
    the live initial state (+4.5 GB at full SDXL), which OOMed the round-4
    live resume demo where the fresh run trained fine."""
    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.training.joint import JointConfig
    from stable_nerf_tpu.training.loop import train

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=2, max_steps_train=16, max_steps_eval=16,
                          inference_every=0,   # 0 = disabled (regression: must not ZeroDivide)
                          checkpoint_every=1),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    workdir = str(tmp_path / "work_resume")
    _, grid1, hist1 = train(cfg, ds, workdir=workdir, epochs=2,
                            log_fn=lambda *a: None)
    assert int(grid1.iter_density) == 2

    import jax

    from stable_nerf_tpu.training.checkpoints import CheckpointManager

    seen_templates = []
    orig_restore = CheckpointManager.restore

    def spy_restore(self, step=None, template=None):
        seen_templates.append(template)
        return orig_restore(self, step=step, template=template)

    monkeypatch.setattr(CheckpointManager, "restore", spy_restore)

    logs = []
    params, grid2, hist2 = train(cfg, ds, workdir=workdir, epochs=4,
                                 resume=True, log_fn=logs.append)
    assert any("resumed from checkpoint" in str(m) for m in logs)
    assert seen_templates and seen_templates[0] is not None
    device_leaves = [
        l for l in jax.tree.leaves(seen_templates[0])
        if isinstance(l, jax.Array)
    ]
    assert not device_leaves, (
        "restore template must be host-side (numpy) — device leaves make "
        "orbax materialize the restored tree on device next to the live "
        "initial state")
    # only the remaining epochs ran, numbered continuously
    assert [r["epoch"] for r in hist2] == [2, 3]
    for rec in hist2:
        assert np.isfinite(rec["train_loss"])
    # grid refresh count carried over and kept advancing (2 + 2 more)
    assert int(grid2.iter_density) == 4
    # metrics JSONL accumulated across both runs
    lines = open(os.path.join(workdir, "metrics.jsonl")).read().splitlines()
    assert [json.loads(l)["epoch"] for l in lines] == [0, 1, 2, 3]
    # resume with nothing left to do: no epochs run, instant return
    _, _, hist3 = train(cfg, ds, workdir=workdir, epochs=4, resume=True,
                        log_fn=lambda *a: None)
    assert hist3 == []


@pytest.mark.slow
def test_train_loop_data_parallel(synthetic_nerf_root, tmp_path):
    """Drive training.loop.train itself over the 8-virtual-device mesh
    (VERDICT round-1 item 3): params must come back fully replicated and
    bit-identical across devices, and the loop must produce finite losses."""
    import jax
    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.parallel.sharding import make_mesh
    from stable_nerf_tpu.training.joint import JointConfig
    from stable_nerf_tpu.training.loop import train

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=1, max_steps_train=16, max_steps_eval=16,
                          inference_every=2, num_inference_steps=4,
                          checkpoint_every=2),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    mesh = make_mesh(8)
    workdir = str(tmp_path / "work_dp")
    params, grid_state, history = train(cfg, ds, workdir=workdir, epochs=2,
                                        mesh=mesh, log_fn=lambda *a: None)

    assert len(history) == 2
    for rec in history:
        assert np.isfinite(rec["train_loss"])
        assert np.isfinite(rec["val_loss"])

    # every param leaf is fully replicated and identical on all 8 devices
    import jax.numpy as jnp  # noqa: F401

    leaves = [l for l in jax.tree.leaves(params) if hasattr(l, "sharding")]
    assert leaves, "params lost their device placement"
    checked = 0
    for leaf in leaves[:20]:
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            np.testing.assert_array_equal(np.asarray(s.data), ref)
        checked += 1
    assert checked > 0, "no leaf was actually replicated over >1 device"


@pytest.mark.slow
def test_train_loop_tensor_parallel(synthetic_nerf_root, tmp_path):
    """Drive training.loop.train over a 2-D (data=4 × model=2) GSPMD mesh
    (--tensor-parallel path): U-Net kernels must come back model-sharded,
    losses finite."""
    import jax
    from jax.sharding import PartitionSpec as P
    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.training.joint import JointConfig
    from stable_nerf_tpu.training.loop import train

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=1, max_steps_train=16, max_steps_eval=16,
                          inference_every=50, checkpoint_every=50),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    workdir = str(tmp_path / "work_tp")
    params, grid_state, history = train(cfg, ds, workdir=workdir, epochs=2,
                                        tensor_parallel=2,
                                        log_fn=lambda *a: None)

    assert len(history) == 2
    for rec in history:
        assert np.isfinite(rec["train_loss"])
        assert np.isfinite(rec["val_loss"])

    qk = params["sd"]["unet"]["mid_block"]["attentions"][0]["blocks"][0][
        "attn1"]["to_q"]["kernel"]
    assert qk.sharding.spec == P(None, "model")


@pytest.mark.slow
def test_train_loop_fsdp(synthetic_nerf_root, tmp_path):
    """Drive training.loop.train with fsdp=True over the 8-device mesh
    (--fsdp path): at least one SD param leaf must come back sharded,
    losses finite."""
    import jax
    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.training.joint import JointConfig
    from stable_nerf_tpu.training.loop import train

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=1, max_steps_train=16, max_steps_eval=16,
                          inference_every=50, checkpoint_every=50),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    workdir = str(tmp_path / "work_fsdp")
    params, grid_state, history = train(cfg, ds, workdir=workdir, epochs=1,
                                        fsdp=True, log_fn=lambda *a: None)

    assert len(history) == 1
    for rec in history:
        assert np.isfinite(rec["train_loss"])
        assert np.isfinite(rec["val_loss"])
    assert any(hasattr(x, "sharding") and not x.sharding.is_fully_replicated
               for x in jax.tree.leaves(params["sd"]))


@pytest.mark.slow
def test_train_loop_fsdp_sharded_resume(synthetic_nerf_root, tmp_path):
    """Resume under FSDP restores through a sharded template (each host
    reads only its own shards — no full-state host materialization): train
    2 epochs with fsdp=True, resume to 3 with fsdp=True; the restore must
    take the sharded path, keep SD leaves sharded, number epochs
    continuously, and train to finite losses."""
    import jax
    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.training.joint import JointConfig
    from stable_nerf_tpu.training.loop import train

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=1, max_steps_train=16, max_steps_eval=16,
                          inference_every=0, checkpoint_every=1),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    workdir = str(tmp_path / "work_fsdp_resume")
    train(cfg, ds, workdir=workdir, epochs=2, fsdp=True,
          log_fn=lambda *a: None)

    logs = []
    params, _, hist = train(cfg, ds, workdir=workdir, epochs=3, fsdp=True,
                            resume=True, log_fn=logs.append)
    assert any("sharded restore" in str(m) for m in logs), logs
    assert [r["epoch"] for r in hist] == [2]
    assert np.isfinite(hist[0]["train_loss"])
    assert any(hasattr(x, "sharding") and not x.sharding.is_fully_replicated
               for x in jax.tree.leaves(params["sd"]))


@pytest.mark.slow
def test_train_loop_stochastic_warmup_schedule(synthetic_nerf_root, tmp_path):
    """stochastic_until_epoch: the first N epochs train with the one-corner
    encode, then the loop switches to the exact step (fast early
    convergence + exact-mode final quality — beyond the reference, which
    has one encode mode)."""
    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.training.joint import JointConfig
    from stable_nerf_tpu.training.loop import train

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=2, max_steps_train=16, max_steps_eval=16,
                          inference_every=0, checkpoint_every=100,
                          stochastic_until_epoch=2),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    logs = []
    _, _, hist = train(cfg, ds, workdir=str(tmp_path / "work_warm"),
                       epochs=3, log_fn=logs.append)
    assert any("warmup over" in str(m) for m in logs), logs
    assert len(hist) == 3
    for rec in hist:
        assert np.isfinite(rec["train_loss"])


@pytest.mark.slow
def test_train_loop_auto_budget(synthetic_nerf_root, tmp_path):
    """sample_budget_auto: the loop re-buckets the traced step per
    occupancy refresh (adaptive mean_count emulation) and still trains to
    finite losses."""
    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.training.joint import JointConfig
    from stable_nerf_tpu.training.loop import train

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=2, max_steps_train=16, max_steps_eval=16,
                          inference_every=100, num_inference_steps=4,
                          checkpoint_every=100, sample_budget_auto=True),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    params, grid_state, history = train(cfg, ds,
                                        workdir=str(tmp_path / "work"),
                                        epochs=2, log_fn=lambda *a: None)
    assert len(history) == 2
    for rec in history:
        assert np.isfinite(rec["train_loss"])


def test_train_loop_frozen_bf16(synthetic_nerf_root, tmp_path):
    """frozen_dtype="bfloat16" (--frozen-bf16): the frozen partition (U-Net
    base + VAE) is storage-cast to bf16 while the trainable partition (ip
    heads + NeRF) and its AdamW state stay f32 — the policy under which
    full-SDXL joint training fits one 16 GB chip
    (scripts/bench_joint_full_sdxl.py).  Must survive checkpoint resume."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.training.joint import JointConfig, joint_trainable_mask
    from stable_nerf_tpu.training.loop import train
    from stable_nerf_tpu.utils.pytree import partition

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=2, max_steps_train=16, max_steps_eval=16,
                          inference_every=0, checkpoint_every=1,
                          frozen_dtype="bfloat16"),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    workdir = str(tmp_path / "work_bf16")
    params, _, hist = train(cfg, ds, workdir=workdir, epochs=1,
                            log_fn=lambda *a: None)
    assert np.isfinite(hist[0]["train_loss"])

    def float_dtypes(tree):
        return {l.dtype for l in jax.tree.leaves(tree)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)}

    trainable, frozen = partition(params, joint_trainable_mask(params))
    assert float_dtypes(frozen) == {jnp.dtype(jnp.bfloat16)}
    assert float_dtypes(trainable) == {jnp.dtype(jnp.float32)}

    # resume restores the bf16 storage and keeps training
    params2, _, hist2 = train(cfg, ds, workdir=workdir, epochs=2, resume=True,
                              log_fn=lambda *a: None)
    assert [r["epoch"] for r in hist2] == [1]
    assert np.isfinite(hist2[0]["train_loss"])
    _, frozen2 = partition(params2, joint_trainable_mask(params2))
    assert float_dtypes(frozen2) == {jnp.dtype(jnp.bfloat16)}


@pytest.mark.slow
def test_train_loop_preemption_checkpoint(synthetic_nerf_root, tmp_path):
    """Preemption safety (beyond the reference, which has no notion of it):
    a real SIGTERM mid-training makes the loop save a resumable checkpoint
    and return cleanly instead of dying; --resume then finishes the job.
    The signal is delivered by a timer thread to this very process, so the
    handler install/uninstall path in train() is what's exercised."""
    import signal
    import threading

    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.training.joint import JointConfig
    from stable_nerf_tpu.training.loop import train

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=2, max_steps_train=16, max_steps_eval=16,
                          inference_every=0, checkpoint_every=0),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    workdir = str(tmp_path / "work_preempt")

    prev = signal.getsignal(signal.SIGTERM)
    timer = threading.Timer(5.0, os.kill, (os.getpid(), signal.SIGTERM))
    timer.start()
    logs = []
    try:
        # 50 epochs would take minutes; the SIGTERM must cut it short
        _, _, history = train(cfg, ds, workdir=workdir, epochs=50,
                              log_fn=logs.append)
    finally:
        timer.cancel()
    assert len(history) < 50
    assert any("preempted" in str(m) for m in logs)
    # train() restored the previous handler on the way out
    assert signal.getsignal(signal.SIGTERM) is prev
    ckpts = os.listdir(os.path.join(workdir, "checkpoints"))
    assert len(ckpts) >= 1
    # the moment train() returns, a FINALIZED checkpoint must exist: the
    # round-3 learning demo exited on a still-streaming async save and left
    # only a 48 MB `50.orbax-checkpoint-tmp` of a ~9 GB state (corrupt,
    # unrestorable) — both preemption arms must drain the manager first
    assert any(not c.endswith("orbax-checkpoint-tmp") for c in ckpts), ckpts

    # resume completes the job from the saved state
    logs2 = []
    _, _, hist2 = train(cfg, ds, workdir=workdir,
                        epochs=len(history) + 1, resume=True,
                        log_fn=logs2.append)
    assert any("resumed from checkpoint" in str(m) for m in logs2)
    assert len(hist2) >= 1
    for rec in hist2:
        assert np.isfinite(rec["train_loss"])


def test_train_loop_trainable_only_checkpoint(synthetic_nerf_root, tmp_path):
    """checkpoint_trainable_only (--checkpoint-trainable-only): v2
    checkpoints carry only the trainable partition + optimizer + grid; the
    frozen SDXL base is reconstructed on restore from the (seed,
    pretrained, frozen_dtype) recorded in FORMAT.json.  At full SDXL this
    halves the ~9 GB state write.  Mismatched reconstruction inputs must
    refuse loudly — restored trainables on a different frozen model are
    silent garbage."""
    import dataclasses
    import json

    import jax
    import pytest
    from stable_nerf_tpu.config import (
        HashGridConfig, NeRFConfig, SDConfig, TrainConfig,
    )
    from stable_nerf_tpu.data.dataset import StableNeRFDataset
    from stable_nerf_tpu.models.diffusion.sd_network import SDNetworkConfig
    from stable_nerf_tpu.models.diffusion.unet import tiny_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.training.checkpoints import CheckpointManager
    from stable_nerf_tpu.training.joint import JointConfig, joint_trainable_mask
    from stable_nerf_tpu.training.loop import train
    from stable_nerf_tpu.utils.pytree import partition

    cfg = JointConfig(
        nerf=NeRFConfig(channel_dim=4, grid_size=16,
                        encoding_sigma=HashGridConfig(n_levels=2,
                                                      log2_hashmap_size=8,
                                                      base_resolution=4)),
        sd=SDNetworkConfig(
            sd=SDConfig(num_tokens=2, cross_attention_dim=48, latent_size=16,
                        image_size=32),
            unet=tiny_unet_config(),
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8),
        ),
        train=TrainConfig(batch_size=2, max_steps_train=16, max_steps_eval=16,
                          inference_every=0, checkpoint_every=1,
                          frozen_dtype="bfloat16",
                          checkpoint_trainable_only=True),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16,
                           root=synthetic_nerf_root)
    workdir = str(tmp_path / "work_tonly")
    params, _, hist = train(cfg, ds, workdir=workdir, epochs=1,
                            log_fn=lambda *a: None)
    assert np.isfinite(hist[0]["train_loss"])

    # FORMAT.json records the frozen-reconstruction inputs (ADVICE r3 #1/#3:
    # + the pretrained-checkpoint identity and a frozen-partition checksum)
    fmt = json.load(open(os.path.join(workdir, "checkpoints", "FORMAT.json")))
    assert {k: fmt[k] for k in ("version", "trainable_only", "seed",
                                "pretrained_sd", "frozen_dtype")} == {
        "version": 2, "trainable_only": True, "seed": 0,
        "pretrained_sd": False, "frozen_dtype": "bfloat16"}
    assert fmt["sdxl_fingerprint"] is None      # no pretrained checkpoint
    assert fmt["frozen_checksum"], "frozen checksum must be recorded"
    # zero-init subtrees (e.g. the empty-prompt conditioning cache without
    # a pretrained overlay) legitimately sum to 0; the bulk must not
    assert all(v >= 0 for v in fmt["frozen_checksum"].values())
    assert sum(fmt["frozen_checksum"].values()) > 0

    # the stored state dict has no frozen partition (raw, template-free read)
    mgr = CheckpointManager(os.path.join(workdir, "checkpoints"))
    raw = mgr.restore()
    assert "trainable" in raw and "params" not in raw
    n_stored = sum(x.size for x in jax.tree.leaves(raw["trainable"]))
    n_full = sum(x.size for x in jax.tree.leaves(params))
    assert n_stored < n_full / 2  # the frozen majority is not written

    # resume reconstructs the frozen partition BIT-EXACTLY (same seed/cast)
    params2, _, hist2 = train(cfg, ds, workdir=workdir, epochs=2, resume=True,
                              log_fn=lambda *a: None)
    assert [r["epoch"] for r in hist2] == [1]
    assert np.isfinite(hist2[0]["train_loss"])
    # frozen never receives updates, so run-1's frozen and the resume's
    # seed-reconstructed frozen must both equal the init — bit-exact
    mask = joint_trainable_mask(params)
    _, frozen1 = partition(params, mask)
    _, frozen2 = partition(params2, mask)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(frozen1),
                               jax.tree.leaves(frozen2)))

    # mismatched seed → the frozen model would differ → loud refusal
    with pytest.raises(ValueError, match="trainable-only checkpoint"):
        train(cfg, ds, workdir=workdir, epochs=3, resume=True, seed=1,
              log_fn=lambda *a: None)

    # ADVICE r3 #2: the same refusal WITHOUT --resume — a fresh run with
    # different reconstruction inputs must not write new v2 steps under
    # the stale sidecar (previously it silently did)
    with pytest.raises(ValueError, match="trainable-only checkpoint"):
        train(cfg, ds, workdir=workdir, epochs=1, seed=1,
              log_fn=lambda *a: None)

    # a directory holding FULL checkpoints keeps its format even if the
    # config now asks for trainable-only (mixed layouts are unrestorable)
    cfg_full = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train,
                                       checkpoint_trainable_only=False))
    workdir2 = str(tmp_path / "work_full")
    train(cfg_full, ds, workdir=workdir2, epochs=1, log_fn=lambda *a: None)
    logs = []
    train(cfg, ds, workdir=workdir2, epochs=2, resume=True, log_fn=logs.append)
    assert any("continuing in that format" in str(m) for m in logs)
    mgr2 = CheckpointManager(os.path.join(workdir2, "checkpoints"))
    assert "params" in mgr2.restore()  # still v1
