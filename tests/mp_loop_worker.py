"""Worker for the cross-process training.loop.train integration test.

Spawned by tests/test_multiprocess.py (one per emulated host): 2 processes
x 2 virtual CPU devices = a 4-device global mesh spanning process
boundaries, driving the REAL production loop — per-process dataset slicing
(process_shard_indices), local-slice feeding assembled into global batches
(put_sharded in device_prefetch), pmean-synced updates, replicated val /
inference batches, and single-writer metrics.  The JAX-native equivalent
of the reference under a 2-rank `accelerate launch` (train.py:122-202).

Usage: python mp_loop_worker.py <pid> <nproc> <port> <datadir> <workdir> <outdir>
"""

import json
import os
import sys


def make_scene(root):
    """Same Blender-convention orbit scene as tests/test_loop.py."""
    import numpy as np

    os.makedirs(os.path.join(root, "nerf"), exist_ok=True)
    rng = np.random.default_rng(0)
    n, H = 20, 32
    poses = np.zeros((n, 4, 4), np.float32)
    images = rng.uniform(0, 1, (n, H, H, 3)).astype(np.float32)
    for i in range(n):
        th = 2 * np.pi * i / n
        c = 6.0 * np.array([np.sin(th), 0.2, np.cos(th)], np.float32)
        f = c / np.linalg.norm(c)
        up = np.array([0, 1, 0], np.float32)
        x = np.cross(up, f)
        x /= np.linalg.norm(x)
        y = np.cross(f, x)
        poses[i] = np.eye(4)
        poses[i, :3, :3] = np.stack([x, y, f], -1)
        poses[i, :3, 3] = c
    np.savez(os.path.join(root, "nerf", "tiny_nerf_data.npz"),
             images=images, poses=poses, focal=np.float32(138.0))


def main():
    pid, nproc, port, datadir, workdir, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5], sys.argv[6])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)

    import numpy as np

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

    if pid == 0:
        make_scene(datadir)
    from stable_nerf_tpu.parallel import barrier

    barrier("dataset-ready")

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
                          checkpoint_every=0),
    )
    ds = StableNeRFDataset("nerf", shape=32, encoded_shape=16, root=datadir)
    mesh = make_mesh()  # all 4 global devices
    assert mesh.devices.size == 2 * nproc

    params, grid_state, history = train(cfg, ds, workdir=workdir, epochs=2,
                                        mesh=mesh, log_fn=lambda *a: None)

    # a few param leaves, read from a local shard (params are replicated)
    leaves = jax.tree.leaves(params)
    probe = [float(np.asarray(l.addressable_data(0)).ravel()[0])
             for l in leaves[:8]]

    out = {
        "pid": pid,
        "train_losses": [r["train_loss"] for r in history],
        "val_losses": [r["val_loss"] for r in history],
        "param_probe": probe,
    }
    with open(os.path.join(outdir, f"loop_result_{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"loop worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
