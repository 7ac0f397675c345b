"""Worker process for the true multi-process distributed test.

Not a pytest module — spawned by tests/test_multiprocess.py, one process per
emulated host.  Each worker owns 2 virtual CPU devices and joins a gloo-backed
``jax.distributed`` cluster, so the global mesh (2 processes x 2 devices)
genuinely spans process boundaries: ``shard_batch`` must go through
``jax.make_array_from_process_local_data`` (device_put cannot reach the other
host's devices) and the train-step pmean rides a real cross-process
collective.  This is the JAX-native equivalent of launching the reference
under ``accelerate launch --num_processes 2`` (reference train.py:122-126).

Usage: python mp_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])

    # Per-process backend setup BEFORE any jax dispatch: 2 virtual CPU
    # devices per process (overrides the 8 inherited from tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")  # env alone loses to site cfg
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    from stable_nerf_tpu.parallel import (
        barrier, make_parallel_train_step, process_shard_indices, shard_batch,
    )
    from jax.sharding import Mesh

    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    # --- the per-shard step: least squares on the local rows, grads pmean'd
    # over the data axis exactly like make_train_step(pmean_axis=...) ---
    def step_fn(params, opt_state, grid_state, batch, key):
        def loss_fn(p):
            pred = batch["x"] @ p["w"]
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, "data")
        params = jax.tree.map(lambda p, g: p - 0.1 * g, params, grads)
        return params, opt_state, {"loss": jax.lax.pmean(loss, "data")}

    step = make_parallel_train_step(step_fn, mesh)

    # Global batch: 4 rows, one per device; this process feeds its local half.
    x_global = np.arange(16, dtype=np.float32).reshape(4, 4) / 10.0
    y_global = np.ones(4, np.float32)
    lo, hi = 2 * pid, 2 * pid + 2
    batch = shard_batch({"x": x_global[lo:hi], "y": y_global[lo:hi]}, mesh)
    assert batch["x"].shape == (4, 4), batch["x"].shape  # global view

    params = {"w": jnp.zeros(4)}
    for _ in range(2):
        params, _, metrics = step(params, None, None, batch,
                                  jax.random.PRNGKey(0))

    barrier("mp-test")

    out = {
        "pid": pid,
        "shard_indices": process_shard_indices(10).tolist(),
        "shard_indices_uneven": process_shard_indices(11).tolist(),
        "w": np.asarray(params["w"].addressable_data(0)).tolist(),
        "loss": float(np.asarray(metrics["loss"].addressable_data(0))),
    }
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
