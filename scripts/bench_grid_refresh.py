#!/usr/bin/env python
"""Measure the occupancy-grid refresh cost at the production shape.

VERDICT round-1 weak-#6 / next-#8: the first-16-epoch FULL 128³ sweeps were
~35 s each in round 1 (16 epochs × 35 s of grid refresh before the partial
cadence takes over); target < 5 s per refresh.  The partial branch was fixed
in round 2 (27 s → <0.1 s, inverse-CDF resampling); this script records the
full-sweep number after the round-2 encode work.

Reference equivalent: nerf/renderer.py:236-327 (update_extra_state, the
`iter_density < 16` full-grid branch at renderer.py:252-276).

Usage:  python scripts/bench_grid_refresh.py [--grid 128] [--chunk 65536]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=2 ** 16)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stable_nerf_tpu.config import NeRFConfig
    from stable_nerf_tpu.models.nerf import (
        grid_init, nerf_density, nerf_init, update_extra_state,
    )

    cfg = NeRFConfig(channel_dim=4, grid_size=args.grid)
    key = jax.random.PRNGKey(0)
    params = nerf_init(key, cfg)
    state = grid_init(cfg)
    dens = lambda x: nerf_density(params, x, cfg)["sigma"]

    refresh = jax.jit(lambda s, k: update_extra_state(s, dens, k, cfg,
                                                      chunk=args.chunk))

    # iter_density starts at 0 → full-sweep branch
    t0 = time.perf_counter()
    state = jax.block_until_ready(refresh(state, key))
    print(f"full sweep (compile + run): {time.perf_counter() - t0:.2f} s")

    for label, st in (("full", state._replace(iter_density=jnp.zeros_like(state.iter_density))),
                      ("partial", state._replace(iter_density=jnp.full_like(state.iter_density, 20)))):
        # steady state: same compiled fn, branch chosen by iter_density
        jax.block_until_ready(refresh(st, key))
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = refresh(st, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label} sweep steady-state: {dt * 1e3:.1f} ms "
              f"({args.grid}³ grid, chunk {args.chunk})")


if __name__ == "__main__":
    main()
