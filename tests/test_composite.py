"""Composite op tests: forward vs a loop oracle transcribing the CUDA kernel
semantics, backward vs jax autodiff and vs the analytic formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_nerf_tpu.ops.composite import composite_rays


def _oracle(sigmas, rgbs, dt, ts, t0, valid, t_thresh):
    """Per-ray python loop mirroring kernel_composite_rays_train_forward
    (raymarching.cu:501-601) on the masked lattice."""
    N, K = sigmas.shape
    C = rgbs.shape[-1]
    ws_o = np.zeros(N)
    d_o = np.zeros(N)
    im_o = np.zeros((N, C))
    for n in range(N):
        T = 1.0
        ws, d, t = 0.0, 0.0, 0.0
        ch = np.zeros(C)
        last_t = t0[n]
        for k in range(K):
            if not valid[n, k]:
                continue
            alpha = 1.0 - np.exp(-sigmas[n, k] * dt)
            w = alpha * T
            ch += w * rgbs[n, k]
            # deltas[1] = (t_k + dt) - last_written
            t += (ts[n, k] + dt) - last_t
            last_t = ts[n, k] + dt
            d += w * t
            ws += w
            T *= 1.0 - alpha
            if T < t_thresh:
                break
        ws_o[n], d_o[n], im_o[n] = ws, d, ch
    return ws_o, d_o, im_o


def _random_case(rng, N=8, K=32, C=4):
    sigmas = rng.uniform(0, 20, (N, K)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, K, C)).astype(np.float32)
    dt = np.float32(2 * np.sqrt(3) / K)
    t0 = rng.uniform(0.2, 0.5, (N,)).astype(np.float32)
    ts = t0[:, None] + np.arange(K, dtype=np.float32)[None] * dt
    valid = rng.uniform(size=(N, K)) < 0.7
    return sigmas, rgbs, dt, ts, t0, valid


def test_forward_matches_oracle(rng):
    args = _random_case(rng)
    ws, d, im = composite_rays(*[jnp.asarray(a) for a in args], t_thresh=1e-4)
    ws_o, d_o, im_o = _oracle(*args, t_thresh=1e-4)
    np.testing.assert_allclose(np.asarray(ws), ws_o, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), d_o, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(im), im_o, rtol=1e-4, atol=1e-6)


def test_forward_early_exit(rng):
    """Large sigmas saturate T quickly; oracle and op must agree on the
    break-after-accumulate semantics."""
    sigmas, rgbs, dt, ts, t0, valid = _random_case(rng)
    sigmas = sigmas * 50  # drive T below threshold fast
    ws, d, im = composite_rays(
        jnp.asarray(sigmas), jnp.asarray(rgbs), dt, jnp.asarray(ts),
        jnp.asarray(t0), jnp.asarray(valid), t_thresh=1e-2,
    )
    ws_o, d_o, im_o = _oracle(sigmas, rgbs, dt, ts, t0, valid, 1e-2)
    np.testing.assert_allclose(np.asarray(ws), ws_o, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(im), im_o, rtol=1e-4, atol=1e-6)


def test_empty_rays_are_zero(rng):
    sigmas, rgbs, dt, ts, t0, valid = _random_case(rng)
    valid = np.zeros_like(valid)
    ws, d, im = composite_rays(
        jnp.asarray(sigmas), jnp.asarray(rgbs), dt, jnp.asarray(ts),
        jnp.asarray(t0), jnp.asarray(valid),
    )
    assert float(jnp.max(jnp.abs(ws))) == 0
    assert float(jnp.max(jnp.abs(d))) == 0
    assert float(jnp.max(jnp.abs(im))) == 0


def test_backward_matches_autodiff(rng):
    """With t_thresh=0 (no early exit) the custom VJP must equal jax autodiff
    through a plain cumprod implementation, for both image and weights_sum."""
    sigmas, rgbs, dt, ts, t0, valid = _random_case(rng, N=4, K=16)
    validf = jnp.asarray(valid, jnp.float32)

    def plain(s, r):
        alpha = validf * (1 - jnp.exp(-s * dt))
        T_after = jnp.cumprod(1 - alpha, -1)
        T_before = jnp.concatenate([jnp.ones_like(T_after[:, :1]), T_after[:, :-1]], -1)
        w = alpha * T_before
        return jnp.sum(w, -1), jnp.einsum("nk,nkc->nc", w, r)

    def loss_plain(s, r):
        ws, im = plain(s, r)
        return jnp.sum(im ** 2) + 0.3 * jnp.sum(ws ** 2)

    def loss_op(s, r):
        ws, d, im = composite_rays(s, r, dt, jnp.asarray(ts), jnp.asarray(t0),
                                   jnp.asarray(valid), t_thresh=0.0)
        return jnp.sum(im ** 2) + 0.3 * jnp.sum(ws ** 2)

    s, r = jnp.asarray(sigmas), jnp.asarray(rgbs)
    gs_p, gr_p = jax.grad(loss_plain, argnums=(0, 1))(s, r)
    gs_o, gr_o = jax.grad(loss_op, argnums=(0, 1))(s, r)
    np.testing.assert_allclose(np.asarray(gs_o), np.asarray(gs_p), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr_o), np.asarray(gr_p), rtol=1e-3, atol=1e-5)


def test_depth_gradient_dropped(rng):
    """The reference deliberately does not propagate grad through depth
    (raymarching.py:275) — verify a depth-only loss yields zero grads."""
    sigmas, rgbs, dt, ts, t0, valid = _random_case(rng, N=4, K=16)

    def depth_loss(s, r):
        ws, d, im = composite_rays(s, r, dt, jnp.asarray(ts), jnp.asarray(t0),
                                   jnp.asarray(valid))
        return jnp.sum(d ** 2)

    gs, gr = jax.grad(depth_loss, argnums=(0, 1))(jnp.asarray(sigmas), jnp.asarray(rgbs))
    assert float(jnp.max(jnp.abs(gs))) == 0.0
    assert float(jnp.max(jnp.abs(gr))) == 0.0


def test_excluded_samples_get_zero_grad(rng):
    """Samples masked out or past the early-exit point get zero gradient."""
    sigmas, rgbs, dt, ts, t0, valid = _random_case(rng, N=2, K=16)
    sigmas = np.full_like(sigmas, 100.0)  # T collapses after ~1 sample

    def loss(s, r):
        ws, d, im = composite_rays(s, r, dt, jnp.asarray(ts), jnp.asarray(t0),
                                   jnp.asarray(valid), t_thresh=1e-2)
        return jnp.sum(im)

    gs, gr = jax.grad(loss, argnums=(0, 1))(jnp.asarray(sigmas), jnp.asarray(rgbs))
    gs, gr = np.asarray(gs), np.asarray(gr)
    # invalid samples always zero
    assert np.all(gs[~valid] == 0)
    assert np.all(gr[~valid] == 0)
    # per ray: at most two valid samples can carry sigma grad before exit
    for n in range(2):
        assert np.count_nonzero(gs[n]) <= 2
