"""Density activations.

``trunc_exp`` reproduces reference nerf/activation.py:6-19: forward exp(x),
backward grad·exp(clamp(x, −15, 15)) — an exp whose gradient never explodes
and, unlike ReLU, never dies (no zero-gradient region), which prevents the
empty-scene collapse when fitting densities from scratch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
