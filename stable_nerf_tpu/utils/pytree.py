"""Pytree partition/combine for frozen/trainable parameter splits.

Differentiating only the trainable subset (rather than masking updates)
lets XLA dead-code-eliminate the frozen weight-gradient matmuls — on the
2.5B-param frozen SDXL U-Net that is a large backward-pass saving.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax


def partition(tree: Any, mask: Any) -> Tuple[Any, Any]:
    """Split ``tree`` into (trainable, frozen) by a boolean mask pytree of
    the same structure; the complementary positions hold None."""
    trainable = jax.tree.map(lambda x, m: x if m else None, tree, mask)
    frozen = jax.tree.map(lambda x, m: None if m else x, tree, mask)
    return trainable, frozen


def combine(a: Any, b: Any) -> Any:
    """Merge two complementary partitions (None-filled) back into one tree."""
    return jax.tree.map(
        lambda x, y: x if x is not None else y, a, b,
        is_leaf=lambda x: x is None,
    )


def dealias(*trees: Any) -> Tuple[Any, ...]:
    """Copy any leaf array that appears (as the same object) more than once
    across ``trees``, so every leaf owns its buffer.

    Donated jitted steps (`donate_argnums`) reject trees where two leaves
    share a device buffer ("Attempt to donate the same buffer twice") —
    weight-tied inits (e.g. ip heads copied from the U-Net's to_k/to_v,
    reference network.py:104-110) naturally produce such sharing.  Must be
    called OUTSIDE jit (jnp.copy under tracing would be a no-op alias).
    """
    import jax.numpy as jnp

    seen: set = set()

    def visit(x):
        if isinstance(x, jax.Array):
            if id(x) in seen:
                return jnp.copy(x)
            seen.add(id(x))
        return x

    return tuple(jax.tree.map(visit, t) for t in trees)
