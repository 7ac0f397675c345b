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
