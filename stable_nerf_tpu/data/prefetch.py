"""Device prefetch: overlap host batch prep with device compute.

The reference's DataLoader moves batches to device synchronously inside the
step (train.py:34-50, `.to(device)` per tensor).  TPU-native replacement:
a double-buffered iterator that issues `jax.device_put` for batch N+1 while
the step for batch N executes, so the march→encode→MLP→composite→denoise
loop never stalls on H2D (BASELINE.json north_star).
"""

from __future__ import annotations

import collections
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def device_prefetch(
    iterator: Iterator[Dict[str, np.ndarray]],
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator[Dict[str, jax.Array]]:
    """Wrap a host batch iterator with an N-deep device-transfer pipeline.

    Args:
      iterator: yields dicts of numpy arrays.
      size: queue depth (2 = classic double buffering).
      sharding: optional target sharding (e.g. batch-sharded over a data
        mesh); defaults to the default device placement.
    """
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            from ..parallel.sharding import put_sharded

            return {k: put_sharded(v, sharding) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
