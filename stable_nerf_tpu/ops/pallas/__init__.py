from .gather import sorted_window_gather
from .scatter import (
    hash_scatter_add,
    hash_scatter_add_per_level,
    sorted_block_scatter_add,
)
from .scatter_v2 import sorted_block_scatter_add_v2

__all__ = [
    "hash_scatter_add",
    "hash_scatter_add_per_level",
    "sorted_block_scatter_add",
    "sorted_block_scatter_add_v2",
    "sorted_window_gather",
]
