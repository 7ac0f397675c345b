from .scatter import hash_scatter_add, sorted_block_scatter_add

__all__ = ["hash_scatter_add", "sorted_block_scatter_add"]
