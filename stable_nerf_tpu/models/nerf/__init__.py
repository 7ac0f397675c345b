from .network import NeRFParams, nerf_init, nerf_apply, nerf_density
from .grid import (
    OccupancyGridState,
    grid_init,
    mark_untrained_grid,
    reset_extra_state,
    update_extra_state,
)
from .renderer import render

__all__ = [
    "NeRFParams",
    "nerf_init",
    "nerf_apply",
    "nerf_density",
    "OccupancyGridState",
    "grid_init",
    "mark_untrained_grid",
    "reset_extra_state",
    "update_extra_state",
    "render",
]
