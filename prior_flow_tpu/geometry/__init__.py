from . import erp
from .grids import RotationGrids, identity_grid, rotation_grids, sample_grid
from .rotation import (
    cartesian_to_spherical,
    diverge_zero,
    make_sample_grid,
    make_sample_grid_sized,
    plane_grid,
    rotate_cartesian,
    rotation_matrix,
    spherical_to_cartesian,
)

__all__ = [
    "erp",
    "RotationGrids",
    "identity_grid",
    "rotation_grids",
    "sample_grid",
    "cartesian_to_spherical",
    "diverge_zero",
    "make_sample_grid",
    "make_sample_grid_sized",
    "plane_grid",
    "rotate_cartesian",
    "rotation_matrix",
    "spherical_to_cartesian",
]
