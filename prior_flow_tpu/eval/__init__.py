from . import metrics
from .evaluate import (
    create_kitti_submission,
    create_sintel_submission,
    make_forward,
    validate_chairs,
    validate_city_regions,
    validate_flowscape,
    validate_flowscape_regions,
    validate_kitti,
    validate_mpf,
    validate_mpf_regions,
    validate_sintel,
)

__all__ = [
    "metrics",
    "create_kitti_submission",
    "create_sintel_submission",
    "make_forward",
    "validate_chairs",
    "validate_city_regions",
    "validate_flowscape",
    "validate_flowscape_regions",
    "validate_kitti",
    "validate_mpf",
    "validate_mpf_regions",
    "validate_sintel",
]
