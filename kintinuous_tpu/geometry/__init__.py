from kintinuous_tpu.geometry import se3
from kintinuous_tpu.geometry.camera import (
    intrinsics_matrix,
    project,
    unproject,
)

__all__ = ["se3", "intrinsics_matrix", "project", "unproject"]
