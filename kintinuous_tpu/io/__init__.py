from kintinuous_tpu.io.klg import KlgLogReader, KlgLogWriter
from kintinuous_tpu.io.tum import (
    load_trajectory,
    save_trajectory,
    TrajectoryWriter,
)

__all__ = [
    "KlgLogReader",
    "KlgLogWriter",
    "load_trajectory",
    "save_trajectory",
    "TrajectoryWriter",
]
