"""Cross-cutting utilities: logging, run-once guards, image IO helpers."""

from pixel_heal_thyself_tpu.utils.run_once import (
    SingletonMeta,
    is_none,
    is_none_or_empty,
    is_truthy,
    run_once,
    run_once_multiprocessing,
)

__all__ = [
    "SingletonMeta",
    "is_none",
    "is_none_or_empty",
    "is_truthy",
    "run_once",
    "run_once_multiprocessing",
]
