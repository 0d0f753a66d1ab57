"""data_profiler_ray — Ray-Data-native profiling + validation engine.

A from-scratch re-expression of stelar-eu/data-profiler's query and
data-processing capabilities on ray.data.Dataset pipelines: streaming Arrow
batches, mergeable sketch accumulators, actor pools for stateful stages, and
a transcript-table constraint/validation suite per the north rule.
"""

from .config import (ConstraintConfig, DriftConfig, ProfileConfig,
                     ValidationConfig)

__all__ = ["ProfileConfig", "ConstraintConfig", "DriftConfig", "ValidationConfig"]
__version__ = "0.1.0"
