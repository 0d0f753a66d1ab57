"""data_profiler_ray — Ray-Data-native profiling + validation engine.

A from-scratch re-expression of stelar-eu/data-profiler's query and
data-processing capabilities on ray.data.Dataset pipelines: streaming Arrow
batches, mergeable sketch accumulators, actor pools for stateful stages, and
a transcript-table constraint/validation suite per the north rule.
"""

from .config import (ConstraintConfig, DriftConfig, ProfileConfig,
                     ValidationConfig)

__all__ = [
    "ProfileConfig", "ConstraintConfig", "DriftConfig", "ValidationConfig",
    "profile_tabular", "profile_timeseries", "profile_text", "type_detection",
    "run_profile", "validate_transcripts", "profile_dataset",
]
__version__ = "0.1.0"


def __getattr__(name):
    """Lazy re-exports of the user-facing API (keeps import light; the api
    module pulls in ray.data)."""
    if name in ("profile_tabular", "profile_timeseries", "profile_text",
                "type_detection", "run_profile", "validate_transcripts"):
        from . import api
        return getattr(api, name)
    if name == "profile_dataset":
        from .stages.profile import profile_dataset
        return profile_dataset
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
