"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: distributed profile of
    the core tables via the accumulator pipeline (SURVEY.md §3.4), returned
    as one per-column summary table."""
    import pandas as pd

    import ray.data

    from data_profiler_ray.config import ProfileConfig
    from data_profiler_ray.stages.profile import profile_dataset

    sf_dir = "/root/testdata/sf0.001"
    rows = []
    for table in ["lineitem", "orders", "customer", "documents", "events"]:
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet")
        prof = profile_dataset(ds, ProfileConfig(title=table))
        for v in prof["variables"]:
            rows.append({
                "table_name": table,
                "column_name": v["name"],
                "logical_type": v["type"],
                "cnt": int(v["count"]),
                "n_missing": int(v["num_missing"]),
                "n_distinct": int(v.get("n_distinct", 0)),
            })
    return pd.DataFrame(rows)


def queries() -> dict[str, Callable[[str], Any]]:
    from data_profiler_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from data_profiler_ray.pipelines.queries import ORACLE_SQL, _tv_fixture
    # the transcript oracle reads the deterministic synthetic fixture by
    # absolute path; materialize it here (cached, pure numpy — no Ray) so
    # the SQL runs even if the driver executes oracles before queries
    _tv_fixture()
    return dict(ORACLE_SQL)
