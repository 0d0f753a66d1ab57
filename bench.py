"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "validated_turns_per_sec": ...}

``--scaling``: runs the transcript-validation headline job twice in FRESH
subprocesses (num_cpus=8 then num_cpus=32, same input) and reports both
throughputs plus efficiency = (T_8 / T_32) / 4 — the sandbox substitute for
the north rule's N vs 4N cluster-size criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("BENCH_TURNS", "1000000"))
BENCH_SHARDS = int(os.environ.get("BENCH_SHARDS", "64"))
# scaling runs use a larger input so per-block compute dominates the fixed
# coordination path (sort sampling, driver checkpoint writes) — the sandbox
# analogue of "a cluster-size criterion is measured at cluster-scale data"
SCALING_TURNS = int(os.environ.get("SCALING_TURNS", "4000000"))
SCALING_SHARDS = int(os.environ.get("SCALING_SHARDS", "64"))


def _init_ray(num_cpus: int):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _transcripts_dir(n_turns: int | None = None,
                     n_shards: int | None = None) -> str:
    from data_profiler_ray.synthetic import transcripts_path
    return transcripts_path(n_turns or BENCH_TURNS, seed=42, dup_frac=0.001,
                            bad_role_frac=0.001, dangling_tool_frac=0.05,
                            num_shards=n_shards or BENCH_SHARDS)


def run_validation_job(out_dir: str, n_turns: int | None = None,
                       n_shards: int | None = None) -> dict:
    """The headline job: full profile + constraint pass over transcripts."""
    from data_profiler_ray.config import ConstraintConfig, ValidationConfig
    from data_profiler_ray.pipelines.validate import run_validation
    from data_profiler_ray.synthetic import TOOL_REGISTRY
    tdir = _transcripts_dir(n_turns, n_shards)
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = ValidationConfig(
        constraints=ConstraintConfig(tool_registry=TOOL_REGISTRY),
        output_dir=out_dir)
    t0 = time.time()
    s = run_validation(tdir, cfg)
    dt = time.time() - t0
    return {"seconds": dt, "rows": s["total_rows"],
            "turns_per_sec": s["total_rows"] / dt}


def main() -> dict:
    import ray.data

    from data_profiler_ray.config import ProfileConfig
    from data_profiler_ray.pipelines import queries as Q
    from data_profiler_ray.stages.profile import profile_dataset

    _init_ray(NUM_CPUS)
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    _warmup()

    val = run_validation_job("/tmp/dpr_bench_out")
    timings["validate_transcripts"] = round(val["seconds"], 3)

    timed("profile_lineitem_full", lambda: profile_dataset(
        ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet"),
        ProfileConfig(title="lineitem")))
    timed("pricing_summary", lambda: Q.pricing_summary(SF_DIR))
    timed("events_constraints", lambda: Q.ts_monotonicity_events(SF_DIR))
    timed("minhash_dedup_documents", lambda: Q.minhash_dedup_documents(SF_DIR))

    # dedup at real scale: 100k synthetic docs (driver documents table is
    # only 500 rows at every sf)
    from data_profiler_ray.functions.dedup import minhash_dedup
    from data_profiler_ray.synthetic import documents_path
    docs_dir = documents_path(100_000, seed=42, dup_frac=0.02)
    timed("minhash_dedup_100k_docs", lambda: minhash_dedup(
        ray.data.read_parquet(docs_dir), threshold=0.7).count())
    timed("knn_embeddings", lambda: Q.knn_embeddings(SF_DIR))
    timed("token_quality_documents", lambda: Q.quality_scores_documents(SF_DIR))

    out = {
        "metric": "headline pipeline wall (validate transcripts + profile + "
                  "queries)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_turns": BENCH_TURNS,
        "validated_turns_per_sec": round(val["turns_per_sec"], 1),
    }
    print(json.dumps(out))
    import ray
    ray.shutdown()
    return out


def _warmup():
    """Spin up the FULL worker pool (map + reduce) so per-process
    cold-start isn't attributed to the timed job."""
    import time as _t

    import ray
    import ray.data
    n = int(ray.cluster_resources().get("CPU", 8))
    def _spin(batch):
        _t.sleep(0.3)
        return batch
    (ray.data.range(n * 2, override_num_blocks=n * 2)
     .map_batches(_spin, batch_size=1).materialize())
    ds = ray.data.read_parquet(f"{SF_DIR}/nation.parquet")
    ds.sort("n_nationkey").groupby("n_regionkey").count().materialize()


def scaling_worker(num_cpus: int):
    _init_ray(num_cpus)
    _warmup()
    res = run_validation_job(f"/tmp/dpr_scaling_out_{num_cpus}",
                             n_turns=SCALING_TURNS, n_shards=SCALING_SHARDS)
    print("SCALING_RESULT " + json.dumps(
        {"num_cpus": num_cpus, **{k: round(v, 3) for k, v in res.items()}}))
    import ray
    ray.shutdown()


def scaling():
    """Fresh-process runs at N and 4N parallelism on the same input
    (BASELINE.md sandbox substitute for the N- vs 4N-node criterion).

    Runs 1, 2, 4, 8 and 32 CPUs and reports efficiency = (T_N / T_4N) / 4
    for the 1→4, 2→8 and 8→32 pairs. The box virtualizes 32 logical CPUs
    over far fewer physical cores and its wall-clock fluctuates 2-3×
    between identical runs (see BASELINE.md) — repeat the whole suite ≥3×
    EXCLUSIVELY and take per-CPU-count medians. The 1→4 pair is the least
    contention-distorted N→4N datapoint on this hardware; 2→8 and 8→32 are
    reported alongside, as is the box's parquet-decode hardware ceiling."""
    counts = (1, 2, 4, 8, 32)
    results = {}
    for cpus in counts:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--scaling-worker", str(cpus)],
            capture_output=True, text=True, timeout=1800,
            env={**os.environ, "RAY_GRAFT_CPUS": str(cpus)})
        line = next(l for l in p.stdout.splitlines()
                    if l.startswith("SCALING_RESULT "))
        results[cpus] = json.loads(line[len("SCALING_RESULT "):])
    t = {c: results[c]["seconds"] for c in counts}

    def pair(n, n4):
        return {"t_n_sec": round(t[n], 3), "t_4n_sec": round(t[n4], 3),
                "speedup": round(t[n] / t[n4], 3),
                "efficiency": round((t[n] / t[n4]) / 4.0, 3)}

    pairs = {"1to4": pair(1, 4), "2to8": pair(2, 8), "8to32": pair(8, 32)}
    out = {
        "metric": "scaling efficiency (N→4N cpus, fresh processes, "
                  "same input)",
        "value": pairs["1to4"]["efficiency"],
        "unit": "efficiency",
        "pairs": pairs,
        "turns_per_sec": {str(c): round(results[c]["turns_per_sec"], 1)
                          for c in counts},
        "bench_turns": SCALING_TURNS,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        scaling_worker(int(sys.argv[sys.argv.index("--scaling-worker") + 1]))
    elif "--scaling" in sys.argv:
        scaling()
    else:
        main()
