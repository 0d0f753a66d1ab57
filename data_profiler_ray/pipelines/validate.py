"""End-to-end validation run: profile + constraints + drift, resumable.

The north-rule lifecycle (SURVEY.md §3.4): one streaming pass per pending
partition set —

    read_parquet(pending shards, include_paths) → part column
      → per-partition profile partials (map_batches, Arrow zero-copy)
          → groupby(part) merge → per-partition state checkpoint
      → row-local constraint checks (stateless map_batches)
      → conversation checks (hash shuffle on conv_id, narrow projection)
      → per-partition outputs: violations.parquet, verdicts.parquet,
        lineage.json, state.pkl, _DONE marker

Resume semantics: a partition with a ``_DONE`` marker is SKIPPED entirely —
its saved profile state, verdicts and lineage are reloaded and merged with
freshly computed partitions, so a rerun after failure recomputes only
unfinished work (north rule: "checkpointing completed partitions so runs
resume without recomputation"). The reference has no checkpointing at all
(failure = rerun whole file; SURVEY.md §4.1).

Partition = input shard (one parquet file). At 100 TB a partition would be a
key-range bucket of files written so conversation boundaries align with
partitions (writer buckets by hash(conv_id)); a conversation spanning two
partitions is attributed to the partition of its first row.

Drift on resume never re-reads finished partitions: per-partition profile
states carry the value counter + KLL sketch, and ``bin_accumulators`` bins
those into the baseline spec (stages/drift.py).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import pickle
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..config import ValidationConfig
from ..stages.constraints import (VIOLATION_SCHEMA, conversation_checks,
                                  split_verdicts)
from ..stages.drift import bin_accumulators, drift_from_counts, spec_from_profile
from ..stages.profile import (_merge_states, finalize_profile,
                              profile_partials_by_part)


def _part_of(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def _add_part_column(batch: pa.Table) -> pa.Table:
    parts = pc.replace_substring_regex(
        pc.replace_substring_regex(batch.column("path"), r"^.*/", ""),
        r"\.parquet$", "")
    batch = batch.drop_columns(["path"])
    return batch.append_column("part", parts)


def run_validation(input_dir: str, cfg: ValidationConfig,
                   baseline_profile: dict | None = None) -> dict:
    """Validate every parquet shard under ``input_dir``; resumable."""
    import datetime
    t0 = datetime.datetime.now()
    out = cfg.output_dir
    os.makedirs(os.path.join(out, "parts"), exist_ok=True)
    shards = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not shards:
        raise FileNotFoundError(f"no parquet shards under {input_dir}")

    done, pending = [], []
    for p in shards:
        part = _part_of(p)
        if os.path.exists(os.path.join(out, "parts", part, "_DONE")):
            done.append(p)
        else:
            pending.append(p)

    # clear leftovers of crashed/partial runs for pending parts (workers
    # write verdict files before the _DONE marker lands)
    import shutil
    for p in pending:
        shutil.rmtree(os.path.join(out, "parts", _part_of(p)),
                      ignore_errors=True)

    if pending:
        ds = ray.data.read_parquet(pending, include_paths=True)
        ds = ds.map_batches(_add_part_column, batch_format="pyarrow")
        ccfg = cfg.constraints
        narrow_cols = [c for c in (ccfg.group_column, ccfg.order_column,
                                   ccfg.ts_column, ccfg.role_column,
                                   ccfg.tool_column)
                       if c in ds.schema().names]
        # projection-pruned narrow read for constraints: text never leaves
        # storage on this path; row-local violations are emitted by the
        # block checker itself, so no extra scan
        ds_narrow = ray.data.read_parquet(
            pending, include_paths=True, columns=narrow_cols)
        ds_narrow = ds_narrow.map_batches(_add_part_column,
                                          batch_format="pyarrow")

        # run the profile pass and the constraint pass CONCURRENTLY — they
        # are independent Dataset executions (wide read vs narrow read) and
        # overlap keeps the cluster busy through each other's barriers
        t0w = time.time()
        timings = {}

        def _profile_job():
            t = time.time()
            tbl = profile_partials_by_part(ds, cfg.profile)
            timings["profile"] = time.time() - t
            return tbl if tbl.num_rows else None

        def _constraint_job():
            """Consume the constraint stream WITHOUT materializing verdict
            rows on the driver: verdict rows (O(#conversations)) are written
            to per-partition parquet from the WORKERS (idempotent
            content-hashed filenames, so task retries overwrite identically;
            on a cluster this path would be shared/object storage), and only
            per-part tally rows + the capped violation rows come back."""
            t = time.time()
            cc = conversation_checks(ds_narrow, ccfg,
                                     emit_row_violations=True).materialize()
            viol = _concat(cc.map_batches(
                lambda b: b.filter(pc.and_(
                    pc.not_equal(b.column("kind"), "__verdict__"),
                    pc.not_equal(b.column("kind"), "__boundary__"))),
                batch_format="pyarrow"))
            tallies = _concat_any(cc.map_batches(
                _VerdictWriter(os.path.join(out, "parts")),
                batch_format="pyarrow"))
            timings["constraints"] = time.time() - t
            return viol, tallies

        # two concurrent executions would EACH schedule up to the full CPU
        # count (2× oversubscription); cap the shared execution budget so
        # combined in-flight tasks ≈ cluster CPUs
        from ray.data import DataContext
        from ray.data._internal.execution.interfaces import ExecutionResources
        ctx = DataContext.get_current()
        prev_limits = ctx.execution_options.resource_limits
        try:
            n_cpus = int(ray.cluster_resources().get("CPU", 8))
            ctx.execution_options.resource_limits = ExecutionResources(
                cpu=max(n_cpus // 2, 1))
        except Exception:
            prev_limits = None

        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_prof = pool.submit(_profile_job)
            f_con = pool.submit(_constraint_job)
            states = f_prof.result()
            violations, tally_tbl = f_con.result()
        if prev_limits is not None:
            ctx.execution_options.resource_limits = prev_limits
        violations = violations.cast(VIOLATION_SCHEMA)
        tallies_by_part: dict[str, dict] = {}
        if tally_tbl.num_rows:
            for r in tally_tbl.to_pylist():
                agg = tallies_by_part.setdefault(
                    r["part"], {"n_conversations": 0, "n_failed": 0,
                                "n_turns": 0})
                agg["n_conversations"] += r["n_conversations"]
                agg["n_failed"] += r["n_failed"]
                agg["n_turns"] += r["n_turns"]
        prof_s = timings.get("profile", time.time() - t0w)
        con_s = timings.get("constraints", time.time() - t0w)

        # --- per-partition checkpoint outputs ---
        state_by_part: dict[str, tuple[int, bytes]] = {}
        if states is not None:
            for part, rows, blob in zip(states.column("part").to_pylist(),
                                        states.column("rows").to_pylist(),
                                        states.column("state").to_pylist()):
                state_by_part[part] = (rows, blob)
        for path in pending:
            part = _part_of(path)
            pdir = os.path.join(out, "parts", part)
            os.makedirs(pdir, exist_ok=True)
            rows, blob = state_by_part.get(part, (0, pickle.dumps((0, {}))))
            with open(os.path.join(pdir, "state.pkl"), "wb") as f:
                f.write(blob)
            pv = violations.filter(pc.equal(violations.column("part"), part))
            pq.write_table(pv, os.path.join(pdir, "violations.parquet"))
            kinds = pv.column("kind").to_pylist()
            tal = tallies_by_part.get(
                part, {"n_conversations": 0, "n_failed": 0, "n_turns": 0})
            lineage = {
                "part": part,
                "input_path": path,
                "rows_in": rows,
                "n_conversations": tal["n_conversations"],
                "n_violations": pv.num_rows,
                "violations_by_kind": {k: kinds.count(k) for k in set(kinds)},
                "n_failed_conversations": tal["n_failed"],
                "passed": pv.num_rows == 0,
                "state_digest": hashlib.sha256(blob).hexdigest()[:16],
                "profile_stage_s": round(prof_s, 3),
                "constraint_stage_s": round(con_s, 3),
                "completed_at": time.time(),
            }
            with open(os.path.join(pdir, "lineage.json"), "w") as f:
                json.dump(lineage, f, indent=2)
            with open(os.path.join(pdir, "_DONE"), "w") as f:
                f.write("ok")

    # --- final merge across ALL partitions (done + fresh) ---
    blobs, lineages = [], []
    for path in shards:
        part = _part_of(path)
        pdir = os.path.join(out, "parts", part)
        with open(os.path.join(pdir, "state.pkl"), "rb") as f:
            blobs.append(f.read())
        with open(os.path.join(pdir, "lineage.json")) as f:
            lineages.append(json.load(f))

    total_rows, merged = _merge_states(blobs)
    profile = finalize_profile(total_rows, merged, cfg.profile, t0,
                               filenames=shards)
    with open(os.path.join(out, "profile.json"), "w") as f:
        json.dump(profile, f, indent=2, default=str)

    n_convs = sum(l["n_conversations"] for l in lineages)
    n_failed = sum(l["n_failed_conversations"] for l in lineages)
    # convenience single-file verdict rollup ONLY while small; at scale the
    # partitioned parts/<part>/verdicts/*.parquet files ARE the output
    if n_convs <= _VERDICT_ROLLUP_MAX_ROWS:
        import glob as _glob
        files = sorted(_glob.glob(
            os.path.join(out, "parts", "*", "verdicts", "*.parquet")))
        if files:
            pq.write_table(pa.concat_tables([pq.read_table(f) for f in files]),
                           os.path.join(out, "verdicts.parquet"))

    drift = None
    if baseline_profile is not None:
        spec = spec_from_profile(baseline_profile)
        drift = drift_from_counts(spec, bin_accumulators(spec, merged),
                                  cfg.drift)
        with open(os.path.join(out, "drift.json"), "w") as f:
            json.dump(drift, f, indent=2)

    summary = {
        "profile": profile,
        "drift": drift,
        "lineage": lineages,
        "parts_total": len(shards),
        "parts_recomputed": len(pending),
        "parts_skipped": len(done),
        "total_rows": total_rows,
        "n_conversations": n_convs,
        "n_failed_conversations": n_failed,
        "n_violations": sum(l["n_violations"] for l in lineages),
        "passed": all(l["passed"] for l in lineages),
        "output_dir": out,
    }
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump({k: v for k, v in summary.items() if k != "profile"},
                  f, indent=2, default=str)
    return summary


_VERDICT_ROLLUP_MAX_ROWS = 5_000_000


class _VerdictWriter:
    """map_batches callable: decode the batch's verdict rows, write them to
    ``<parts_root>/<part>/verdicts/v-<digest>.parquet`` from the worker, and
    emit ONE tally row per part — the driver never sees verdict rows.

    Filenames are content-hashed over the batch's conv_ids, so a retried
    task overwrites its own file idempotently. Local-mode note: workers and
    driver share the filesystem; on a multi-node cluster ``parts_root``
    must be shared/object storage.
    """

    def __init__(self, parts_root: str):
        self.parts_root = parts_root

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.constraints import split_verdicts
        vrows = batch.filter(pc.equal(batch.column("kind"), "__verdict__"))
        empty = pa.table({"part": pa.array([], pa.string()),
                          "n_conversations": pa.array([], pa.int64()),
                          "n_failed": pa.array([], pa.int64()),
                          "n_turns": pa.array([], pa.int64())})
        if vrows.num_rows == 0:
            return empty
        _, verdicts = split_verdicts(vrows)
        parts, n_conv, n_fail, n_turn = [], [], [], []
        for part in pc.unique(verdicts.column("part")).to_pylist():
            sub = verdicts.filter(pc.equal(verdicts.column("part"), part))
            pdir = os.path.join(self.parts_root, str(part), "verdicts")
            os.makedirs(pdir, exist_ok=True)
            digest = hashlib.md5(
                "".join(sub.column("conv_id").to_pylist()).encode()
            ).hexdigest()[:16]
            pq.write_table(sub, os.path.join(pdir, f"v-{digest}.parquet"))
            parts.append(part)
            n_conv.append(sub.num_rows)
            n_fail.append(int(pc.sum(pc.cast(pc.invert(sub.column("passed")),
                                             pa.int64())).as_py() or 0))
            n_turn.append(int(pc.sum(sub.column("n_turns")).as_py() or 0))
        return pa.table({"part": pa.array(parts, pa.string()),
                         "n_conversations": pa.array(n_conv, pa.int64()),
                         "n_failed": pa.array(n_fail, pa.int64()),
                         "n_turns": pa.array(n_turn, pa.int64())})


def _concat(ds: "ray.data.Dataset") -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    if not tables:
        return VIOLATION_SCHEMA.empty_table()
    return pa.concat_tables([t.cast(VIOLATION_SCHEMA) for t in tables])


def _concat_any(ds: "ray.data.Dataset") -> pa.Table:
    tables = [t for t in ds.iter_batches(batch_format="pyarrow")
              if t.num_rows]
    if not tables:
        return pa.table({"part": pa.array([], pa.string()),
                         "n_conversations": pa.array([], pa.int64()),
                         "n_failed": pa.array([], pa.int64()),
                         "n_turns": pa.array([], pa.int64())})
    return pa.concat_tables(tables)
