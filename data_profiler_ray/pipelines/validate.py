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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

try:
    # Ray's read_parquet probes `from fsspec.implementations.http import
    # HTTPFileSystem` on EVERY path resolution, catching only
    # ModuleNotFoundError. In this env the import always fails (no aiohttp),
    # and two Dataset reads starting on different threads (the concurrent
    # profile+constraint execution below) can race the repeated import and
    # surface a plain ImportError instead. Registering a benign stub module
    # makes the probe deterministic; with no aiohttp there can be no real
    # HTTP filesystem, so `isinstance(..., HTTPFileSystem)` is always False.
    import fsspec.implementations.http  # noqa: F401
except ImportError:  # pragma: no cover - environment-dependent
    try:
        import sys as _sys
        import types as _types

        import fsspec.implementations  # noqa: F401

        _stub = _types.ModuleType("fsspec.implementations.http")

        class _NoHTTPFileSystem:  # never instantiated; isinstance-only
            pass

        _stub.HTTPFileSystem = _NoHTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = _stub
        import fsspec

        fsspec.implementations.http = _stub
    except Exception:
        pass

from ..config import ValidationConfig
from ..stages.constraints import (VIOLATION_SCHEMA,
                                  conversation_checks_parts, split_verdicts)
from ..stages.drift import bin_accumulators, drift_from_counts, spec_from_profile
from ..stages.profile import (_merge_states, dumps_state, finalize_profile,
                              merge_state_blobs_distributed,
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
    timings: dict[str, float] = {}
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
        # NOTE: no override_num_blocks here — forcing one block per shard
        # (tried: override_num_blocks=len(pending)) made whole 60k-row
        # shards single fold batches, whose distinct-value count overruns
        # the capped TopK counters and triggers per-batch shrink churn
        # (measured profile stage 110 s vs 24 s at 4M turns / 8 CPUs).
        # Ray's default block sizing keeps fold batches near the counter
        # caps; the per-part state merge handles multi-block parts.
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

        def _profile_job():
            t = time.time()
            tbl = profile_partials_by_part(ds, cfg.profile)
            timings["profile"] = time.time() - t
            return tbl if tbl.num_rows else None

        def _constraint_job():
            """Consume the constraint stream WITHOUT materializing verdict
            OR violation rows on the driver: both are written to
            per-partition parquet from the WORKERS (idempotent
            content-hashed filenames, so task retries overwrite identically;
            on a cluster this path would be shared/object storage).
            Violation rows are capped per kind per task
            (``max_violations_per_kind``); only per-part TALLY rows — a few
            ints each — come back to the driver, so driver memory is
            independent of violation count (round-1 scale-killer #6)."""
            t = time.time()
            checked, fixed = conversation_checks_parts(
                ds_narrow, ccfg, emit_row_violations=True)
            writer = _PartOutputWriter(os.path.join(out, "parts"),
                                       ccfg.max_violations_per_kind)
            # ONE pass over the checked stream (the writer skips the
            # cut-piece partial rows inline); the merged cut conversations
            # (o(#blocks) rows, already on the driver) go through the same
            # writer directly — no extra filter pass, no union op
            tallies = _concat_any(checked.map_batches(
                writer, batch_format="pyarrow"))
            if fixed.num_rows:
                tallies = pa.concat_tables([tallies, writer(fixed)])
            timings["constraints"] = time.time() - t
            return tallies

        # Stage scheduling: AUTO by input size. Concurrent execution of the
        # two pipelines wins while the working set is small (18.1 s vs
        # 25.2 s sequential at 8 CPUs / 1M turns) but collapses at larger
        # inputs on bandwidth-bound hardware: at 4M turns / 8 CPUs each
        # stage ran 3-8× slower inside the concurrent run (profile 91 s vs
        # 27 s solo, constraints 107 s vs 13 s solo) — two full pipelines
        # double the concurrent memory traffic and the cores starve.
        concurrent = getattr(cfg, "concurrent_stages", None)
        if concurrent is None:
            pending_bytes = sum(os.path.getsize(p) for p in pending)
            concurrent = pending_bytes <= getattr(
                cfg, "concurrent_max_bytes", 256 * 1024 * 1024)
        if concurrent:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=2) as pool:
                f_prof = pool.submit(_profile_job)
                f_con = pool.submit(_constraint_job)
                states = f_prof.result()
                tally_tbl = f_con.result()
        else:
            tally_tbl = _constraint_job()
            states = _profile_job()
        tallies_by_part: dict[str, dict] = {}
        if tally_tbl.num_rows:
            for r in tally_tbl.to_pylist():
                agg = tallies_by_part.setdefault(
                    r["part"], {k: 0 for k in _TALLY_COUNT_COLS})
                for k in _TALLY_COUNT_COLS:
                    agg[k] += r[k]
        prof_s = timings.get("profile", time.time() - t0w)
        con_s = timings.get("constraints", time.time() - t0w)

        tck = time.time()
        # --- per-partition checkpoint outputs (driver work: O(#parts) tiny
        # JSON/pickle writes; violation + verdict parquet already written
        # by the workers) ---
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
            rows, blob = state_by_part.get(part, (0, dumps_state((0, {}))))
            with open(os.path.join(pdir, "state.pkl"), "wb") as f:
                f.write(blob)
            tal = tallies_by_part.get(
                part, {k: 0 for k in _TALLY_COUNT_COLS})
            by_kind = {k[4:]: tal[k] for k in _TALLY_COUNT_COLS
                       if k.startswith("n_v_") and tal[k] > 0}
            n_viol = sum(by_kind.values())
            lineage = {
                "part": part,
                "input_path": path,
                "rows_in": rows,
                "n_conversations": tal["n_conversations"],
                "n_violations": n_viol,
                "violations_by_kind": by_kind,
                "n_failed_conversations": tal["n_failed"],
                "passed": n_viol == 0,
                "state_digest": hashlib.sha256(blob).hexdigest()[:16],
                "profile_stage_s": round(prof_s, 3),
                "constraint_stage_s": round(con_s, 3),
                "completed_at": time.time(),
            }
            with open(os.path.join(pdir, "lineage.json"), "w") as f:
                json.dump(lineage, f, indent=2)
            with open(os.path.join(pdir, "_DONE"), "w") as f:
                f.write("ok")
        timings["checkpoint_write"] = round(time.time() - tck, 3)

    # --- final merge across ALL partitions (done + fresh) ---
    tfm = time.time()
    blobs, lineages = [], []
    for path in shards:
        part = _part_of(path)
        pdir = os.path.join(out, "parts", part)
        with open(os.path.join(pdir, "state.pkl"), "rb") as f:
            blobs.append(f.read())
        with open(os.path.join(pdir, "lineage.json")) as f:
            lineages.append(json.load(f))

    total_rows, merged = merge_state_blobs_distributed(blobs)
    profile = finalize_profile(total_rows, merged, cfg.profile, t0,
                               filenames=shards)
    with open(os.path.join(out, "profile.json"), "w") as f:
        json.dump(profile, f, indent=2, default=str)
    timings["final_merge"] = round(time.time() - tfm, 3)

    n_convs = sum(l["n_conversations"] for l in lineages)
    n_failed = sum(l["n_failed_conversations"] for l in lineages)
    # convenience single-file verdict rollup ONLY while small; at scale the
    # partitioned parts/<part>/verdicts/*.parquet files ARE the output
    if n_convs <= _VERDICT_ROLLUP_MAX_ROWS:
        import glob as _glob
        files = sorted(_glob.glob(
            os.path.join(out, "parts", "*", "verdicts", "*.parquet")))
        if files:
            trl = time.time()
            pq.write_table(pa.concat_tables([pq.read_table(f) for f in files]),
                           os.path.join(out, "verdicts.parquet"))
            timings["rollup"] = round(time.time() - trl, 3)

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
        "timings": {k: round(v, 3) for k, v in timings.items()},
    }
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump({k: v for k, v in summary.items() if k != "profile"},
                  f, indent=2, default=str)
    return summary


# convenience single-file rollup only for SMALL runs (tests / interactive);
# at any real scale the partitioned parts/<part>/verdicts/*.parquet files
# ARE the output and the driver never re-reads them
_VERDICT_ROLLUP_MAX_ROWS = 10_000

_VIOLATION_KINDS = ("duplicate_key", "turn_gap", "ts_regression",
                    "bad_role", "dangling_tool")
# "other" tallies violation rows of kinds OUTSIDE _VIOLATION_KINDS: a future
# kind added upstream can't silently bypass n_violations / passed=false
_TALLY_COUNT_COLS = (("n_conversations", "n_failed", "n_turns")
                     + tuple(f"n_v_{k}" for k in _VIOLATION_KINDS)
                     + ("n_v_other",))
_TALLY_SCHEMA = pa.schema([("part", pa.string())]
                          + [(c, pa.int64()) for c in _TALLY_COUNT_COLS])


class _PartOutputWriter:
    """map_batches callable over the conversation_checks stream: writes the
    batch's verdict rows to ``<parts_root>/<part>/verdicts/v-<digest>.
    parquet`` and its violation rows (capped per kind per task) to
    ``<parts_root>/<part>/violations/x-<digest>.parquet`` from the WORKER,
    and emits ONE tally row per part — the driver never sees verdict or
    violation rows, so its memory is independent of violation count.

    Per-kind counts in the tally are PRE-cap (exact totals); only the
    persisted example rows are capped. Filenames are content-hashed over
    the batch's conv_ids, so a retried task overwrites its own file
    idempotently. Local-mode note: workers and driver share the
    filesystem; on a multi-node cluster ``parts_root`` must be
    shared/object storage.
    """

    def __init__(self, parts_root: str, max_per_kind: int):
        self.parts_root = parts_root
        self.max_per_kind = max_per_kind

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.constraints import split_verdicts
        if batch.num_rows == 0:
            return _TALLY_SCHEMA.empty_table()
        from ..stages.constraints import _META_KINDS
        batch = batch.filter(pc.invert(pc.is_in(
            batch.column("kind"), value_set=pa.array(_META_KINDS))))
        if batch.num_rows == 0:
            return _TALLY_SCHEMA.empty_table()
        is_v = pc.equal(batch.column("kind"), "__verdict__")
        vrows = batch.filter(is_v)
        viol = batch.filter(pc.invert(is_v))
        verdicts = split_verdicts(vrows)[1] if vrows.num_rows else None
        parts: set[str] = set()
        if verdicts is not None:
            parts |= set(pc.unique(verdicts.column("part")).to_pylist())
        if viol.num_rows:
            parts |= set(pc.unique(viol.column("part")).to_pylist())
        rows = []
        for part in sorted(p for p in parts if p is not None):
            row = {"part": part, **{c: 0 for c in _TALLY_COUNT_COLS}}
            if verdicts is not None:
                sub = verdicts.filter(pc.equal(verdicts.column("part"), part))
                if sub.num_rows:
                    pdir = os.path.join(self.parts_root, part, "verdicts")
                    os.makedirs(pdir, exist_ok=True)
                    digest = hashlib.md5(
                        "".join(sub.column("conv_id").to_pylist()).encode()
                    ).hexdigest()[:16]
                    pq.write_table(sub, os.path.join(pdir,
                                                     f"v-{digest}.parquet"))
                    row["n_conversations"] = sub.num_rows
                    row["n_failed"] = int(pc.sum(pc.cast(
                        pc.invert(sub.column("passed")),
                        pa.int64())).as_py() or 0)
                    row["n_turns"] = int(pc.sum(
                        sub.column("n_turns")).as_py() or 0)
            if viol.num_rows:
                sv = viol.filter(pc.equal(viol.column("part"), part))
                if sv.num_rows:
                    kinds = sv.column("kind").to_numpy(zero_copy_only=False)
                    keep_idx = []
                    for k in _VIOLATION_KINDS:
                        idx = np.flatnonzero(kinds == k)
                        row[f"n_v_{k}"] = int(idx.size)
                        keep_idx.append(idx[: self.max_per_kind])
                    other = np.flatnonzero(~np.isin(kinds,
                                                    _VIOLATION_KINDS))
                    if other.size:  # unknown kinds: keep capped, count too
                        row["n_v_other"] = int(other.size)
                        keep_idx.append(other[: self.max_per_kind])
                    capped = sv.take(pa.array(np.sort(
                        np.concatenate(keep_idx))))
                    pdir = os.path.join(self.parts_root, part, "violations")
                    os.makedirs(pdir, exist_ok=True)
                    digest = hashlib.md5(
                        ("|".join(capped.column("conv_id").to_pylist())
                         + f"|{capped.num_rows}").encode()).hexdigest()[:16]
                    pq.write_table(capped.cast(VIOLATION_SCHEMA),
                                   os.path.join(pdir,
                                                f"x-{digest}.parquet"))
            rows.append(row)
        if not rows:
            return _TALLY_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_TALLY_SCHEMA)


def _concat_any(ds: "ray.data.Dataset") -> pa.Table:
    tables = [t for t in ds.iter_batches(batch_format="pyarrow")
              if t.num_rows]
    if not tables:
        return pa.table({"part": pa.array([], pa.string()),
                         "n_conversations": pa.array([], pa.int64()),
                         "n_failed": pa.array([], pa.int64()),
                         "n_turns": pa.array([], pa.int64())})
    return pa.concat_tables(tables)
