"""Transcript constraint suite: uniqueness, ordering, domains, referential.

North-rule constraints over the transcript table
``(conv_id, turn_idx, role, text, tool, ts)``:

- **uniqueness** of ``(conv_id, turn_idx)`` — the reference silently drops
  duplicate datetime-index rows (``/root/reference/stelardataprofiler/
  tabular_timeseries/variables/utils.py:105-107``); here duplicates become
  violation rows instead (SURVEY.md §2.7 D1);
- **contiguous / monotone turn ordering** and **non-decreasing ts** within a
  conversation — the monotonic-flag analogue of ``variables/numeric.py:61-79``
  evaluated per group;
- **role domain** membership — the value-set membership pattern of
  ``check_if_boolean`` (``variables/utils.py:232-250``) applied to a
  categorical domain;
- **referential integrity of tool values** against an allowed-tool registry
  (SURVEY.md §2.4 J3) — a broadcast semi/anti join: the registry rides to
  every task once (Ray serializes the callable-class constructor args into
  the object store, one copy per node), ``pc.is_in`` does the probe; no
  shuffle.

Execution shape (SURVEY.md §3.4):

- Row-local checks (role domain, tool registry) are STATELESS ``map_batches``
  over zero-copy Arrow — they never shuffle and scale linearly.
- Conversation-local checks (uniqueness, gaps, ts order) hash-shuffle ONLY
  the key columns (``conv_id, turn_idx, ts, role`` — ``text`` is projected
  away so the wide payload never enters the exchange) and run as
  ``groupby(conv_id).map_groups`` with an in-group sort.  Shuffle volume is
  o(input) because the text column dominates transcript bytes.
  Boundary carry: block-boundary conversations re-emit RAW (narrow) rows
  for the exact driver re-check — bounded by conversation length, which
  unlike per-user event streams has a natural ceiling. A conversation
  rivaling the dataset in size would degrade to a driver pull; the
  upgrade path is the ``stages/segments.py`` CutKernel partial-merge
  protocol (r4): dup/ts/role/tool counts merge associatively and turn
  contiguity merges via per-piece (dense, first, last) triples, with raw
  rows only for pieces that are anomalous in isolation.
  Hot conversations: Ray Data's sort-based groupby shuffle spills oversized
  groups rather than OOMing; per-turn-local subsets of these checks could be
  salted ``(conv_id, turn_idx % k)``, but duplicate detection and gap
  detection need the whole turn set per conversation, so the unsalted key is
  the correctness-bearing choice (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import ConstraintConfig

# violation-row schema: one row per violation, referencing rows by key only
# (never by text payload) so violation output stays narrow at scale
VIOLATION_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("column", pa.string()),
    ("value", pa.string()),
    ("detail", pa.string()),
    ("part", pa.string()),
])

VERDICT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("part", pa.string()),
    ("n_turns", pa.int64()),
    ("n_duplicate_key", pa.int64()),
    ("n_turn_gap", pa.int64()),
    ("n_ts_regression", pa.int64()),
    ("n_bad_role", pa.int64()),
    ("n_dangling_tool", pa.int64()),
    ("passed", pa.bool_()),
])


def _empty_violations() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()


def _emit_rows(kind: str, column: str, batch: pa.Table, mask, values,
               conv, turn, part) -> pa.Table:
    idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    if idx.size == 0:
        return _empty_violations()
    take = pa.array(idx)
    return pa.table({
        "kind": pa.array([kind] * idx.size, pa.string()),
        "conv_id": conv.take(take).cast(pa.string()),
        "turn_idx": turn.take(take).cast(pa.int32()),
        "column": pa.array([column] * idx.size, pa.string()),
        "value": values.take(take).cast(pa.string()),
        "detail": pa.nulls(idx.size, pa.string()),
        "part": part.take(take).cast(pa.string()),
    }, schema=VIOLATION_SCHEMA)


def _row_violation_rows(batch: pa.Table, cfg: ConstraintConfig,
                        role_arr: pa.Array, tool_arr: pa.Array | None
                        ) -> list[pa.Table]:
    """Vectorized row-local violation rows (bad role / dangling tool)."""
    out: list[pa.Table] = []
    conv = batch.column("conv_id")
    turn = batch.column(cfg.order_column)
    part = (batch.column("part") if "part" in batch.column_names
            else pa.nulls(len(batch), pa.string()))
    if cfg.role_column in batch.column_names:
        role = batch.column(cfg.role_column)
        bad_role = pc.and_(pc.is_valid(role),
                           pc.invert(pc.is_in(role, value_set=role_arr)))
        t = _emit_rows("bad_role", cfg.role_column, batch, bad_role,
                       role, conv, turn, part)
        if t.num_rows:
            out.append(t)
    if tool_arr is not None and cfg.tool_column in batch.column_names:
        tool = batch.column(cfg.tool_column)
        bad_tool = pc.and_(pc.is_valid(tool),
                           pc.invert(pc.is_in(tool, value_set=tool_arr)))
        t = _emit_rows("dangling_tool", cfg.tool_column, batch, bad_tool,
                       tool, conv, turn, part)
        if t.num_rows:
            out.append(t)
    return out


class RowChecks:
    """Stateless map_batches callable for row-local constraint checks.

    Emits violation rows for out-of-domain ``role`` values and ``tool``
    values missing from the registry. The domains are Arrow arrays built
    once per actor/task in ``__init__`` (broadcast, not per-batch).
    """

    def __init__(self, cfg: ConstraintConfig, registry_ref=None):
        self.cfg = cfg
        registry = cfg.tool_registry
        if registry_ref is not None:
            registry = ray.get(registry_ref)
        self.role_set = pa.array(sorted(set(cfg.role_domain)), type=pa.string())
        self.tool_set = (pa.array(sorted(set(registry)), type=pa.string())
                         if registry else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = _row_violation_rows(batch, self.cfg, self.role_set, self.tool_set)
        return pa.concat_tables(out) if out else _empty_violations()


def _check_conversation(group: pa.Table, cfg: ConstraintConfig,
                        role_set: set, tool_set: set | None) -> pa.Table:
    """Per-conversation ordered checks; returns violations + one verdict row
    (verdict marked by kind='__verdict__', unpacked downstream)."""
    conv_id = group.column("conv_id")[0].as_py()
    part = (group.column("part")[0].as_py()
            if "part" in group.column_names else None)
    turn = group.column("turn_idx").to_numpy(zero_copy_only=False)
    order = np.argsort(turn, kind="stable")
    turn_s = turn[order]
    n = turn_s.size

    v_kind: list[str] = []
    v_turn: list[int] = []
    v_detail: list[str] = []

    # uniqueness of (conv_id, turn_idx) — D1
    dup_mask = np.zeros(n, dtype=bool)
    dup_mask[1:] = turn_s[1:] == turn_s[:-1]
    n_dup = int(dup_mask.sum())
    for t in np.unique(turn_s[dup_mask])[: cfg.max_violations_per_kind]:
        cnt = int((turn_s == t).sum())
        v_kind.append("duplicate_key")
        v_turn.append(int(t))
        v_detail.append(f"count={cnt}")

    # contiguity: turn_idx must be 0..n_distinct-1
    n_gap = 0
    if cfg.require_contiguous_turns:
        uniq = np.unique(turn_s)
        expected = np.arange(uniq.size, dtype=turn_s.dtype)
        if uniq.size and not np.array_equal(uniq, expected):
            # report each missing index in the covered range (capped)
            missing = np.setdiff1d(expected, uniq, assume_unique=True)
            extra = np.setdiff1d(uniq, expected, assume_unique=True)
            n_gap = int(missing.size + extra.size)
            for t in missing[: cfg.max_violations_per_kind]:
                v_kind.append("turn_gap")
                v_turn.append(int(t))
                v_detail.append("missing turn index")
            for t in extra[: cfg.max_violations_per_kind]:
                v_kind.append("turn_gap")
                v_turn.append(int(t))
                v_detail.append("out-of-range turn index")

    # non-decreasing ts along turn order
    n_ts = 0
    if cfg.ts_column in group.column_names:
        ts = group.column(cfg.ts_column).cast(pa.int64()).to_numpy(
            zero_copy_only=False)[order]
        reg = np.flatnonzero(np.diff(ts) < 0)
        n_ts = int(reg.size)
        for i in reg[: cfg.max_violations_per_kind]:
            v_kind.append("ts_regression")
            v_turn.append(int(turn_s[i + 1]))
            v_detail.append(f"ts decreased by {int(ts[i] - ts[i + 1])}us")

    # row-local counts recomputed here only for the verdict tallies
    n_bad_role = 0
    if cfg.role_column in group.column_names:
        roles = group.column(cfg.role_column)
        valid = pc.drop_null(roles)
        if len(valid):
            in_dom = pc.is_in(valid, value_set=pa.array(sorted(role_set)))
            n_bad_role = len(valid) - int(pc.sum(in_dom.cast(pa.int8())).as_py() or 0)
    n_bad_tool = 0
    if tool_set is not None and cfg.tool_column in group.column_names:
        tools = pc.drop_null(group.column(cfg.tool_column))
        if len(tools):
            in_reg = pc.is_in(tools, value_set=pa.array(sorted(tool_set)))
            n_bad_tool = len(tools) - int(pc.sum(in_reg.cast(pa.int8())).as_py() or 0)

    passed = not (n_dup or n_gap or n_ts or n_bad_role or n_bad_tool)
    k = len(v_kind)
    return pa.table({
        "kind": pa.array(v_kind + ["__verdict__"], pa.string()),
        "conv_id": pa.array([conv_id] * (k + 1), pa.string()),
        "turn_idx": pa.array(v_turn + [n], pa.int32()),
        "column": pa.array([None] * k + [None], pa.string()),
        "value": pa.array([None] * k + [None], pa.string()),
        "detail": pa.array(
            v_detail
            + [f"{n_dup}|{n_gap}|{n_ts}|{n_bad_role}|{n_bad_tool}|{int(passed)}"],
            pa.string()),
        "part": pa.array([part] * (k + 1), pa.string()),
    }, schema=VIOLATION_SCHEMA)


class _BlockChecker:
    """Vectorized per-block conversation checks over a (conv_id, turn_idx)
    sorted dataset.

    After the range-partition sort, every block is a contiguous key range:
    a conversation can only be cut at the block's first/last group. The
    checker therefore

    - runs ALL interior conversations through numpy segment kernels
      (np.add.reduceat over change-point segments — zero per-group Python
      on the clean path; only conversations with an actual turn-structure
      anomaly fall back to the exact per-conversation routine to emit
      detailed violation rows), and
    - re-emits the first/last group's raw rows as ``__boundary__`` rows for
      a second, tiny pass (o(#blocks · conv_len) rows) that re-checks
      possibly-cut conversations exactly.
    """

    def __init__(self, cfg: ConstraintConfig, emit_row_violations: bool = False,
                 assume_complete: bool = False):
        self.cfg = cfg
        self.emit_row_violations = emit_row_violations
        # assume_complete: every conversation is fully contained in the
        # batch (hash-bucketed input) — no boundary re-emission needed
        self.assume_complete = assume_complete
        self.role_set = set(cfg.role_domain)
        self.tool_set = set(cfg.tool_registry) if cfg.tool_registry else None
        self.role_arr = pa.array(sorted(self.role_set), pa.string())
        self.tool_arr = (pa.array(sorted(self.tool_set), pa.string())
                         if self.tool_set is not None else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return _empty_violations()
        batch = batch.combine_chunks()
        if self.assume_complete:
            # bucket path: rows arrive grouped but unsorted — sort locally
            order = pc.sort_indices(batch, sort_keys=[
                ("conv_id", "ascending"), (cfg.order_column, "ascending")])
            batch = batch.take(order)
        conv = batch.column("conv_id")
        codes_arr = pc.dictionary_encode(conv)
        if isinstance(codes_arr, pa.ChunkedArray):
            codes_arr = codes_arr.combine_chunks()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        turn = batch.column(cfg.order_column).to_numpy(zero_copy_only=False)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(change)
        g_count = starts.size
        ends = np.append(starts[1:], n)
        lens = ends - starts

        has_ts = cfg.ts_column in batch.column_names
        ts = (batch.column(cfg.ts_column).cast(pa.int64())
              .to_numpy(zero_copy_only=False) if has_ts else None)

        # per-row flags → per-group tallies via reduceat
        not_change = ~change
        dup_flags = not_change & (turn == np.roll(turn, 1))
        n_dup = np.add.reduceat(dup_flags, starts)
        if has_ts:
            d_ts = ts - np.roll(ts, 1)
            reg_flags = not_change & (d_ts < 0)
            n_reg = np.add.reduceat(reg_flags, starts)
        else:
            n_reg = np.zeros(g_count, dtype=np.int64)

        n_bad_role = np.zeros(g_count, dtype=np.int64)
        if cfg.role_column in batch.column_names:
            role = batch.column(cfg.role_column)
            bad = pc.and_(pc.is_valid(role),
                          pc.invert(pc.is_in(role, value_set=self.role_arr)))
            n_bad_role = np.add.reduceat(
                bad.to_numpy(zero_copy_only=False), starts).astype(np.int64)
        n_bad_tool = np.zeros(g_count, dtype=np.int64)
        if self.tool_arr is not None and cfg.tool_column in batch.column_names:
            tool = batch.column(cfg.tool_column)
            badt = pc.and_(pc.is_valid(tool),
                           pc.invert(pc.is_in(tool, value_set=self.tool_arr)))
            n_bad_tool = np.add.reduceat(
                badt.to_numpy(zero_copy_only=False), starts).astype(np.int64)

        first_turn = turn[starts]
        last_turn = turn[ends - 1]
        if cfg.require_contiguous_turns:
            clean_turns = (n_dup == 0) & (first_turn == 0) & (
                last_turn == lens - 1)
        else:
            clean_turns = n_dup == 0

        boundary = np.zeros(g_count, dtype=bool)
        if not self.assume_complete:
            boundary[0] = True
            boundary[g_count - 1] = True
        anomalous = ~boundary & (~clean_turns | (n_reg > 0))
        clean = ~boundary & ~anomalous

        out_tables: list[pa.Table] = []

        if self.emit_row_violations:
            # row-local violations for interior rows only; boundary groups
            # get theirs in the exact second pass (no double-emission)
            if self.assume_complete:
                lo, hi = 0, n
            else:
                lo, hi = int(ends[0]), int(starts[g_count - 1])
            if hi > lo:
                interior = batch.slice(lo, hi - lo)
                out_tables.extend(_row_violation_rows(
                    interior, cfg, self.role_arr, self.tool_arr))

        # clean interior conversations → vectorized verdict rows
        c_idx = np.flatnonzero(clean)
        if c_idx.size:
            part_col = ("part" in batch.column_names)
            parts = (batch.column("part").take(pa.array(starts[c_idx]))
                     if part_col else pa.nulls(c_idx.size, pa.string()))
            passed = ((n_bad_role[c_idx] == 0) & (n_bad_tool[c_idx] == 0))
            details = [f"0|0|0|{br}|{bt}|{int(p)}" for br, bt, p in
                       zip(n_bad_role[c_idx], n_bad_tool[c_idx], passed)]
            out_tables.append(pa.table({
                "kind": pa.array(["__verdict__"] * c_idx.size, pa.string()),
                "conv_id": conv.take(pa.array(starts[c_idx])).cast(pa.string()),
                "turn_idx": pa.array(lens[c_idx], pa.int32()),
                "column": pa.nulls(c_idx.size, pa.string()),
                "value": pa.nulls(c_idx.size, pa.string()),
                "detail": pa.array(details, pa.string()),
                "part": parts.cast(pa.string()),
            }, schema=VIOLATION_SCHEMA))

        # anomalous interior conversations → exact per-conv routine (rare)
        for g in np.flatnonzero(anomalous):
            sub = batch.slice(int(starts[g]), int(lens[g]))
            out_tables.append(_check_conversation(sub, cfg, self.role_set,
                                                  self.tool_set))

        # boundary groups → re-emit raw rows for the exact second pass
        if not self.assume_complete:
            for g in np.unique([0, g_count - 1]):
                sub = batch.slice(int(starts[g]), int(lens[g]))
                out_tables.append(self._encode_boundary(sub))

        return pa.concat_tables(out_tables) if out_tables else _empty_violations()

    def _encode_boundary(self, sub: pa.Table) -> pa.Table:
        cfg = self.cfg
        k = sub.num_rows
        ts = (sub.column(cfg.ts_column).cast(pa.int64()).cast(pa.string())
              if cfg.ts_column in sub.column_names
              else pa.nulls(k, pa.string()))
        role = (sub.column(cfg.role_column).cast(pa.string())
                if cfg.role_column in sub.column_names
                else pa.nulls(k, pa.string()))
        tool = (sub.column(cfg.tool_column).cast(pa.string())
                if cfg.tool_column in sub.column_names
                else pa.nulls(k, pa.string()))
        part = (sub.column("part").cast(pa.string())
                if "part" in sub.column_names else pa.nulls(k, pa.string()))
        return pa.table({
            "kind": pa.array(["__boundary__"] * k, pa.string()),
            "conv_id": sub.column("conv_id").cast(pa.string()),
            "turn_idx": sub.column(cfg.order_column).cast(pa.int32()),
            "column": tool,    # tool rides in `column`
            "value": role,     # role rides in `value`
            "detail": ts,      # epoch-µs rides in `detail`
            "part": part,
        }, schema=VIOLATION_SCHEMA)


def _decode_boundary(cfg: ConstraintConfig, group: pa.Table) -> pa.Table:
    cols = {
        "conv_id": group.column("conv_id"),
        cfg.order_column: group.column("turn_idx"),
        cfg.role_column: group.column("value"),
        cfg.tool_column: group.column("column"),
        "part": group.column("part"),
    }
    detail = group.column("detail")
    if detail.null_count < len(detail):
        cols[cfg.ts_column] = detail.cast(pa.int64()).cast(pa.timestamp("us"))
    return pa.table(cols)


def conversation_checks_bucketed(ds: "ray.data.Dataset",
                                 cfg: ConstraintConfig,
                                 emit_row_violations: bool = False,
                                 num_buckets: int | None = None
                                 ) -> "ray.data.Dataset":
    """Hash-shuffle variant (the north rule's literal shape): bucket =
    hash(conv_id) % B → ``groupby(bucket)`` co-locates every conversation
    whole → per-bucket local sort + the same vectorized kernel with
    ``assume_complete=True`` — NO global sort coordination and NO boundary
    second pass. B defaults to 2× cluster CPUs (per-group Python overhead
    is paid only B times). Hot conversations: a conversation always lands
    in one bucket; per-turn-local checks could be salted
    ``(conv_id, turn_idx % k)``, but duplicate/gap detection needs the
    whole turn set, so bucket size is bounded instead by B ≫ 1 and Ray's
    sort-based groupby spilling (SURVEY.md §7.3).

    Measured (2M turns, 8 CPUs, local): ~35 s vs ~10 s for the sorted path
    — Ray's groupby is itself sort-based, so bucketing only adds the
    conv-hash pass and loses the boundary trick's cheap kernels; the sorted
    ``conversation_checks`` stays the default. This variant remains the
    right shape when inputs are ALREADY hash-bucketed on conv_id at write
    time (no shuffle at all: ``groupby`` collapses to per-file groups)."""
    from ..functions.text import hash_string_array
    cols = [cfg.group_column, cfg.order_column]
    names = ds.schema().names
    for c in (cfg.ts_column, cfg.role_column, cfg.tool_column, "part"):
        if c in names:
            cols.append(c)
    narrow = ds.select_columns(cols)
    if num_buckets is None:
        num_buckets = 2 * int(ray.cluster_resources().get("CPU", 8))

    def add_bucket(b: pa.Table) -> pa.Table:
        h = hash_string_array(b.column(cfg.group_column))
        return b.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int32)))

    checker = _BlockChecker(cfg, emit_row_violations=emit_row_violations,
                            assume_complete=True)

    def check_bucket(group: pa.Table) -> pa.Table:
        return checker(group.drop_columns(["__bucket"]))

    return narrow.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(check_bucket, batch_format="pyarrow")


def conversation_checks_parts(ds: "ray.data.Dataset", cfg: ConstraintConfig,
                              emit_row_violations: bool = False
                              ) -> tuple["ray.data.Dataset", pa.Table]:
    """Internal split form of ``conversation_checks``: returns
    ``(checked, fixed)`` where ``checked`` is the materialized block-check
    stream STILL containing ``__boundary__`` rows (consumers filter them
    inline — avoids an extra full pass over the stream) and ``fixed`` is
    the driver-computed exact re-check of the o(#blocks) block-boundary
    conversations (violations + verdict rows, VIOLATION_SCHEMA).
    """
    cols = [cfg.group_column, cfg.order_column]
    names = ds.schema().names
    for c in (cfg.ts_column, cfg.role_column, cfg.tool_column, "part"):
        if c in names:
            cols.append(c)
    narrow = ds.select_columns(cols)
    role_set = set(cfg.role_domain)
    tool_set = set(cfg.tool_registry) if cfg.tool_registry else None

    # Coalesce before the range-partition sort: with many small input blocks
    # Ray's sort fans B input blocks into ~4B tiny partitions and the
    # exchange drowns in per-object overhead (measured 8.6s → 1.25s at 1M
    # rows by coalescing 64 → 16 blocks first). Target ~2 blocks per CPU;
    # at cluster scale block count should instead track
    # bytes / target_max_block_size.
    # width: Ray's sort splits each of B blocks ~4-way, so B beyond ~24 on
    # a small input recreates the tiny-partition exchange; large inputs
    # derive B from bytes/128MB (stages/segments.shuffle_width, r2 item 3)
    # (materialize first: size_bytes() on the lazy projection would execute
    # it AND the sort would re-execute it — double parquet decode)
    from .segments import shuffle_width
    narrow = narrow.materialize()
    narrow = narrow.repartition(shuffle_width(narrow))

    checked = narrow.sort([cfg.group_column, cfg.order_column]).map_batches(
        _BlockChecker(cfg, emit_row_violations=emit_row_violations),
        batch_format="pyarrow", batch_size=None).materialize()
    # `checked` is o(input) but NOT O(1): one verdict row per conversation.
    # It stays DISTRIBUTED (materialized into the object store); only the
    # ≤2 possibly-cut conversations per block (`__boundary__` raw rows,
    # o(#blocks · conv_len)) are pulled to the driver for the exact re-check
    # — cheaper than a second distributed groupby in sort machinery.
    boundary_tbls = [
        t.cast(VIOLATION_SCHEMA) for t in checked.map_batches(
            lambda b: b.filter(pc.equal(b.column("kind"), "__boundary__")),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    boundary = (pa.concat_tables(boundary_tbls) if boundary_tbls
                else _empty_violations())

    fixed: list[pa.Table] = []
    if boundary.num_rows:
        role_arr = pa.array(sorted(role_set), pa.string())
        tool_arr = (pa.array(sorted(tool_set), pa.string())
                    if tool_set is not None else None)
        codes = pc.dictionary_encode(
            boundary.column("conv_id").combine_chunks())
        idx = codes.indices.to_numpy(zero_copy_only=False)
        order = np.argsort(idx, kind="stable")
        sorted_b = boundary.take(pa.array(order))
        idx_s = idx[order]
        starts = np.flatnonzero(np.r_[True, idx_s[1:] != idx_s[:-1]])
        ends = np.append(starts[1:], len(idx_s))
        for s, e in zip(starts, ends):
            dec = _decode_boundary(cfg, sorted_b.slice(int(s), int(e - s)))
            fixed.append(_check_conversation(dec, cfg, role_set, tool_set))
            if emit_row_violations:
                fixed.extend(_row_violation_rows(dec, cfg, role_arr, tool_arr))
    fixed_tbl = (pa.concat_tables([t.cast(VIOLATION_SCHEMA) for t in fixed])
                 if fixed else VIOLATION_SCHEMA.empty_table())
    return checked, fixed_tbl


def conversation_checks(ds: "ray.data.Dataset", cfg: ConstraintConfig,
                        emit_row_violations: bool = False
                        ) -> "ray.data.Dataset":
    """Range-partition sort on (conv_id, turn_idx) → vectorized block checks
    → exact re-check of block-boundary conversations (tiny second pass).

    Returns a Dataset of VIOLATION_SCHEMA rows, including one
    ``__verdict__`` row per conversation carrying the tally in ``detail``.
    Only the narrow key columns enter the shuffle — ``text`` never moves.
    """
    checked, fixed_tbl = conversation_checks_parts(
        ds, cfg, emit_row_violations=emit_row_violations)
    main = checked.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("kind"), "__boundary__"))
        .cast(VIOLATION_SCHEMA),
        batch_format="pyarrow")
    if fixed_tbl.num_rows:
        return main.union(ray.data.from_arrow(fixed_tbl))
    return main


def split_verdicts(all_rows: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Split the conversation_checks output into (violations, verdicts)."""
    is_verdict = pc.equal(all_rows.column("kind"), "__verdict__")
    violations = all_rows.filter(pc.invert(is_verdict))
    vrows = all_rows.filter(is_verdict)
    details = vrows.column("detail").to_pylist()
    parsed = np.array([[int(x) for x in d.split("|")] for d in details]
                      ) if details else np.zeros((0, 6), dtype=np.int64)
    verdicts = pa.table({
        "conv_id": vrows.column("conv_id"),
        "part": vrows.column("part"),
        "n_turns": vrows.column("turn_idx").cast(pa.int64()),
        "n_duplicate_key": pa.array(parsed[:, 0], pa.int64()),
        "n_turn_gap": pa.array(parsed[:, 1], pa.int64()),
        "n_ts_regression": pa.array(parsed[:, 2], pa.int64()),
        "n_bad_role": pa.array(parsed[:, 3], pa.int64()),
        "n_dangling_tool": pa.array(parsed[:, 4], pa.int64()),
        "passed": pa.array(parsed[:, 5].astype(bool)),
    }, schema=VERDICT_SCHEMA)
    return violations, verdicts


def row_violations(ds: "ray.data.Dataset", cfg: ConstraintConfig,
                   registry_ref=None) -> "ray.data.Dataset":
    """Stateless row-local violations (role domain + tool registry)."""
    cols = [cfg.group_column, cfg.order_column, cfg.role_column]
    names = ds.schema().names
    if cfg.tool_column in names:
        cols.append(cfg.tool_column)
    if "part" in names:
        cols.append("part")
    return ds.select_columns(cols).map_batches(
        RowChecks(cfg, registry_ref=registry_ref), batch_format="pyarrow")
