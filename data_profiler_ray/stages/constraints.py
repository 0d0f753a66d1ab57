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
  Boundary carry (r5, the ``stages/segments.py`` CutKernel protocol): a
  block-boundary conversation piece whose turn diffs are all exactly 1 and
  whose ts is non-decreasing ships ONE fixed-size ``__cutpart__`` partial
  row (n, first, last, ts_first, ts_last, bad-role/tool counts); dup/ts/
  role/tool counts merge associatively across pieces and turn contiguity
  merges via interval arithmetic over the per-piece (first, last) ranges —
  driver carry is o(#blocks) bytes even when ONE conversation spans every
  block. Only a piece that is anomalous IN ISOLATION (internal dup, gap,
  or ts regression) ships its raw (turn, ts) pairs as a ``__rawpiece__``
  row, so the driver pull is bounded by the anomalous pieces alone, never
  by conversation length.
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
    - emits the first/last group as a mergeable cut-piece partial
      (``__cutpart__``: one fixed-size row when the piece is clean in
      isolation; ``__rawpiece__``: a compact (turn, ts) IPC cell
      otherwise), merged exactly on the driver in o(#blocks) bytes
      (``_merge_cut_pieces``).
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
            # row-local violations are block-local context-free checks:
            # emit them for the WHOLE block (boundary groups included) —
            # the cut-piece merge never re-emits row-local rows
            out_tables.extend(_row_violation_rows(
                batch, cfg, self.role_arr, self.tool_arr))

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

        # boundary groups → mergeable cut-piece partials (CutKernel
        # protocol, segments.py): a clean piece ships ONE fixed-size
        # __cutpart__ row; an anomalous-in-isolation piece ships its
        # (turn, ts) pairs as one compact __rawpiece__ IPC cell
        if not self.assume_complete:
            for g in np.unique([0, g_count - 1]):
                s, e = int(starts[g]), int(ends[g])
                piece_clean = True
                if e - s > 1:
                    piece_clean = bool(np.all(np.diff(turn[s:e]) == 1))
                    if piece_clean and has_ts:
                        piece_clean = bool(np.all(np.diff(ts[s:e]) >= 0))
                out_tables.append(self._encode_piece(
                    batch, s, e, turn, ts if has_ts else None, piece_clean,
                    int(n_bad_role[g]), int(n_bad_tool[g])))

        return pa.concat_tables(out_tables) if out_tables else _empty_violations()

    def _encode_piece(self, batch: pa.Table, s: int, e: int,
                      turn: np.ndarray, ts: np.ndarray | None,
                      clean: bool, nbr: int, nbt: int) -> pa.Table:
        conv_id = batch.column("conv_id")[s].as_py()
        part = (batch.column("part")[s].as_py()
                if "part" in batch.column_names else None)
        if clean:
            tsf = str(int(ts[s])) if ts is not None else ""
            tsl = str(int(ts[e - 1])) if ts is not None else ""
            detail = (f"{e - s}|{int(turn[s])}|{int(turn[e - 1])}|"
                      f"{tsf}|{tsl}|{nbr}|{nbt}")
            kind, col, val = "__cutpart__", None, None
        else:
            import base64
            from .segments import _ipc_bytes
            cols = {"turn": pa.array(turn[s:e].astype(np.int64))}
            if ts is not None:
                cols["ts"] = pa.array(ts[s:e])
            detail = base64.b64encode(_ipc_bytes(pa.table(cols))).decode()
            kind, col, val = "__rawpiece__", str(nbr), str(nbt)
        return pa.table({
            "kind": pa.array([kind], pa.string()),
            "conv_id": pa.array([conv_id], pa.string()),
            "turn_idx": pa.array([int(turn[s])], pa.int32()),
            "column": pa.array([col], pa.string()),
            "value": pa.array([val], pa.string()),
            "detail": pa.array([detail], pa.string()),
            "part": pa.array([part], pa.string()),
        }, schema=VIOLATION_SCHEMA)


_META_KINDS = ("__cutpart__", "__rawpiece__")


def _decode_piece(row: dict) -> dict:
    """One cut piece from its carried partial row (merge-side inverse of
    ``_BlockChecker._encode_piece``)."""
    if row["kind"] == "__cutpart__":
        n, first, last, tsf, tsl, nbr, nbt = row["detail"].split("|")
        first, last = int(first), int(last)
        return {
            "n": int(n), "first": first, "last": last,
            "ts_first": int(tsf) if tsf else None,
            "ts_last": int(tsl) if tsl else None,
            "nbr": int(nbr), "nbt": int(nbt), "n_dup_int": 0,
            "intervals": [(first, last)], "dup_vals": [], "ts_regs": [],
            "uniq": None, "counts": None, "part": row["part"],
        }
    import base64
    from .segments import _ipc_table
    tbl = _ipc_table(base64.b64decode(row["detail"]))
    t = tbl.column("turn").to_numpy(zero_copy_only=False)
    order = np.argsort(t, kind="stable")
    t = t[order]
    uniq, counts = np.unique(t, return_counts=True)
    brk = np.flatnonzero(np.diff(uniq) > 1)
    iv_s = np.r_[0, brk + 1]
    iv_e = np.r_[brk, uniq.size - 1]
    piece = {
        "n": int(t.size), "first": int(t[0]), "last": int(t[-1]),
        "ts_first": None, "ts_last": None,
        "nbr": int(row["column"] or 0), "nbt": int(row["value"] or 0),
        "n_dup_int": int(t.size - uniq.size),
        "intervals": [(int(uniq[a]), int(uniq[b]))
                      for a, b in zip(iv_s, iv_e)],
        "dup_vals": [int(v) for v in uniq[counts > 1]],
        "ts_regs": [], "uniq": uniq, "counts": counts, "part": row["part"],
    }
    if "ts" in tbl.column_names:
        ts = tbl.column("ts").to_numpy(zero_copy_only=False)[order]
        piece["ts_first"], piece["ts_last"] = int(ts[0]), int(ts[-1])
        d = np.diff(ts)
        piece["ts_regs"] = [(int(t[i + 1]), int(-d[i]))
                            for i in np.flatnonzero(d < 0)]
    return piece


def _merge_cut_pieces(cfg: ConstraintConfig, conv_id: str,
                      pieces: list[dict]) -> pa.Table:
    """Driver-side associative merge of a cut conversation's pieces —
    exact violation rows + verdict from o(#pieces) state (interval
    arithmetic over dense ranges; raw arrays only for anomalous pieces).
    Mirrors ``_check_conversation`` semantics row for row."""
    cap = cfg.max_violations_per_kind
    pieces.sort(key=lambda p: (p["first"], p["last"]))
    part = pieces[0]["part"]
    n_total = sum(p["n"] for p in pieces)
    n_dup = sum(p["n_dup_int"] for p in pieces)
    n_bad_role = sum(p["nbr"] for p in pieces)
    n_bad_tool = sum(p["nbt"] for p in pieces)

    dup_cand: set[int] = set()
    for p in pieces:
        dup_cand.update(p["dup_vals"])
    for a, b in zip(pieces, pieces[1:]):
        if a["last"] == b["first"]:
            n_dup += 1
            dup_cand.add(a["last"])

    def occ(v: int) -> int:
        c = 0
        for p in pieces:
            if v < p["first"] or v > p["last"]:
                continue
            if p["uniq"] is None:
                c += 1  # clean piece: dense, each value exactly once
            else:
                i = int(np.searchsorted(p["uniq"], v))
                if i < p["uniq"].size and p["uniq"][i] == v:
                    c += int(p["counts"][i])
        return c

    v_kind: list[str] = []
    v_turn: list[int] = []
    v_detail: list[str] = []
    for v in sorted(dup_cand)[:cap]:
        v_kind.append("duplicate_key")
        v_turn.append(v)
        v_detail.append(f"count={occ(v)}")

    # merged distinct-value set as disjoint closed intervals (pieces are
    # value-ordered by the global sort, so ranges touch at most at a
    # single boundary value)
    ivs: list[list[int]] = []
    for p in pieces:
        for lo, hi in p["intervals"]:
            if ivs and lo <= ivs[-1][1] + 1:
                ivs[-1][1] = max(ivs[-1][1], hi)
            else:
                ivs.append([lo, hi])
    D = sum(hi - lo + 1 for lo, hi in ivs)

    n_gap = 0
    if cfg.require_contiguous_turns and D and ivs != [[0, D - 1]]:
        in_range = 0
        missing: list[int] = []
        cur = 0
        for lo, hi in ivs:
            lo_c, hi_c = max(lo, 0), min(hi, D - 1)
            if lo_c > hi_c:
                continue
            if lo_c > cur and len(missing) < cap:
                missing.extend(range(cur, min(lo_c, cur + cap - len(missing))))
            in_range += hi_c - lo_c + 1
            cur = max(cur, hi_c + 1)
        if cur < D and len(missing) < cap:
            missing.extend(range(cur, min(D, cur + cap - len(missing))))
        extra: list[int] = []
        for lo, hi in ivs:  # values below 0, ascending
            if lo < 0 and len(extra) < cap:
                extra.extend(range(lo, min(hi, -1, lo + cap - len(extra) - 1)
                                   + 1))
        for lo, hi in ivs:  # values beyond D-1, ascending
            if hi > D - 1 and len(extra) < cap:
                a = max(lo, D)
                extra.extend(range(a, min(hi, a + cap - len(extra) - 1) + 1))
        n_missing = D - in_range
        n_extra = D - in_range
        n_gap = n_missing + n_extra
        for t in missing:
            v_kind.append("turn_gap")
            v_turn.append(t)
            v_detail.append("missing turn index")
        for t in extra:
            v_kind.append("turn_gap")
            v_turn.append(t)
            v_detail.append("out-of-range turn index")

    n_ts = 0
    ts_rows: list[tuple[int, int]] = []
    prev = None
    for p in pieces:
        if (prev is not None and prev["ts_last"] is not None
                and p["ts_first"] is not None
                and p["ts_first"] < prev["ts_last"]):
            n_ts += 1
            ts_rows.append((p["first"], prev["ts_last"] - p["ts_first"]))
        n_ts += len(p["ts_regs"])
        ts_rows.extend(p["ts_regs"])
        prev = p
    for t, delta in ts_rows[:cap]:
        v_kind.append("ts_regression")
        v_turn.append(t)
        v_detail.append(f"ts decreased by {delta}us")

    passed = not (n_dup or n_gap or n_ts or n_bad_role or n_bad_tool)
    k = len(v_kind)
    return pa.table({
        "kind": pa.array(v_kind + ["__verdict__"], pa.string()),
        "conv_id": pa.array([conv_id] * (k + 1), pa.string()),
        "turn_idx": pa.array(v_turn + [n_total], pa.int32()),
        "column": pa.array([None] * (k + 1), pa.string()),
        "value": pa.array([None] * (k + 1), pa.string()),
        "detail": pa.array(
            v_detail
            + [f"{n_dup}|{n_gap}|{n_ts}|{n_bad_role}|{n_bad_tool}|"
               f"{int(passed)}"],
            pa.string()),
        "part": pa.array([part] * (k + 1), pa.string()),
    }, schema=VIOLATION_SCHEMA)


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
                              emit_row_violations: bool = False,
                              stats: dict | None = None
                              ) -> tuple["ray.data.Dataset", pa.Table]:
    """Internal split form of ``conversation_checks``: returns
    ``(checked, fixed)`` where ``checked`` is the materialized block-check
    stream STILL containing ``__cutpart__``/``__rawpiece__`` partial rows
    (consumers filter them inline — avoids an extra full pass over the
    stream) and ``fixed`` is the driver-computed CutKernel merge of the
    o(#blocks) cut-piece partials (violations + verdict rows,
    VIOLATION_SCHEMA). ``stats`` (optional) receives ``carry_bytes`` /
    ``carry_rows`` / ``n_blocks`` for tests asserting the o(#blocks)
    carry bound.
    """
    cols = [cfg.group_column, cfg.order_column]
    names = ds.schema().names
    for c in (cfg.ts_column, cfg.role_column, cfg.tool_column, "part"):
        if c in names:
            cols.append(c)
    narrow = ds.select_columns(cols)

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
    # ≤2 cut-piece PARTIAL rows per block (fixed-size `__cutpart__`, plus
    # compact `__rawpiece__` (turn, ts) cells for the rare
    # anomalous-in-isolation pieces) are pulled to the driver and merged
    # associatively per conversation — o(#blocks) driver bytes even when
    # one whale conversation spans every block (VERDICT r4 item 1).
    meta_tbls = [
        t.cast(VIOLATION_SCHEMA) for t in checked.map_batches(
            lambda b: b.filter(pc.is_in(b.column("kind"),
                                        value_set=pa.array(_META_KINDS))),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    meta = (pa.concat_tables(meta_tbls) if meta_tbls
            else _empty_violations())
    if stats is not None:
        stats["carry_rows"] = meta.num_rows
        stats["carry_bytes"] = sum(
            len(d) for d in meta.column("detail").to_pylist() if d)
        stats["n_blocks"] = checked.num_blocks()

    fixed: list[pa.Table] = []
    if meta.num_rows:
        by_conv: dict[str, list[dict]] = {}
        for row in meta.to_pylist():
            by_conv.setdefault(row["conv_id"], []).append(_decode_piece(row))
        for conv_id in sorted(by_conv):
            fixed.append(_merge_cut_pieces(cfg, conv_id, by_conv[conv_id]))
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
        lambda b: b.filter(pc.invert(pc.is_in(
            b.column("kind"), value_set=pa.array(_META_KINDS))))
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
