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
        cfg = self.cfg
        out: list[pa.Table] = []
        conv = batch.column("conv_id")
        turn = batch.column("turn_idx")
        part = (batch.column("part") if "part" in batch.column_names
                else pa.nulls(len(batch), pa.string()))

        role = batch.column(cfg.role_column)
        bad_role = pc.and_(pc.is_valid(role),
                           pc.invert(pc.is_in(role, value_set=self.role_set)))
        out.append(self._emit("bad_role", cfg.role_column, batch, bad_role,
                              role, conv, turn, part))

        if self.tool_set is not None:
            tool = batch.column(cfg.tool_column)
            bad_tool = pc.and_(pc.is_valid(tool),
                               pc.invert(pc.is_in(tool, value_set=self.tool_set)))
            out.append(self._emit("dangling_tool", cfg.tool_column, batch,
                                  bad_tool, tool, conv, turn, part))
        tbl = pa.concat_tables([t for t in out if t.num_rows] or [_empty_violations()])
        return tbl

    @staticmethod
    def _emit(kind: str, column: str, batch: pa.Table, mask, values,
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


def conversation_checks(ds: "ray.data.Dataset",
                        cfg: ConstraintConfig) -> "ray.data.Dataset":
    """Hash-shuffle on conv_id (narrow projection, no text) → per-group checks.

    Returns a Dataset of VIOLATION_SCHEMA rows, including one
    ``__verdict__`` row per conversation carrying the tally in ``detail``.
    """
    cols = [cfg.group_column, cfg.order_column]
    names = ds.schema().names
    for c in (cfg.ts_column, cfg.role_column, cfg.tool_column, "part"):
        if c in names:
            cols.append(c)
    narrow = ds.select_columns(cols)
    role_set = set(cfg.role_domain)
    tool_set = set(cfg.tool_registry) if cfg.tool_registry else None
    return narrow.groupby(cfg.group_column).map_groups(
        lambda g: _check_conversation(g, cfg, role_set, tool_set),
        batch_format="pyarrow")


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
