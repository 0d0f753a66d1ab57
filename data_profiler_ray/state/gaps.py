"""Mergeable NaN-run (gap) accumulator for timeseries columns (A14).

Reference semantics (``/root/reference/stelardataprofiler/tabular_timeseries/
profiler.py:459-533`` and ``variables/timeseries.py:29-103``): per column,
the run-lengths of consecutive-NaN stretches in chronological order, rolled
up into a gap-size frequency Counter plus min/max/avg gap.

Distributed form: each ORDERED block contributes
``(prefix_run, suffix_run, inner run Counter, all_missing?)``; merging two
adjacent fragments joins ``left.suffix_run + right.prefix_run`` into an
inner run (the run crossing the block boundary). Merging is associative as
long as fragments are concatenated in order — use over a range-partitioned
sort or per-file ordered blocks.
"""

from __future__ import annotations

from collections import Counter

import numpy as np


class GapState:
    """Gap runs of one column over one ordered fragment."""

    __slots__ = ("prefix", "suffix", "runs", "all_missing", "n")

    def __init__(self):
        self.prefix = 0          # leading missing run length
        self.suffix = 0          # trailing missing run length
        self.runs: Counter = Counter()   # interior run length -> count
        self.all_missing = True  # fragment is entirely missing
        self.n = 0

    def update(self, missing_mask: np.ndarray) -> None:
        """Fold one ordered fragment's missing-mask (bool array)."""
        m = np.asarray(missing_mask, dtype=bool)
        frag = GapState()
        frag.n = int(m.size)
        if m.size == 0:
            frag.all_missing = True
            self.merge(frag)
            return
        if m.all():
            frag.prefix = frag.suffix = int(m.size)
            frag.all_missing = True
            self.merge(frag)
            return
        frag.all_missing = False
        padded = np.concatenate([[False], m, [False]])
        starts = np.flatnonzero(padded[1:-1] & ~padded[:-2])
        ends = np.flatnonzero(padded[1:-1] & ~padded[2:])
        lens = ends - starts + 1
        if lens.size:
            if m[0]:
                frag.prefix = int(lens[0])
                starts, lens = starts[1:], lens[1:]
            if m[-1] and lens.size:
                frag.suffix = int(lens[-1])
                lens = lens[:-1]
            frag.runs.update(lens.tolist())
        self.merge(frag)

    def merge(self, right: "GapState") -> None:
        """Append ``right`` (the next fragment in order) to this state."""
        if right.n == 0:
            return
        if self.n == 0:
            self.prefix, self.suffix = right.prefix, right.suffix
            self.runs = Counter(right.runs)
            self.all_missing = right.all_missing
            self.n = right.n
            return
        if self.all_missing and right.all_missing:
            self.prefix = self.suffix = self.n + right.n
        elif self.all_missing:
            joined = self.n + right.prefix
            self.prefix = joined
            self.runs = Counter(right.runs)
            self.suffix = right.suffix
            if right.prefix == right.n:  # defensive; right not all_missing
                pass
        elif right.all_missing:
            self.suffix = self.suffix + right.n
        else:
            boundary = self.suffix + right.prefix
            if boundary:
                self.runs[boundary] += 1
            self.runs.update(right.runs)
            self.suffix = right.suffix
        self.all_missing = self.all_missing and right.all_missing
        self.n += right.n

    def result(self) -> dict:
        """Gap stats dict (profiler.py:496-533 shape)."""
        runs = Counter(self.runs)
        if self.all_missing and self.n:
            runs[self.n] += 1
        else:
            if self.prefix:
                runs[self.prefix] += 1
            if self.suffix:
                runs[self.suffix] += 1
        total = sum(runs.values())
        if not total:
            return {"n_gaps": 0, "min_gap": None, "max_gap": None,
                    "avg_gap": None, "gap_sizes": {}}
        sizes = sorted(runs)
        weighted = sum(k * c for k, c in runs.items())
        return {
            "n_gaps": total,
            "min_gap": sizes[0],
            "max_gap": sizes[-1],
            "avg_gap": weighted / total,
            "gap_sizes": {int(k): int(runs[k]) for k in sizes},
        }
