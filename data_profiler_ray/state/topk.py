"""Mergeable value-frequency counter: exact while small, Misra-Gries beyond.

Serves the reference's value-counts family (SURVEY.md §2.5 A1/A7/A8/A10):
``series.value_counts(dropna=False)`` at
``/root/reference/stelardataprofiler/tabular_timeseries/variables/utils.py:115-154``,
top-K + "Other Values (n)" reduction at ``utils.py:497-504`` and
``variables/numeric.py:88-94``, and the uniqueness fields n_unique/p_unique
(count-of-count-1) at ``utils.py:179-186``.

Per Ray Data block we fold an **exact** Arrow ``value_counts`` into this
state; states merge associatively. While total cardinality stays under
``cap`` the counter is exact (test-data parity, exact n_unique). Past the
cap it decays to Misra-Gries heavy-hitters (top-K still correct for any
value with frequency > n/cap; n_unique flagged approximate).
"""

from __future__ import annotations

from collections import Counter


class TopKCounter:
    __slots__ = ("cap", "counts", "overflowed", "total", "decremented")

    def __init__(self, cap: int = 262_144):
        self.cap = cap
        self.counts: Counter = Counter()
        self.overflowed = False
        self.total = 0          # total observations folded in (non-null)
        self.decremented = 0    # total weight removed by MG decrements

    def update_counts(self, values, counts) -> None:
        """Fold a (unique values, counts) pair-list in.

        Callers pass ``value_counts`` output, so keys are unique within a
        call — the fold is a C-level ``dict(zip(...))`` build (empty
        counter, the common one-fold-per-block case) or a ``Counter.update``
        mapping merge, not a per-item Python loop.
        """
        import numpy as _np
        cl = (counts.tolist() if isinstance(counts, _np.ndarray)
              else [int(c) for c in counts])
        d = dict(zip(values, cl))
        if len(d) != len(cl):
            # duplicate keys within one call (contract says unique, but a
            # silent last-wins would desync total from the counts sum —
            # ADVICE r3): accumulate exactly instead
            d = {}
            for v, c in zip(values, cl):
                d[v] = d.get(v, 0) + c
        self.total += sum(cl)
        if self.counts:
            self.counts.update(d)
        else:
            self.counts = Counter(d)
        self._shrink()

    def add_skipped(self, weight: int) -> None:
        """Account weight folded PAST the counter (post-overflow batch
        singletons): they join ``total`` and ``decremented`` so the
        ``freq_distribution`` Other bucket stays exact, without ever
        building their Python keys.

        Sound because a batch singleton cannot survive the post-overflow
        regime anyway: each wide batch brings >> cap-slack new keys, so the
        very next ``_shrink`` decrement (≥1) erases every count-1 entry.
        Skipping it up front is the same outcome minus the key build; the
        Misra-Gries invariant (stored ≤ true, true − stored ≤ total
        decrement) is preserved — survivors simply keep the decrement the
        skipped singletons would have cost them, i.e. tighter counts. Only
        a counter oscillating just above cap on a trickle of new keys would
        have (transiently) kept such singletons before; post-overflow
        count-1 state is approximate by contract either way."""
        self.total += int(weight)
        self.decremented += int(weight)

    def merge(self, other: "TopKCounter") -> None:
        self.counts.update(other.counts)
        self.total += other.total
        self.decremented += other.decremented
        self.overflowed |= other.overflowed
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counts) <= self.cap:
            return
        self.overflowed = True
        # Misra-Gries: subtract the (len-cap)-th largest count from everyone,
        # drop non-positive — keeps any value with true freq > decrement bound.
        excess = len(self.counts) - self.cap
        vals = sorted(self.counts.values())
        dec = vals[excess - 1] if excess <= len(vals) else vals[-1]
        new = Counter()
        removed = 0
        for k, c in self.counts.items():
            if c > dec:
                new[k] = c - dec
                removed += dec
            else:
                removed += c
        self.decremented += removed
        self.counts = new

    # ---- queries ----

    def n_distinct(self) -> int:
        return len(self.counts)

    def n_unique(self) -> int:
        """Count of values appearing exactly once (exact only if not overflowed)."""
        return sum(1 for c in self.counts.values() if c == 1)

    def top_k(self, k: int) -> list[tuple[object, int]]:
        return self.counts.most_common(k)

    def freq_distribution(self, k: int) -> dict:
        """Reference ``reduceCategoricalDict`` (utils.py:497-504): top-k plus
        an ``Other Values (n)`` bucket holding the remainder."""
        top = self.top_k(k)
        out = {str(v): int(c) for v, c in top}
        rest = len(self.counts) - len(top)
        if rest > 0:
            out[f"Other Values ({rest})"] = self.total - self.decremented - sum(c for _, c in top)
        return out

    def extremes(self, n: int = 5) -> tuple[list, list]:
        """First/last n values by natural order (numeric.py:96-103)."""
        try:
            keys = sorted(self.counts.keys())
        except TypeError:
            keys = sorted(self.counts.keys(), key=str)
        first = [(v, self.counts[v]) for v in keys[:n]]
        last = [(v, self.counts[v]) for v in keys[-n:]]
        return first, last
