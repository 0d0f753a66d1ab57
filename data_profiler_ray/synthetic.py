"""Deterministic synthetic conversation-transcript table (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string (nullable), ts: timestamp[us]

Properties: Zipf-skewed turn counts with a guaranteed hot conversation,
contiguous turn_idx, non-decreasing ts within each conversation, role domain
{user, assistant, system, tool}, tool values from a small registry on
role=="tool" turns. Violation-injection knobs (seeded fractions, default 0):
duplicate keys, turn gaps/swaps, out-of-domain roles, ts regressions, dangling
tools. All generation is seeded — same arguments, same bytes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLE_DOMAIN = ("user", "assistant", "system", "tool")
TOOL_REGISTRY = ("search", "calculator", "python", "browser", "retrieval",
                 "sql", "editor", "shell")

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog data profile ray arrow stream "
    "batch shuffle cluster node actor task block parquet schema column row "
    "check validate drift sketch merge count mean token model agent tool "
    "message turn conversation user assistant system please thanks error "
    "retry timeout result answer question context window memory".split())


def generate_transcripts(
    n_turns: int,
    seed: int = 42,
    avg_turns_per_conv: int = 20,
    dup_frac: float = 0.0,
    gap_frac: float = 0.0,
    bad_role_frac: float = 0.0,
    ts_regression_frac: float = 0.0,
    dangling_tool_frac: float = 0.0,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_conv = max(1, n_turns // avg_turns_per_conv)
    # Zipf-skewed turn counts; conversation 0 is the hot one (>=100x median)
    raw = rng.zipf(1.5, size=n_conv).astype(np.int64)
    raw = np.clip(raw, 2, 500)
    median = max(int(np.median(raw)), 2)
    raw[0] = min(max(100 * median, raw.max()), max(n_turns // 2, 200))
    # trim/pad to exactly n_turns
    cum = np.cumsum(raw)
    cut = int(np.searchsorted(cum, n_turns))
    raw = raw[: cut + 1]
    total = int(raw.sum())
    if total > n_turns:
        raw[-1] -= total - n_turns
        if raw[-1] <= 0:
            raw = raw[:-1]
    n_conv = len(raw)

    conv_ids = np.array([f"conv-{seed}-{i:08d}" for i in range(n_conv)])
    conv_col = np.repeat(conv_ids, raw)
    turn_idx = np.concatenate([np.arange(c, dtype=np.int32) for c in raw])
    n = conv_col.shape[0]

    # roles: deterministic user/assistant alternation + sprinkled system/tool
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    r = rng.random(n)
    role[(turn_idx == 0) & (r < 0.3)] = "system"
    tool_turns = (r > 0.85) & (turn_idx % 2 == 1)
    role[tool_turns] = "tool"

    # tool column: registry values on tool turns, null elsewhere
    tool = np.full(n, None, dtype=object)
    tool[tool_turns] = rng.choice(np.array(TOOL_REGISTRY), size=int(tool_turns.sum()))

    # text: 1..60 words drawn from vocab; some empty, some digit/unicode-heavy
    lens = rng.integers(1, 60, size=n)
    word_pick = rng.integers(0, len(_WORDS), size=int(lens.sum()))
    offsets = np.concatenate([[0], np.cumsum(lens)])
    picked = _WORDS[word_pick]
    text = np.array([" ".join(picked[offsets[i]:offsets[i + 1]]) for i in range(n)],
                    dtype=object)
    text[rng.random(n) < 0.01] = ""
    digit_mask = rng.random(n) < 0.02
    text[digit_mask] = [f"result={v:.6f} code {c}" for v, c in
                        zip(rng.random(int(digit_mask.sum())) * 1e6,
                            rng.integers(0, 999, int(digit_mask.sum())))]
    uni_mask = rng.random(n) < 0.01
    text[uni_mask] = "héllo wörld — ünïcode ✓ 测试 " + text[uni_mask]

    # ts: per-conversation start + cumulative positive gaps (non-decreasing)
    base = np.datetime64("2025-01-01T00:00:00", "us")
    conv_start = rng.integers(0, 90 * 24 * 3600, size=n_conv) * 1_000_000
    gaps = rng.integers(1, 120, size=n) * 1_000_000  # 1..120 s between turns
    ts = np.empty(n, dtype=np.int64)
    pos = 0
    for ci in range(n_conv):
        c = int(raw[ci])
        ts[pos:pos + c] = conv_start[ci] + np.cumsum(gaps[pos:pos + c])
        pos += c
    ts_arr = base + ts.astype("timedelta64[us]")

    # ---- violation injection (seeded) ----
    vrng = np.random.default_rng(seed + 1)
    if bad_role_frac > 0:
        m = vrng.random(n) < bad_role_frac
        role[m] = "moderator"
    if dangling_tool_frac > 0:
        m = (vrng.random(n) < dangling_tool_frac) & tool_turns
        tool[m] = "unregistered_tool"
    if gap_frac > 0:
        m = vrng.random(n) < gap_frac
        turn_idx = turn_idx.copy()
        turn_idx[m] = turn_idx[m] + 1000  # creates a gap (and keeps uniqueness)
    if ts_regression_frac > 0:
        m = vrng.random(n) < ts_regression_frac
        ts_arr = ts_arr.copy()
        ts_arr[m] = ts_arr[m] - np.timedelta64(3600_000_000, "us")

    tbl = pa.table({
        "conv_id": pa.array(conv_col, type=pa.string()),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": pa.array(text, type=pa.string()),
        "tool": pa.array(tool, type=pa.string()),
        "ts": pa.array(ts_arr, type=pa.timestamp("us")),
    })
    if dup_frac > 0:
        k = max(1, int(n * dup_frac))
        idx = vrng.choice(n, size=k, replace=False)
        tbl = pa.concat_tables([tbl, tbl.take(np.sort(idx))])
    return tbl


def write_transcripts(out_dir: str, n_turns: int, seed: int = 42,
                      num_shards: int = 8, **knobs) -> list[str]:
    """Write partitioned Parquet shards (resumable-unit layout)."""
    os.makedirs(out_dir, exist_ok=True)
    tbl = generate_transcripts(n_turns, seed=seed, **knobs)
    n = tbl.num_rows
    paths = []
    per = (n + num_shards - 1) // num_shards
    for s in range(num_shards):
        chunk = tbl.slice(s * per, per)
        if chunk.num_rows == 0:
            break
        p = os.path.join(out_dir, f"part-{s:05d}.parquet")
        pq.write_table(chunk, p)
        paths.append(p)
    return paths


def transcripts_dir(n_turns: int, seed: int = 42,
                    root: str = "/tmp/dpr_transcripts", **knobs) -> str:
    """Deterministic dataset dir for the given parameters (path only — no
    generation; the oracle SQL embeds this path before the data may exist)."""
    key = f"n{n_turns}_s{seed}" + "".join(
        f"_{k}{v}" for k, v in sorted(knobs.items()) if v)
    return os.path.join(root, key)


def transcripts_path(n_turns: int, seed: int = 42, root: str = "/tmp/dpr_transcripts",
                     **knobs) -> str:
    """Cached deterministic dataset dir keyed by parameters."""
    out = transcripts_dir(n_turns, seed=seed, root=root, **knobs)
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        write_transcripts(out, n_turns, seed=seed, **knobs)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def synth_documents(n_docs: int, seed: int = 42, avg_words: int = 60,
                    dup_frac: float = 0.02) -> "pa.Table":
    """Deterministic synthetic document corpus with planted near-duplicates
    (for dedup benchmarks at scales the driver tables don't reach)."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(avg_words // 2, avg_words * 2, size=n_docs)
    picks = rng.integers(0, len(_WORDS), size=int(lens.sum()))
    offs = np.concatenate([[0], np.cumsum(lens)])
    words = _WORDS[picks]
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    k = int(n_docs * dup_frac)
    if k:
        src = rng.choice(n_docs, size=k, replace=False)
        for j, i in enumerate(src):
            t = texts[int(i)].split()
            if len(t) > 2:
                t[-1] = "altered"
            texts.append(" ".join(t))
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def documents_path(n_docs: int, seed: int = 42,
                   root: str = "/tmp/dpr_docs", **knobs) -> str:
    key = f"n{n_docs}_s{seed}" + "".join(
        f"_{k}{v}" for k, v in sorted(knobs.items()) if v)
    out = os.path.join(root, key)
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        tbl = synth_documents(n_docs, seed=seed, **knobs)
        per = max((tbl.num_rows + 15) // 16, 1)
        for s_ in range(16):
            chunk = tbl.slice(s_ * per, per)
            if chunk.num_rows == 0:
                break
            pq.write_table(chunk, os.path.join(out, f"docs-{s_:05d}.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return out


def synth_embeddings(n_vecs: int, dim: int = 64, seed: int = 42,
                     dup_frac: float = 0.01,
                     noise: float = 0.05) -> "pa.Table":
    """Deterministic synthetic embedding corpus with planted near-duplicates
    (cosine ≈ 1 − noise²/2) for vector-dedup benchmarks at scales the
    driver `embeddings` table (500-2000 rows) doesn't reach."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    k = int(n_vecs * dup_frac)
    if k:
        src = rng.choice(n_vecs, size=k, replace=False)
        dups = (base[src]
                + (noise * rng.standard_normal((k, dim))).astype(np.float32))
        base = np.concatenate([base, dups])
    n = base.shape[0]
    flat = pa.array(base.ravel(), pa.float32())
    offs = pa.array(np.arange(n + 1, dtype=np.int32) * dim, pa.int32())
    emb = pa.ListArray.from_arrays(offs, flat)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": emb,
    })


def embeddings_path(n_vecs: int, seed: int = 42,
                    root: str = "/tmp/dpr_embs", **knobs) -> str:
    key = f"n{n_vecs}_s{seed}" + "".join(
        f"_{k}{v}" for k, v in sorted(knobs.items()) if v)
    out = os.path.join(root, key)
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        tbl = synth_embeddings(n_vecs, seed=seed, **knobs)
        per = max((tbl.num_rows + 15) // 16, 1)
        for s_ in range(16):
            chunk = tbl.slice(s_ * per, per)
            if chunk.num_rows == 0:
                break
            pq.write_table(chunk, os.path.join(out, f"embs-{s_:05d}.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return out
