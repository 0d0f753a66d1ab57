"""Training-data ops: dedup / similarity / text analysis / multimodal."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from data_profiler_ray.functions.dedup import (
    embedding_dup_pairs, exact_dedup, minhash_candidates, minhash_dedup,
    simhash_candidates, survivors_from_pairs, verify_jaccard)
from data_profiler_ray.functions.similarity import knn_brute_force, knn_ivf
from data_profiler_ray.functions.text import (
    fingerprint_batch, language_id_batch, quality_score_batch,
    token_count_batch)
from data_profiler_ray.stages.multimodal import (
    FrameSampler, extract_media_features, synthesize_media)


@pytest.fixture(scope="module")
def docs_with_dups():
    """Deterministic docs: 20 unique + near-dup and exact-dup variants."""
    rng = np.random.default_rng(5)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    base = [" ".join(rng.choice(vocab, size=40)) for _ in range(20)]
    texts, expect_dup_of = [], {}
    for i, t in enumerate(base):
        texts.append(t)
    # exact duplicates of docs 0,1
    texts.append(base[0]); expect_dup_of[20] = 0
    texts.append(base[1]); expect_dup_of[21] = 1
    # near-duplicate of doc 2: change last 2 words
    words = base[2].split(); words[-1] = "omega"; words[-2] = "sigma"
    texts.append(" ".join(words)); expect_dup_of[22] = 2
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    return tbl, expect_dup_of


def test_minhash_dedup_finds_planted_dups(docs_with_dups):
    tbl, expect = docs_with_dups
    ds = ray.data.from_arrow(tbl)
    keep = pa.concat_tables(list(
        minhash_dedup(ds, threshold=0.5).iter_batches(
            batch_format="pyarrow")))["doc_id"].to_pylist()
    for dup, orig in expect.items():
        assert dup not in keep, f"doc {dup} (dup of {orig}) should be dropped"
        assert orig in keep
    # all non-dup docs survive
    assert set(keep) == set(range(20))


def test_minhash_exact_dup_jaccard_one(docs_with_dups):
    tbl, _ = docs_with_dups
    ds = ray.data.from_arrow(tbl)
    cand = pa.concat_tables(list(
        minhash_candidates(ds).iter_batches(batch_format="pyarrow")))
    verified = verify_jaccard(ds, cand.select(["id_a", "id_b"]),
                              threshold=0.0)
    vdf = verified.to_pandas().set_index(["id_a", "id_b"])
    assert vdf.loc[(0, 20), "jaccard"] == 1.0
    assert vdf.loc[(1, 21), "jaccard"] == 1.0
    assert vdf.loc[(2, 22), "jaccard"] > 0.8


def test_jaccard_dup_pairs_exact(docs_with_dups):
    """Exact inverted-index Jaccard vs python-set ground truth on the
    planted fixture, plus the max_rows guard."""
    from data_profiler_ray.functions.dedup import jaccard_dup_pairs
    tbl, _ = docs_with_dups
    ds = ray.data.from_arrow(tbl)
    out = jaccard_dup_pairs(ds, threshold=0.5, k=3)
    got = {(a, b): j for a, b, j in zip(out["a"].to_pylist(),
                                        out["b"].to_pylist(),
                                        out["jaccard"].to_pylist())}
    # python-set oracle over every pair
    texts = tbl["text"].to_pylist()
    shset = [{tuple(t.lower().split()[i:i + 3])
              for i in range(len(t.split()) - 2)} for t in texts]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(shset[i] & shset[j])
            if inter:
                jac = inter / (len(shset[i]) + len(shset[j]) - inter)
                if jac >= 0.5:
                    want[(i, j)] = jac
    assert got.keys() == want.keys()
    for k_ in got:
        assert abs(got[k_] - want[k_]) < 1e-12
    assert got[(0, 20)] == 1.0 and got[(1, 21)] == 1.0
    with pytest.raises(ValueError, match="minhash_dedup"):
        jaccard_dup_pairs(ds, max_rows=5)


def test_simhash_candidates(docs_with_dups):
    tbl, expect = docs_with_dups
    ds = ray.data.from_arrow(tbl)
    cand = pa.concat_tables(list(
        simhash_candidates(ds).iter_batches(batch_format="pyarrow")))
    pairs = set(map(tuple, cand.to_pandas()[["id_a", "id_b"]].values))
    assert (0, 20) in pairs
    assert (1, 21) in pairs


def test_exact_dedup():
    tbl = pa.table({"doc_id": pa.array([3, 1, 2, 5, 4], pa.int64()),
                    "text": pa.array(["a", "b", "a", "b", "c"])})
    ds = ray.data.from_arrow(tbl)
    out = pa.concat_tables(list(
        exact_dedup(ds, ["text"], "doc_id").iter_batches(
            batch_format="pyarrow")))
    kept = sorted(out["doc_id"].to_pylist())
    assert kept == [1, 2, 4]  # min id per text group


def test_survivors_union_find():
    pairs = pa.table({"id_a": pa.array([1, 2, 7], pa.int64()),
                      "id_b": pa.array([2, 3, 8], pa.int64())})
    keep = survivors_from_pairs(np.arange(10), pairs)
    assert keep.tolist() == [0, 1, 4, 5, 6, 7, 9]


def test_embedding_dup_pairs():
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((50, 64))
    vecs[40] = vecs[0] + rng.standard_normal(64) * 0.01  # near-dup of 0
    vecs[41] = vecs[1]                                   # exact dup of 1
    tbl = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                    "embedding": pa.array([v.astype(np.float32).tolist()
                                           for v in vecs],
                                          pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)
    pairs = pa.concat_tables(list(
        embedding_dup_pairs(ds, threshold=0.95, n_bits=6)
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 40) in got
    assert (1, 41) in got
    assert len(got) <= 4  # no spurious explosion


def test_embedding_lsh_recall_planted():
    """Multi-table LSH finds ≥90% of planted near-dup pairs that exact
    all-pairs finds at the same threshold (500 vecs, 40 planted)."""
    from data_profiler_ray.functions.dedup import embedding_all_pairs_exact
    rng = np.random.default_rng(7)
    base = rng.standard_normal((500, 64))
    ids = list(range(500))
    vecs = list(base)
    for j in range(40):  # planted near-dups of vectors 0..39
        vecs.append(base[j] + rng.standard_normal(64) * 0.05)
        ids.append(500 + j)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([v.astype(np.float32).tolist()
                                           for v in vecs],
                                          pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)
    exact = embedding_all_pairs_exact(ds, threshold=0.95).to_pandas()
    expect = set(map(tuple, exact[["id_a", "id_b"]].values))
    assert len(expect) >= 35  # the planted pairs are above threshold
    approx = pa.concat_tables(list(
        embedding_dup_pairs(ray.data.from_arrow(tbl), threshold=0.95,
                            n_bits=8, n_tables=8)
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    got = set(map(tuple, approx[["id_a", "id_b"]].values))
    assert got <= expect or all(p in expect for p in got)  # no false pairs
    assert len(got & expect) / len(expect) >= 0.9


@pytest.mark.parametrize("driver_doc_limit", [20_000, 0])
def test_verify_jaccard_worker_path_matches_driver_sets(driver_doc_limit):
    """Distributed Jaccard scoring equals a direct python-set computation.

    driver_doc_limit=0 forces the distributed pair-slot shuffle path
    (_ShingleSlotEmitter → sort → _score_pairs_block → leftover merge);
    the default exercises the small-candidate driver path."""
    from data_profiler_ray.functions.dedup import verify_jaccard
    rng = np.random.default_rng(3)
    vocab = "aa bb cc dd ee ff gg hh ii jj".split()
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 30)))
             for _ in range(40)]
    tbl = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array(texts)})
    pairs = pa.table({"id_a": pa.array([0, 1, 2, 5], pa.int64()),
                      "id_b": pa.array([3, 4, 7, 39], pa.int64())})
    out = verify_jaccard(ray.data.from_arrow(tbl), pairs, threshold=0.0,
                         driver_doc_limit=driver_doc_limit).to_pandas()
    assert len(out) == 4

    def sets(t, k=3):
        toks = t.lower().split()
        if len(toks) < k:
            return {tuple(toks)}
        return {tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    for _, r in out.iterrows():
        sa, sb = sets(texts[int(r.id_a)]), sets(texts[int(r.id_b)])
        want = len(sa & sb) / len(sa | sb) if (sa | sb) else 1.0
        assert abs(r.jaccard - want) < 1e-9, (r.id_a, r.id_b)


def test_embedding_all_pairs_exact_row_guard():
    """The O(n²) oracle baseline refuses large inputs instead of collecting
    them onto the driver (points at the LSH path)."""
    from data_profiler_ray.functions.dedup import embedding_all_pairs_exact
    rng = np.random.default_rng(0)
    tbl = pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([rng.standard_normal(64).tolist()
                               for _ in range(50)], pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="embedding_dup_pairs"):
        embedding_all_pairs_exact(ray.data.from_arrow(tbl), max_rows=10)


def test_knn_brute_force_vs_numpy(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    q = X[0]
    out = knn_brute_force(ds, q, k=10).to_pandas()
    # numpy oracle
    nx = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    nq = q / np.linalg.norm(q)
    sims = nx @ nq
    oracle = pdf["vec_id"].to_numpy()[np.argsort(-sims, kind="stable")[:10]]
    assert out["vec_id"].tolist() == sorted(
        oracle.tolist(), key=lambda i: (-sims[pdf["vec_id"].tolist().index(i)], i))
    assert out["cosine"].iloc[0] == pytest.approx(1.0)


def test_knn_ivf_recall(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    q = X[7]
    exact = set(knn_brute_force(ds, q, k=10)["vec_id"].to_pylist())
    approx = set(knn_ivf(ds, q, k=10, n_clusters=8, n_probe=4)
                 ["vec_id"].to_pylist())
    assert len(exact & approx) >= 5  # recall@10 ≥ 0.5 with 4/8 probes
    assert 7 in approx               # the query vector itself is found


def test_token_counts_vs_pandas(sf_dir):
    tbl = pa.concat_tables(list(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        .map_batches(token_count_batch, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")))
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    expect = pdf["text"].str.findall(r"\S+").str.len()
    got = tbl.to_pandas().set_index("doc_id")["n_tokens"]
    pd.testing.assert_series_equal(
        got.sort_index(), expect.rename("n_tokens"), check_index=False,
        check_dtype=False)


def test_language_id():
    tbl = pa.table({"text": pa.array([
        "the cat sat on the mat and it was happy with the sun",
        "der Hund und die Katze sind nicht in der Stadt",
        "le chat et le chien sont dans la maison pour la nuit",
        "xyzzy qwerty asdf",
        "",
    ])})
    out = language_id_batch(tbl)
    langs = out["lang_pred"].to_pylist()
    assert langs[0] == "en"
    assert langs[1] == "de"
    assert langs[2] == "fr"
    assert langs[3] == "und"
    assert langs[4] == "und"


def test_quality_score():
    tbl = pa.table({"text": pa.array([
        "the quick brown fox jumps over the lazy dog near the river bank "
        "and it was a fine day for a walk in the park with friends",
        "000 111 222 333 444 555 666 777 888 999",
        "spam spam spam spam spam spam spam spam",
        "",
    ])})
    out = quality_score_batch(tbl).to_pandas()
    assert out["quality_score"][0] > out["quality_score"][1]
    assert out["quality_score"][0] > out["quality_score"][2]
    assert out["repetition_ratio"][2] == pytest.approx(1.0)
    assert out["ratio_digits"][1] > 0.5
    assert out["n_words"][3] == 0


def test_fingerprint_stable_and_normalized():
    tbl = pa.table({"text": pa.array(
        ["Hello   World", "hello world", "different text", None])})
    out = fingerprint_batch(tbl)
    md5 = out["fingerprint_md5"].to_pylist()
    u64 = out["fingerprint_u64"].to_pylist()
    assert md5[0] == md5[1]          # whitespace+case normalized
    assert u64[0] == u64[1]
    assert md5[2] != md5[0]
    assert md5[3] is None and u64[3] is None
    import hashlib
    assert md5[0] == hashlib.md5(b"hello world").hexdigest()


def test_media_feature_plumbing():
    tbl = synthesize_media(100, seed=3)
    ds = ray.data.from_arrow(tbl)
    out = pa.concat_tables(list(
        extract_media_features(ds, fake=True, feat_dim=8)
        .iter_batches(batch_format="pyarrow")))
    assert out.num_rows == 100
    feats = out["feature"].to_pylist()
    assert all(len(f) == 8 for f in feats)
    # deterministic: same payload → same feature
    out2 = pa.concat_tables(list(
        extract_media_features(ray.data.from_arrow(tbl), fake=True,
                               feat_dim=8)
        .iter_batches(batch_format="pyarrow")))
    assert out.to_pydict() == out2.to_pydict()


def test_media_decode_stub_raises():
    from data_profiler_ray.stages.multimodal import MediaFeatureExtractor
    ex = MediaFeatureExtractor(fake=False)
    with pytest.raises(ValueError):  # mp4 is a REAL container parser now
        ex._decode("video", "mp4", b"bytes")
    with pytest.raises(ValueError):  # unknown format, strict mode
        ex._decode("video", "webm", b"bytes")
    with pytest.raises(ValueError):  # jpeg is a REAL codec now: bad payload
        ex._decode("image", "jpeg", b"bytes")
    with pytest.raises(ValueError):  # png is a REAL codec now: bad payload
        ex._decode("image", "png", b"bytes")


def test_frame_sampler():
    tbl = synthesize_media(30, seed=9)
    ds = ray.data.from_arrow(tbl)
    out = pa.concat_tables(list(
        ds.map_batches(FrameSampler, fn_constructor_kwargs=dict(
            stride=10, fake=True), batch_format="pyarrow",
            concurrency=(1, 2))
        .iter_batches(batch_format="pyarrow")))
    pdf = out.to_pandas()
    n_videos = sum(1 for k in tbl["kind"].to_pylist() if k == "video")
    assert pdf["media_id"].nunique() == n_videos
    assert set(pdf["frame_idx"].unique()) == {0, 10, 20}


def test_language_id_labeled_accuracy():
    """Mini confusion-matrix check on labeled sentences: ≥90% accuracy over
    the fourteen supported languages, no language hijacks another's sentences.
    (The synthetic documents.lang column is uncorrelated with its
    English-ish text, so the labeled fixture lives here; exact parity of
    the heuristic itself is covered by the language_id_documents oracle.)"""
    labeled = [
        ("it", "il cane e il gatto sono nella casa e non sono come gli "
               "altri del paese"),
        ("it", "la vita è più bella anche per chi non sono mai come gli "
               "altri nel mondo"),
        ("pt", "o cachorro e o gato estão na casa mas não para a rua "
               "como você foi"),
        ("pt", "ele foi para a cidade com um amigo mas não como os "
               "outros do bairro"),
        ("nl", "de hond en de kat zijn niet in het huis maar op de "
               "stoep met mij"),
        ("nl", "ik ga met je naar de stad om dat niet aan het einde "
               "voor ons is"),
        ("sv", "och det är en katt som inte har ett hus med den till "
               "oss på vägen"),
        ("sv", "jag har inte en bil men det är bra för den som var på "
               "plats med oss"),
        ("pl", "to nie jest tak jak po co ale się w domu na pewno do "
               "niego idzie"),
        ("pl", "on nie wie czy jest w stanie ale jak się po tym od "
               "razu za nim"),
        ("da", "og det er ikke en kat der var på huset til han og hun "
               "har set os"),
        ("da", "jeg har ikke set hende men det er godt at hun var der "
               "og ikke han"),
        ("fi", "ja se on niin että hän ei ole mutta kun tämä oli myös "
               "vain siellä"),
        ("fi", "hän oli siellä kun se ei ole niin mutta myös tämä on "
               "vain joka päivä"),
        ("tr", "bu bir ev ve ben sen ile çok daha ama ne var yok gibi "
               "değil şimdi"),
        ("tr", "ben bu şehir için bir gün daha ve çok ama ne gibi var "
               "yok ile sen"),
        ("cs", "to je tak že se na ale už není co když byl jsem nebo "
               "jako dnes"),
        ("cs", "on byl na to že se je ale co už tak nebo když jsou "
               "jako včera"),
        ("ro", "și nu este cu mai la care dar din pentru sunt fost sau "
               "când acolo"),
        ("ro", "el este la oraș cu un prieten dar nu mai care din "
               "pentru când vine"),
        ("en", "the cat sat on the mat and it was warm in the sun"),
        ("en", "this is a test of the system and it should be fine"),
        ("en", "we went to the park for a walk with the dog"),
        ("de", "der hund lief durch die stadt und die katze schlief"),
        ("de", "das wetter ist nicht gut und es regnet in der nacht"),
        ("de", "ich gehe mit dem hund zu der schule und das ist gut"),
        ("fr", "le chien et le chat sont dans la maison pour la nuit"),
        ("fr", "nous allons au parc pour une promenade avec le chien"),
        ("fr", "la mer est belle et le ciel est bleu dans le sud"),
        ("es", "el perro y el gato están en la casa para la noche"),
        ("es", "vamos al parque para un paseo con el perro y la niña"),
        ("es", "la comida es buena y el cielo es azul en el sur"),
    ]
    tbl = pa.table({"text": pa.array([t for _, t in labeled])})
    pred = language_id_batch(tbl)["lang_pred"].to_pylist()
    hits = sum(1 for (want, _), got in zip(labeled, pred) if want == got)
    assert hits / len(labeled) >= 0.9, list(zip(labeled, pred))


def test_hash_split_deterministic_and_balanced():
    from data_profiler_ray.functions.sampling import hash_split, split_filter
    n = 20000
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    ratios = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = pa.concat_tables(list(
        hash_split(ray.data.from_arrow(tbl), "doc_id", ratios)
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    # key-stable: shuffled input produces identical per-key assignment
    perm = tbl.take(pa.array(np.random.default_rng(0).permutation(n)))
    out2 = pa.concat_tables(list(
        hash_split(ray.data.from_arrow(perm), "doc_id", ratios)
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    m1 = out.set_index("doc_id")["split"]
    m2 = out2.set_index("doc_id")["split"]
    assert (m1.sort_index() == m2.sort_index()).all()
    # split_filter streams exactly the train subset
    kept = pa.concat_tables(list(
        split_filter(ray.data.from_arrow(tbl), "doc_id", ratios, "train")
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    assert set(kept["doc_id"]) == set(m1[m1 == "train"].index)


def test_hash_split_string_keys():
    from data_profiler_ray.functions.sampling import hash_split
    tbl = pa.table({"conv_id": pa.array([f"conv-{i:05d}" for i in
                                         range(5000)])})
    out = pa.concat_tables(list(
        hash_split(ray.data.from_arrow(tbl), "conv_id",
                   {"a": 0.5, "b": 0.5}).iter_batches(
            batch_format="pyarrow"))).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["a"] - 0.5) < 0.03


def test_bmp_wav_roundtrip():
    from data_profiler_ray.functions.codecs import (
        decode_bmp, decode_wav_pcm16, encode_bmp, encode_wav_pcm16)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)  # odd width
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    s = (np.sin(np.arange(8000) / 10.0) * 20000).astype(np.int16)
    dec, rate = decode_wav_pcm16(encode_wav_pcm16(s, 22050))
    assert rate == 22050
    assert np.allclose(dec, s / 32768.0, atol=1e-4)


def test_png_roundtrip_and_filters():
    from data_profiler_ray.functions.codecs import decode_png, encode_png
    import struct
    import zlib
    from data_profiler_ray.functions.codecs import _PNG_SIG, _png_chunk
    rng = np.random.default_rng(8)
    # roundtrip: gray, RGB (odd dims), RGBA
    gray = rng.integers(0, 256, size=(21, 17), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(gray))[:, :, 0], gray)
    rgb = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    rgba = rng.integers(0, 256, size=(8, 9, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)

    # foreign-file filters: forward-filter a known image with Sub/Up/
    # Average/Paeth scanlines (independent reference implementation of the
    # published spec), decoder must invert them exactly
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, c = img.shape
    raw = img.reshape(h, w * c).astype(np.int64)
    lines = bytearray()
    filters = [1, 2, 3, 4, 2]

    def paeth(a, b, cc):
        p = a + b - cc
        pa_, pb, pcd = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa_ <= pb and pa_ <= pcd else (b if pb <= pcd else cc)

    for y, f in enumerate(filters):
        prev = raw[y - 1] if y > 0 else np.zeros(w * c, dtype=np.int64)
        row = raw[y]
        out = np.zeros(w * c, dtype=np.int64)
        for x in range(w * c):
            left = row[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            pred = {1: left, 2: up, 3: (left + up) // 2,
                    4: paeth(left, up, ul)}[f]
            out[x] = (row[x] - pred) % 256
        lines.append(f)
        lines += bytes(out.astype(np.uint8))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
               + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), img)


def test_real_codec_feature_extraction():
    """Real BMP/PNG/JPEG/WAV payloads run the TRUE decode path (fake=False)
    end to end through the actor-pool stage; mp4 still gates."""
    tbl = synthesize_media(60, seed=5, real_codecs=True)
    keep = pa.compute.is_in(tbl["kind"], value_set=pa.array(["image",
                                                            "audio"]))
    media = tbl.filter(keep)
    assert "jpeg" in set(media.column("format").to_pylist())
    ds = ray.data.from_arrow(media)
    out = pa.concat_tables(list(
        extract_media_features(ds, fake=False, feat_dim=16)
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    assert len(out) == media.num_rows
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape[1] == 16
    assert np.isfinite(feats).all()
    # bmp/png features: mean channels of uniform-random pixels ≈ 0.5
    # (jpeg payloads are smooth gradients — excluded from this check)
    fmts = media.column("format").to_pylist()
    kinds = media.column("kind").to_pylist()
    flat_rows = [i for i, (k, f) in enumerate(zip(kinds, fmts))
                 if k == "image" and f in ("bmp", "png")]
    assert np.allclose(feats[flat_rows, :3], 0.5, atol=0.05)
    # audio features: rms of 0.25-amplitude sine ≈ 0.25/sqrt(2)
    aud_rows = out[out["kind"] == "audio"].index
    assert np.allclose(feats[aud_rows, 0], 0.25 / np.sqrt(2), atol=0.03)


def test_knn_ivf_recall_on_cluster_sorted_input(tmp_path):
    """r3 verdict item 4: centroid training must survive input SORTED by
    cluster (where limit()-sampling is maximally biased — it would only
    ever see the first clusters). 16 well-separated clusters written in
    cluster order across many blocks; the query sits in the LAST cluster."""
    import pyarrow.parquet as pq
    rng = np.random.default_rng(5)
    n_clusters, per = 16, 1500
    dim = 32
    centers = rng.standard_normal((n_clusters, dim)) * 10.0
    X = np.concatenate([centers[c] + 0.3 * rng.standard_normal((per, dim))
                        for c in range(n_clusters)]).astype(np.float32)
    n = X.shape[0]
    flat = pa.array(X.ravel().astype(np.float32), pa.float32())
    offs = pa.array(np.arange(n + 1, dtype=np.int32) * dim, pa.int32())
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.ListArray.from_arrays(offs, flat)})
    pq.write_table(tbl, str(tmp_path / "embs.parquet"), row_group_size=1500)
    ds = ray.data.read_parquet(str(tmp_path / "embs.parquet"))
    q = X[-1]  # a member of the last cluster
    exact = set(knn_brute_force(ds, q, k=10)["vec_id"].to_pylist())
    approx = set(knn_ivf(ds, q, k=10, n_clusters=16, n_probe=4,
                         sample_rows=4000)["vec_id"].to_pylist())
    assert len(exact & approx) >= 9  # near-perfect recall on separated blobs


def test_jpeg_roundtrip_within_tolerance():
    """r3 verdict item 8: baseline JPEG encode->decode (pure-numpy T.81)
    roundtrips a smooth image within lossy tolerance, incl. the 4:2:0
    subsampled and grayscale and odd-dimension paths."""
    from data_profiler_ray.functions.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.clip(np.stack([(xx * 4) % 256, (yy * 4) % 256,
                            128 + 100 * np.sin(xx / 10.0) * np.cos(yy / 12.0)],
                           axis=-1)
                  + rng.normal(0, 3, (64, 64, 3)), 0, 255).astype(np.uint8)
    for q, sub, psnr_min in [(90, False, 35.0), (75, False, 33.0),
                             (90, True, 32.0)]:
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        assert out.shape == img.shape
        mse = float(np.mean((out.astype(float) - img.astype(float)) ** 2))
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        assert psnr >= psnr_min, (q, sub, psnr)
    gray = (xx * 3 + yy * 2).astype(np.uint8)
    gout = decode_jpeg(encode_jpeg(gray, quality=90))
    assert gout.shape == (64, 64, 3)
    assert np.abs(gout[:, :, 0].astype(float) - gray).mean() < 3.0
    odd = img[:50, :37]
    oout = decode_jpeg(encode_jpeg(odd, quality=85))
    assert oout.shape == odd.shape


def test_jpeg_rejects_progressive_marker():
    from data_profiler_ray.functions.jpeg import decode_jpeg, encode_jpeg
    buf = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # SOF2 = progressive
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf))


def test_jpeg_malformed_payloads_raise_valueerror():
    """ADVICE r4: truncated entropy data, undeclared table ids and short
    marker bodies must surface as ValueError (the one exception type the
    multimodal actor stage catches), never IndexError/KeyError/struct.error."""
    from data_profiler_ray.functions.jpeg import decode_jpeg, encode_jpeg
    good = encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8))
    # truncated entropy segment
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) - 6])
    # short marker body (chop right after a DQT length field)
    i = good.find(b"\xff\xdb")
    with pytest.raises(ValueError):
        decode_jpeg(good[: i + 3])
    # undeclared quant-table id in the SOF component spec
    buf = bytearray(good)
    j = buf.find(b"\xff\xc0")
    buf[j + 2 + 2 + 8] = 7  # component 0 Tq → undeclared table 7
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf))
    # garbage
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xda\x00\x04\x01\x00")


def test_jpeg_features_match_direct_decode():
    """JPEG rows through the actor-pool stage equal featurizing the
    decoded image directly — the gate at multimodal.py is genuinely open."""
    from data_profiler_ray.functions.codecs import image_features
    from data_profiler_ray.functions.jpeg import decode_jpeg
    tbl = synthesize_media(48, seed=9, real_codecs=True)
    jm = tbl.filter(pa.compute.equal(tbl["format"], "jpeg"))
    assert jm.num_rows > 0
    out = pa.concat_tables(list(
        extract_media_features(ray.data.from_arrow(jm), fake=False)
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    out = out.set_index("media_id")
    for mid, payload in zip(jm.column("media_id").to_pylist(),
                            jm.column("payload").to_pylist()):
        want = image_features(decode_jpeg(payload), 16)
        got = np.asarray(out.loc[mid, "feature"])
        assert np.allclose(got, want)


def test_dup_cluster_union_find_components():
    """Chained pairs must collapse to one component with min-id rep, and
    disjoint pairs stay separate (exercises path compression + min-root)."""
    import pyarrow.parquet as pq

    from data_profiler_ray.pipelines.queries import dup_clusters_documents
    # build a tiny documents table where jaccard clustering is knowable:
    # 3 identical docs (chain), 2 other identical docs, 1 singleton
    texts = ["alpha beta gamma delta epsilon zeta"] * 3 \
        + ["one two three four five six"] * 2 \
        + ["totally unrelated document text here now"]
    import tempfile, os
    d = tempfile.mkdtemp()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6, pa.string())}),
        os.path.join(d, "documents.parquet"))
    out = dup_clusters_documents(d).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_rep"]))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_stratified_sample_deterministic_and_rated():
    from data_profiler_ray.functions.sampling import StratifiedSampler
    n = 40_000
    rng = np.random.default_rng(3)
    langs = np.array(["en", "de", "xx"])[rng.integers(0, 3, n)]
    tbl = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                    "lang": pa.array(langs, pa.string())})
    s = StratifiedSampler("doc_id", "lang", {"en": 0.5, "de": 0.25},
                          seed=7, default_frac=0.1)
    out1, out2 = s(tbl), s(tbl)
    assert out1.equals(out2)  # pure function of (key, stratum)
    df = out1.to_pandas().groupby("lang").size()
    base = pa.table({"lang": langs}).to_pandas().groupby("lang").size()
    for lang, frac in [("en", 0.5), ("de", 0.25), ("xx", 0.1)]:
        rate = df.get(lang, 0) / base[lang]
        assert abs(rate - frac) < 0.02, (lang, rate)
