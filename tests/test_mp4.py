"""mp4 (ISO-BMFF) metadata parse + demux tests (VERDICT r4 item 9).

The builder emits a minimal spec-valid container; the parser must recover
every planted metadata value, the demuxer must return byte-exact encoded
samples, and the actor-pool featurize stage must run end-to-end on an
mp4-bearing media table with REAL (metadata-derived) features.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from data_profiler_ray.functions.mp4 import (build_mp4, iter_mp4_samples,
                                             mp4_features,
                                             parse_mp4_metadata)
from data_profiler_ray.stages.multimodal import (FrameSampler,
                                                 MediaFeatureExtractor,
                                                 extract_media_features,
                                                 synthesize_media)


def test_parse_roundtrip_video_and_audio():
    p = build_mp4(n_frames=48, fps=24, width=320, height=240,
                  audio_rate=22050, audio_samples=44100, seed=7)
    meta = parse_mp4_metadata(p)
    assert meta["brand"] == "isom"
    assert meta["duration_sec"] == pytest.approx(2.0)
    assert meta["n_tracks"] == 2
    vid, aud = meta["tracks"]
    assert (vid["handler"], vid["codec"]) == ("vide", "avc1")
    assert (vid["width"], vid["height"]) == (320, 240)
    assert vid["n_samples"] == 48
    assert vid["duration_sec"] == pytest.approx(2.0)
    assert (aud["handler"], aud["codec"]) == ("soun", "mp4a")
    assert aud["sample_rate"] == 22050
    assert aud["channels"] == 1
    assert aud["n_samples"] == 44100


def test_parse_video_only_deterministic():
    p1 = build_mp4(n_frames=10, fps=10, seed=3)
    p2 = build_mp4(n_frames=10, fps=10, seed=3)
    assert p1 == p2
    meta = parse_mp4_metadata(p1)
    assert meta["n_tracks"] == 1
    assert meta["tracks"][0]["n_samples"] == 10


def test_demux_samples_byte_exact():
    """Demuxed samples must be the exact bytes the builder wrote to mdat,
    in order — proves the stsc/stsz/stco walk, not just counting."""
    p = build_mp4(n_frames=12, fps=12, frame_bytes=64, seed=11)
    samples = list(iter_mp4_samples(p, "vide"))
    assert len(samples) == 12
    # mdat body is the concatenation of the samples, found at the stco
    # offset of the first sample
    mdat_at = p.find(b"mdat")
    body = p[mdat_at + 4:]
    joined = b"".join(samples)
    assert body[:len(joined)] == joined
    # distinct, seeded content
    assert len({s for s in samples}) == 12


def test_malformed_contract_uniform_valueerror():
    p = build_mp4(seed=1)
    for bad in [b"", b"\x00" * 8, p[:20], p[:len(p) // 2],
                b"\xff" * 100, p.replace(b"moov", b"xxxx", 1)]:
        with pytest.raises(ValueError):
            parse_mp4_metadata(bad)
        with pytest.raises(ValueError):
            list(iter_mp4_samples(bad, "vide"))
    with pytest.raises(ValueError):   # no such track
        list(iter_mp4_samples(p, "soun"))


def test_mp4_features_real_values():
    p = build_mp4(n_frames=30, fps=30, width=64, height=48,
                  audio_rate=16000, audio_samples=16000)
    f = mp4_features(parse_mp4_metadata(p), 16)
    assert f[0] == pytest.approx(1.0)          # duration
    assert f[1] == 2.0                         # tracks
    assert (f[3], f[4]) == (64.0, 48.0)        # w, h
    assert f[5] == 30.0 and f[6] == pytest.approx(30.0)  # frames, fps
    assert f[8] == 16000.0                     # audio rate
    assert f.shape == (16,)


def test_extractor_strict_mode_on_real_mp4():
    """fake=False end-to-end: the actor stage must featurize real mp4s
    without the digest fallback ever firing."""
    ex = MediaFeatureExtractor(feat_dim=12, fake=False)
    p = build_mp4(n_frames=30, fps=30, width=64, height=64, seed=5)
    out = ex._decode("video", "mp4", p)
    assert out.shape == (12,)
    assert out[3] == 64.0 and out[5] == 30.0


def test_media_pipeline_real_codecs_with_mp4(ray_session):
    tbl = synthesize_media(60, seed=4, real_codecs=True)
    fmts = set(tbl["format"].to_pylist())
    assert "mp4" in fmts
    ds = ray.data.from_arrow(tbl)
    out = pa.concat_tables(list(
        extract_media_features(ds, fake=False, feat_dim=16)
        .iter_batches(batch_format="pyarrow")))
    assert out.num_rows == 60
    pdf = out.to_pandas()
    vid = pdf[pdf["kind"] == "video"]
    assert len(vid) > 0
    # every video feature carries the planted 64x64 / 30-frame metadata
    for feat in vid["feature"]:
        assert feat[3] == 64.0 and feat[5] == 30.0


def test_frame_sampler_real_demux(ray_session):
    tbl = synthesize_media(40, seed=6, real_codecs=True)
    ds = ray.data.from_arrow(tbl)
    out = pa.concat_tables(list(
        ds.map_batches(FrameSampler,
                       fn_constructor_kwargs=dict(stride=10, fake=False),
                       batch_format="pyarrow", concurrency=(1, 2))
        .iter_batches(batch_format="pyarrow")))
    pdf = out.to_pandas()
    n_videos = sum(1 for k in tbl["kind"].to_pylist() if k == "video")
    assert pdf["media_id"].nunique() == n_videos
    # 30 frames, stride 10 → frames 0, 10, 20 per video, REAL sample bytes
    assert set(pdf["frame_idx"].unique()) == {0, 10, 20}
    assert (pdf.groupby("media_id").size() == 3).all()
    assert all(len(f) >= 16 for f in pdf["frame"])
