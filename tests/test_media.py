"""Audio/video media stages (sources/media.py): codec roundtrips, feature
extraction vs independent recompute, frame sampling, and the end-to-end
Ray pipelines on sf0.001."""

import numpy as np
import pyarrow as pa
import pytest

from ssb_sgis_ray.sources import media

SF = "/root/testdata/sf0.001"


def test_audio_codec_roundtrip():
    s = np.array([5, -3, 0, 32767, -32768], dtype=np.int16)
    sr, out = media.decode_audio(media.encode_audio(s, sample_rate=8000))
    assert sr == 8000
    np.testing.assert_array_equal(out, s)


def test_audio_codec_rejects_bad_blob():
    with pytest.raises(ValueError):
        media.decode_audio(b"XXXX" + b"\x00" * 20)
    good = media.encode_audio(np.zeros(10, dtype=np.int16))
    with pytest.raises(ValueError):
        media.decode_audio(good[:-4])  # truncated payload


def test_video_codec_roundtrip():
    fr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    out = media.decode_video(media.encode_video(fr))
    np.testing.assert_array_equal(out, fr)
    with pytest.raises(ValueError):
        media.decode_video(media.encode_video(fr)[:-1])


def test_decode_external_is_stubbed():
    with pytest.raises(NotImplementedError):
        media.decode_external("mp3", b"")
    with pytest.raises(NotImplementedError):
        media.decode_external("mp4", b"")


def test_audio_features_match_independent_recompute():
    ids = np.array([0, 1, 7, 123, 4999], dtype=np.int64)
    built = media.BuildAudio()(pa.table({"doc_id": pa.array(ids)}))
    feats = media.AudioFeatures()(built)
    for i, doc in enumerate(ids):
        _, s = media.decode_audio(built["audio"][i].as_py())
        s64 = s.astype(np.int64)
        # independent per-sample recompute (no closed form, no vectorized trick)
        crossings = sum(
            1 for a, b in zip(s64[:-1], s64[1:]) if (a < 0) != (b < 0)
        )
        assert feats["n_samples"][i].as_py() == len(s64)
        assert feats["peak"][i].as_py() == int(max(abs(s64)))
        assert feats["energy"][i].as_py() == int(sum(int(v) * int(v) for v in s64))
        assert feats["crossings"][i].as_py() == crossings


def test_video_frame_sample_stride_and_sums():
    ids = np.array([3, 10, 17], dtype=np.int64)
    built = media.BuildVideo()(pa.table({"doc_id": pa.array(ids)}))
    rows = media.VideoFrameSample(stride=3)(built)
    got = {
        (r["doc_id"], r["frame_no"]): r["frame_sum"] for r in rows.to_pylist()
    }
    for i, doc in enumerate(ids):
        frames = media.decode_video(built["video"][i].as_py())
        expect_fnos = list(range(0, frames.shape[0], 3))
        have = sorted(f for d, f in got if d == doc)
        assert have == expect_fnos
        for f in expect_fnos:
            assert got[(doc, f)] == int(frames[f].astype(np.int64).sum())


def test_media_queries_end_to_end(ray_session):
    from ssb_sgis_ray import queries as q

    feats = q.q_audio_features(SF).to_pandas()
    docs_n = len(feats)
    assert docs_n > 0 and feats["energy"].gt(0).all()
    # every doc present exactly once
    assert feats["doc_id"].is_unique

    frames = q.q_video_frames(SF).to_pandas()
    # every doc contributes ceil(nf/3) frames, nf in [8, 16] -> 3..6 rows
    per_doc = frames.groupby("doc_id").size()
    assert len(per_doc) == docs_n
    assert per_doc.between(3, 6).all()


def test_truncated_headers_raise_valueerror():
    with pytest.raises(ValueError):
        media.decode_audio(b"RPCM\x00\x00")
    with pytest.raises(ValueError):
        media.decode_video(b"RVID\x00")
    from ssb_sgis_ray.codecs import geotiff
    with pytest.raises(ValueError):
        geotiff.decode_geotiff(b"II*\x00\xff\xff")
    good = geotiff.encode_geotiff(__import__("numpy").zeros((4, 4), dtype="uint8"))
    with pytest.raises(ValueError):
        geotiff.decode_geotiff(good[:20])  # truncated IFD


def test_video_frame_jaccard_pairs_planted(ray_session):
    """Planted near-dup videos: A and B share 3 of 5 distinct frames
    (J = 3/7 >= 1/3), C is disjoint; repeated frames within a video must
    count once (distinct-set semantics)."""
    import ray.data as rd

    from ssb_sgis_ray.ops import dedup as dedup_ops

    def frame(v):
        return np.full((4, 16), v, dtype=np.uint8)

    def blob(vals):
        return media.encode_video(np.stack([frame(v) for v in vals]))

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            # A: {10,20,30,40,50}; B: {10,20,30,60,70} (+ a repeat of 10)
            "video": pa.array(
                [blob([10, 20, 30, 40, 50]),
                 blob([10, 10, 20, 30, 60, 70]),
                 blob([99, 98])],
                pa.binary(),
            ),
        }
    )
    out = dedup_ops.video_frame_jaccard_pairs(
        rd.from_arrow(t), t_num=1, t_den=3
    ).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.id_a, row.id_b, row.jac_num, row.jac_den) == (1, 2, 3, 7)
    # tighter threshold kills the pair
    strict = dedup_ops.video_frame_jaccard_pairs(
        rd.from_arrow(t), t_num=4, t_den=5
    ).to_pandas()
    assert len(strict) == 0


def test_video_near_dup_degenerate_constant_corpus(ray_session):
    """A corpus of n identical videos (one constant frame set) used to
    expand C(n,2) instance rows inside the frame-bucket stage. The
    identical-set collapse must reduce it to ONE representative: the
    rep-level pair view and cluster view are both O(n), and the full
    expansion still equals the true C(k,2) answer on a small corpus."""
    import ray.data as rd

    from ssb_sgis_ray.ops import dedup as dedup_ops

    def blob(vals):
        return media.encode_video(
            np.stack([np.full((4, 16), v, dtype=np.uint8) for v in vals])
        )

    n = 400
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "video": pa.array([blob([7, 8, 9])] * n, pa.binary()),
        }
    )
    # bounded-output mode: rep-level pairs (one cluster -> zero pairs)
    reps = dedup_ops.video_frame_jaccard_pairs(
        rd.from_arrow(t), t_num=1, t_den=3, expand_identical=False
    ).to_pandas()
    assert len(reps) == 0
    clusters = dedup_ops.video_set_clusters(rd.from_arrow(t)).to_pandas()
    assert len(clusters) == n
    assert clusters["rep"].nunique() == 1
    assert (clusters["nfu"] == 3).all()
    # full expansion on a small identical corpus is exactly C(k,2), jac 1
    k = 12
    tk = pa.table(
        {
            "doc_id": pa.array(list(range(k)), pa.int64()),
            "video": pa.array([blob([7, 8, 9])] * k, pa.binary()),
        }
    )
    full = dedup_ops.video_frame_jaccard_pairs(
        rd.from_arrow(tk), t_num=1, t_den=3
    ).to_pandas()
    assert len(full) == k * (k - 1) // 2
    assert (full["jac_num"] == 3).all() and (full["jac_den"] == 3).all()
    assert (full["id_a"] < full["id_b"]).all()


def test_video_collapse_distributed_fallback_matches_driver_path(
    ray_session, monkeypatch
):
    """The distributed collapse shuffle (corpus above the driver-merge
    limit) and the join-based expansion (membership above the broadcast
    limit) must produce the same pairs as the fast paths."""
    import ray.data as rd

    from ssb_sgis_ray.ops import dedup as dedup_ops

    def blob(vals):
        return media.encode_video(
            np.stack([np.full((4, 16), v, dtype=np.uint8) for v in vals])
        )

    # two identical-set clusters {0,1,2} / {3,4} plus a near-dup bridge:
    # doc 5 shares 2 of the cluster-A 3-frame set (J = 2/4 >= 1/3)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "video": pa.array(
                [blob([7, 8, 9])] * 3 + [blob([1, 2])] * 2
                + [blob([7, 8, 99])],
                pa.binary(),
            ),
        }
    )

    def run():
        out = dedup_ops.video_frame_jaccard_pairs(
            rd.from_arrow(t), t_num=1, t_den=3
        ).to_pandas()
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    fast = run()
    monkeypatch.setattr(dedup_ops, "VIDEO_COLLAPSE_DRIVER_LIMIT", 0)
    monkeypatch.setattr(dedup_ops, "BROADCAST_DOCS_LIMIT", 0)
    slow = run()
    assert fast.equals(slow)
    # 3 intra-A + 1 intra-B + doc5 x cluster-A = 3 cross pairs
    assert len(fast) == 3 + 1 + 3
