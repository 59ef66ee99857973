"""Distributed as-of join (ops/relational.asof_join)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ssb_sgis_ray.ops import relational as rel

SF = "/root/testdata/sf0.001"


def _pandas_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Reference semantics: latest right with r.ts <= l.ts per key; ties on
    r.ts resolve to max id; unmatched left rows drop (inner)."""
    rows = []
    for _, l in left.iterrows():
        cand = right[(right.user_id == l.user_id) & (right.ts_us <= l.ts_us)]
        if len(cand):
            best = cand.sort_values(["ts_us", "id"]).iloc[-1]
            rows.append(
                (l.id, l.user_id, l.ts_us, best.id, l.ts_us - best.ts_us)
            )
    return pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_us", "matched_id", "lag_us"]
    ).astype("int64")


def _to_ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_asof_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    bucket = 1000  # small bucket so cross-bucket carry is exercised hard
    left = pd.DataFrame(
        {
            "user_id": rng.integers(0, 7, 300),
            "ts_us": rng.integers(0, 20_000, 300),
            "id": np.arange(300),
        }
    ).astype("int64")
    right = pd.DataFrame(
        {
            "user_id": rng.integers(0, 7, 200),
            "ts_us": rng.integers(0, 20_000, 200),
            "id": np.arange(1000, 1200),
        }
    ).astype("int64")
    # inject exact-tie timestamps (left ts == right ts) and duplicate right ts
    right.loc[0, ["user_id", "ts_us"]] = [3, 5000]
    right.loc[1, ["user_id", "ts_us"]] = [3, 5000]  # dup right ts, ids differ
    left.loc[0, ["user_id", "ts_us"]] = [3, 5000]   # tie -> must match id 1001

    out = (
        rel.asof_join(_to_ds(left), _to_ds(right), bucket_us=bucket, num_groups=16)
        .to_pandas()
        .sort_values(["event_id"])
        .reset_index(drop=True)
        .astype("int64")
    )
    exp = (
        _pandas_asof(left, right)
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    assert out.loc[out.event_id == 0, "matched_id"].item() == 1001


def test_asof_join_empty_right(ray_session):
    left = pd.DataFrame(
        {"user_id": [1, 2], "ts_us": [10, 20], "id": [1, 2]}
    ).astype("int64")
    right = pd.DataFrame(
        {"user_id": [9], "ts_us": [5], "id": [7]}
    ).astype("int64")
    out = rel.asof_join(_to_ds(left), _to_ds(right), bucket_us=1000).to_pandas()
    assert len(out) == 0  # no key overlap -> inner join drops everything


def test_asof_carry_limit_guard(ray_session):
    left = pd.DataFrame({"user_id": [1], "ts_us": [10], "id": [1]}).astype("int64")
    right = pd.DataFrame(
        {"user_id": np.arange(50), "ts_us": np.arange(50), "id": np.arange(50)}
    ).astype("int64")
    with pytest.raises(RuntimeError, match="carry"):
        rel.asof_join(
            _to_ds(left), _to_ds(right), bucket_us=1, carry_limit=10
        )


def test_events_asof_query(ray_session):
    from ssb_sgis_ray import queries as q

    df = q.q_events_asof(SF).to_pandas()
    assert len(df) > 0
    assert (df["lag_us"] >= 0).all()
    assert df["event_id"].is_unique


def test_top_tokens_planted(ray_session):
    import ray.data as rd
    from ssb_sgis_ray.ops import text as text_ops

    # plant exact frequencies: 'alpha' x30, 'beta' x20, 'tie1'/'tie2' x5 each
    docs = (
        ["alpha"] * 30 + ["beta Beta"] * 10 + ["tie1 tie2"] * 5
    )
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    out = text_ops.top_tokens(ds, k=3, num_groups=8)
    assert out["token"].tolist() == ["alpha", "beta", "tie1"]
    assert out["cnt"].tolist() == [30, 20, 5]  # tie1 beats tie2 lexicographically


def test_asof_join_entirely_empty_right(ray_session):
    import ray.data as rd
    import pyarrow as pa

    left = pd.DataFrame(
        {"user_id": [1, 2], "ts_us": [10, 20], "id": [1, 2]}
    ).astype("int64")
    empty = rd.from_arrow(
        pa.table({"user_id": pa.array([], pa.int64()),
                  "ts_us": pa.array([], pa.int64()),
                  "id": pa.array([], pa.int64())})
    )
    out = rel.asof_join(_to_ds(left), empty, bucket_us=1000).to_pandas()
    assert len(out) == 0


def test_asof_join_rejects_overflowing_bucket(ray_session):
    # epoch-us timestamps with a 1 ms bucket: bucket index >> 2^21
    left = pd.DataFrame(
        {"user_id": [1], "ts_us": [1_700_000_000_000_000], "id": [1]}
    ).astype("int64")
    with pytest.raises(Exception, match="bucket"):
        rel.asof_join(_to_ds(left), _to_ds(left), bucket_us=1000).to_pandas()


def test_windowed_heavy_hitters_matches_brute_force(ray_session):
    """Per-window top-k equals the Counter brute force with (count DESC,
    key ASC) ties under any partitioning; a window with fewer than k
    distinct keys returns them all; tied counts order by key."""
    import ray.data as rd

    from collections import Counter

    from ssb_sgis_ray.ops import relational as rel

    rng = np.random.RandomState(13)
    W = 1000
    ts = rng.randint(0, 5 * W, size=400).astype(np.int64)
    users = rng.randint(0, 9, size=400).astype(np.int64)
    ts[:2] = [4 * W + 1, 4 * W + 2]   # window 4: exactly 2 events
    users[:2] = [7, 8]
    cnt = Counter(zip(ts // W, users))
    want = {}
    for w in sorted({t // W for t in ts}):
        rows = sorted(((c, u) for (ww, u), c in cnt.items() if ww == w),
                      key=lambda x: (-x[0], x[1]))[:3]
        want[w] = [(int(u), int(c), r + 1)
                   for r, (c, u) in enumerate(rows)]

    tbl = pa.table({
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(users),
    })
    for parts in (1, 8):
        out = rel.windowed_heavy_hitters(
            rd.from_arrow(tbl).repartition(parts), window_us=W,
            k=3).to_pandas()
        got = {}
        for _, r in out.iterrows():
            got.setdefault(int(r["win"]), []).append(
                (int(r["hkey"]), int(r["n_events"]), int(r["hh_rank"])))
        got = {w: sorted(v, key=lambda x: x[2]) for w, v in got.items()}
        assert got == want, parts
