"""As-of / band join kernel (ops/relational.py:_asof_band_kernel):
edge cases the sf-data oracle rows can't pin — timestamp ties, one-user
skew, empty sides — checked against a brute-force scalar reference."""

import numpy as np
import pyarrow as pa

from probe_ray.ops.relational import _asof_band_kernel


def make_group(rows):
    """rows: (side, event_id, user_id, ts_us)"""
    side, eid, uid, ts = zip(*rows) if rows else ((), (), (), ())
    return pa.table(
        {
            "part": pa.array([0] * len(rows), pa.int64()),
            "side": pa.array(side, pa.int8()),
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
        }
    )


def brute(rows, window_us):
    lefts = sorted(r for r in rows if r[0] == 1)
    rights = [r for r in rows if r[0] == 0]
    out = {}
    for _, eid, uid, ts in sorted(lefts, key=lambda r: r[1]):
        cand = [r[3] for r in rights if r[2] == uid and r[3] < ts]
        if window_us is None:
            out[eid] = (uid, ts - max(cand) if cand else -1)
        else:
            out[eid] = (
                uid,
                sum(1 for c in cand if c >= ts - window_us),
            )
    return out


def run(rows, window_us):
    t = _asof_band_kernel(make_group(rows), window_us)
    name = "gap_us" if window_us is None else "n_prior"
    return {
        r["event_id"]: (r["user_id"], r[name]) for r in t.to_pylist()
    }


def check(rows, window_us):
    assert run(rows, window_us) == brute(rows, window_us)


def test_basic_asof_and_band():
    rows = [
        (0, 1, 7, 100), (0, 2, 7, 200), (1, 3, 7, 250),
        (0, 4, 8, 260), (1, 5, 8, 260),  # tie: strictly-earlier only
        (1, 6, 9, 50),                   # user with no rights
    ]
    check(rows, None)
    check(rows, 120)
    got = run(rows, None)
    assert got[3] == (7, 50)    # most recent of {100,200}
    assert got[5] == (8, -1)    # ts == right ts -> excluded
    assert got[6] == (9, -1)


def test_timestamp_ties_on_both_sides():
    rows = [
        (0, 1, 3, 100), (0, 2, 3, 100), (0, 3, 3, 100),
        (1, 4, 3, 100), (1, 5, 3, 101),
        (0, 6, 4, 100), (1, 7, 4, 100),
    ]
    check(rows, None)
    check(rows, 1)
    got = run(rows, 1)
    assert got[5] == (3, 3)  # all three ties inside [100, 101)


def test_single_user_skew_and_randomized():
    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    for _ in range(400):
        eid += 1
        rows.append(
            (int(rng.integers(2)), eid, int(rng.integers(3)),
             int(rng.integers(50)))  # dense ts -> many ties
        )
    check(rows, None)
    for w in (1, 5, 25, 10**9):
        check(rows, w)
    # one user owns every row
    rows_one = [(s, e, 0, t) for (s, e, _, t) in rows]
    check(rows_one, None)
    check(rows_one, 10)


def test_empty_sides():
    assert run([], None) == {}
    only_left = [(1, 1, 5, 10), (1, 2, 6, 20)]
    assert run(only_left, None) == {1: (5, -1), 2: (6, -1)}
    assert run(only_left, 100) == {1: (5, 0), 2: (6, 0)}
    only_right = [(0, 1, 5, 10)]
    assert run(only_right, None) == {}


def test_asof_e2e_matches_duckdb(ray_session):
    import duckdb

    from probe_ray.ops.relational import events_asof_last_click

    sf = "/root/testdata/sf0.001"
    # ordered=True covers the opt-in presentation sort (default is off)
    got = events_asof_last_click(sf, ordered=True).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(
        "SELECT p.event_id, p.user_id, "
        "CAST(coalesce(date_diff('microsecond', v.ts, p.ts), -1) AS BIGINT)"
        " AS gap_us "
        "FROM (SELECT * FROM events WHERE event_type='purchase') p "
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='click') v "
        "ON p.user_id = v.user_id AND p.ts > v.ts ORDER BY p.event_id"
    ).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["gap_us"].tolist() == want["gap_us"].tolist()
    # non-vacuous: both matched and unmatched rows present
    assert (got["gap_us"] >= 0).any() and (got["gap_us"] == -1).any()


# ---- skew-hardened (salted) variants ---------------------------------------
# Identity vs the plain one-shuffle forms on real sf data, plus a synthetic
# single-hot-user corpus (every row one user) — the exact case the
# time-bucket sub-salting exists for: the plain variant puts that user in
# ONE partition; the salted variant spreads it across buckets and must
# still produce the identical answer via replicas (band) / carries (asof).


def _pin_identical(plain_df, salted_df):
    # value identity, not row order: these ops no longer pay a global
    # presentation sort by default (ordered=False), so the two variants'
    # partition interleavings legitimately differ
    import pandas as pd

    cols = sorted(plain_df.columns)
    pd.testing.assert_frame_equal(
        plain_df[cols].sort_values(cols).reset_index(drop=True),
        salted_df[cols].sort_values(cols).reset_index(drop=True),
    )


def test_salted_asof_identity_sf(ray_session):
    from probe_ray.ops.relational import (
        events_asof_last_click,
        events_asof_last_click_salted,
    )

    sf = "/root/testdata/sf0.001"
    plain = events_asof_last_click(sf).to_pandas()
    # bucket_hours=1 forces nearly every match across a bucket boundary
    salted = events_asof_last_click_salted(sf, bucket_hours=1).to_pandas()
    _pin_identical(plain, salted)
    assert (plain["gap_us"] >= 0).any() and (plain["gap_us"] == -1).any()


def test_salted_band_identity_sf(ray_session):
    from probe_ray.ops.relational import (
        events_band_join_counts,
        events_band_join_counts_salted,
    )

    sf = "/root/testdata/sf0.001"
    for w, b in ((24, 24), (2, 3)):
        plain = events_band_join_counts(sf, window_hours=w).to_pandas()
        salted = events_band_join_counts_salted(
            sf, window_hours=w, bucket_hours=b
        ).to_pandas()
        _pin_identical(plain, salted)
        assert (plain["n_prior"] > 0).any()


def test_salted_single_hot_user(ray_session, tmp_path):
    """One user owns every event: brute-force scalar answer must match the
    salted distributed one with tiny buckets (many cross-bucket carries)."""
    import pyarrow.parquet as pq

    from probe_ray.ops.relational import (
        events_asof_last_click_salted,
        events_band_join_counts_salted,
    )

    rng = np.random.default_rng(11)
    n = 3000
    hour_us = 3_600_000_000
    ts = np.sort(rng.integers(0, 48 * hour_us, n))  # 48h span, ties likely
    etype = np.where(rng.integers(3, size=n) == 0, "purchase", "click")
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "event_type": pa.array(etype.tolist(), pa.string()),
            "value": pa.array(np.ones(n, np.float64)),
        }
    )
    sf = str(tmp_path)
    pq.write_table(tbl, f"{sf}/events.parquet")

    rows = [
        (1 if e == "purchase" else 0, i, 0, int(t))
        for i, (e, t) in enumerate(zip(etype, ts))
    ]
    want_asof = brute(rows, None)
    got = events_asof_last_click_salted(sf, bucket_hours=1).to_pandas()
    assert {
        int(r.event_id): (int(r.user_id), int(r.gap_us))
        for r in got.itertuples()
    } == want_asof

    w_hours = 2
    want_band = brute(rows, w_hours * hour_us)
    got_b = events_band_join_counts_salted(
        sf, window_hours=w_hours, bucket_hours=2
    ).to_pandas()
    assert {
        int(r.event_id): (int(r.user_id), int(r.n_prior))
        for r in got_b.itertuples()
    } == want_band
