"""Exact distributed order statistics (ops/relational.py:
column_quantiles_disc) — DuckDB quantile_disc equality plus the
histogram-refinement path (driver collect cap forced tiny)."""

import duckdb
import numpy as np
import pytest

from probe_ray.ops import relational

SF = "/root/testdata/sf0.001"
QS = (0.0, 0.25, 0.5, 0.9, 0.99, 1.0)


@pytest.fixture(scope="module")
def duck_events():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con


def expected(con, qs):
    return [
        con.execute(
            f"SELECT quantile_disc(value, {q}) FROM events"
        ).fetchone()[0]
        for q in qs
    ]


def test_quantiles_match_duckdb(ray_session, duck_events):
    got = relational.column_quantiles_disc(SF, qs=QS).to_pylist()
    want = expected(duck_events, QS)
    assert [r["q"] for r in got] == list(QS)
    assert [r["value"] for r in got] == want


def test_refinement_path_same_answer(ray_session, duck_events, monkeypatch):
    """Force the recursion: with a tiny driver collect cap every bin
    overflows and the histogram must recurse into sub-ranges before it
    may collect — results must be identical to the direct path."""
    monkeypatch.setattr(relational, "QUANTILE_COLLECT_MAX", 3)
    got = relational.column_quantiles_disc(SF, qs=(0.5, 0.99)).to_pylist()
    want = expected(duck_events, (0.5, 0.99))
    assert [r["value"] for r in got] == want


def test_order_stat_exhaustive_small(ray_session, duck_events):
    """Every order statistic of the column equals numpy's sorted array
    (spot 25 evenly spaced ks to keep runtime bounded)."""
    import pyarrow.parquet as pq

    v = np.sort(
        pq.read_table(f"{SF}/events.parquet", columns=["value"])
        .column("value")
        .to_numpy()
    )
    n = v.size
    counts = relational._value_histogram(
        [f"{SF}/events.parquet"], "value", float(v[0]), float(v[-1])
    )
    for k in np.linspace(0, n - 1, 25).astype(int):
        got = relational._order_stat(
            [f"{SF}/events.parquet"], "value", int(k),
            float(v[0]), float(v[-1]), counts,
        )
        assert got == v[k]


def test_grouped_quantiles_match_duckdb(ray_session, duck_events):
    got = relational.column_quantiles_by_group(SF).to_pylist()
    want = duck_events.execute(
        "SELECT * FROM ("
        "SELECT event_type, CAST(0.5 AS DOUBLE) AS q, "
        "quantile_disc(value, 0.5) AS value FROM events GROUP BY event_type "
        "UNION ALL SELECT event_type, CAST(0.9 AS DOUBLE), "
        "quantile_disc(value, 0.9) FROM events GROUP BY event_type"
        ") ORDER BY event_type, q"
    ).fetchall()
    assert [(r["event_type"], r["q"], r["value"]) for r in got] == want
    assert len(got) == 10  # 5 event types x 2 quantiles
