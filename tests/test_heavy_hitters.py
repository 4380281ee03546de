"""Heavy hitters (ops/text.py:heavy_hitters): exact-count guarantee of
the Misra-Gries screen + recount pipeline, including a phi large enough
to force per-batch summary compression."""

from collections import Counter

import pyarrow.parquet as pq
import pytest

from probe_ray.ops.text import heavy_hitters

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact_counts():
    texts = (
        pq.read_table(f"{SF}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    c: Counter = Counter()
    for t in texts:
        c.update(t.split())
    return c, sum(c.values())


@pytest.mark.parametrize("phi", [0.001, 0.01])
def test_heavy_hitters_exact(ray_session, exact_counts, phi):
    import math

    c, n = exact_counts
    threshold = math.ceil(phi * n)
    want = sorted(
        ((t, m) for t, m in c.items() if m >= threshold),
        key=lambda x: (-x[1], x[0]),
    )
    got = heavy_hitters(SF, phi=phi).to_pylist()
    assert [(r["token"], r["cnt"]) for r in got] == want
    assert got, "vacuous: no heavy hitters at this phi"


def test_mg_compression_engages(ray_session, exact_counts):
    """phi=0.05 -> k=80 counters, far below any batch's vocabulary, so
    the (k+1)-th-count compression path runs; results stay exact."""
    import math

    c, n = exact_counts
    threshold = math.ceil(0.05 * n)
    want = sorted(
        ((t, m) for t, m in c.items() if m >= threshold),
        key=lambda x: (-x[1], x[0]),
    )
    got = heavy_hitters(SF, phi=0.05).to_pylist()
    assert [(r["token"], r["cnt"]) for r in got] == want
