"""dataset_topk contract: matches .sort().limit(k) including on empty
inputs (regression: an empty dataset must yield an empty result, not an
ArrowInvalid from sorting a schemaless concat)."""

import pyarrow as pa
import pytest

from probe_ray.ops.topk import dataset_topk


@pytest.fixture()
def rds(ray_session):
    import ray.data

    t = pa.table({"key": ["a", "b", "c", "d", "e"], "v": [3, 1, 4, 1, 5]})
    return ray.data.from_arrow(t)


def test_topk_matches_sort_limit(rds):
    got = dataset_topk(rds, [("v", "descending"), ("key", "ascending")], 3)
    rows = got.to_pandas()
    assert list(rows["key"]) == ["e", "c", "a"]
    assert list(rows["v"]) == [5, 4, 3]


def test_topk_tie_order(rds):
    got = dataset_topk(rds, [("v", "ascending"), ("key", "ascending")], 2)
    rows = got.to_pandas()
    assert list(rows["key"]) == ["b", "d"]


def test_topk_empty_input(ray_session):
    import ray.data

    empty = ray.data.from_arrow(
        pa.table({"key": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    )
    got = dataset_topk(empty, [("v", "descending")], 5)
    assert got.count() == 0


def test_topk_filtered_to_empty(ray_session):
    import ray.data

    t = pa.table({"key": ["a", "b"], "v": [1, 2]})
    empty = ray.data.from_arrow(t).filter(expr="v > 100")
    got = dataset_topk(empty, [("v", "descending")], 5)
    assert got.count() == 0
