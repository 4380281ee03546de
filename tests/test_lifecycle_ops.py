"""Driver-visible index-lifecycle pipelines (ops/fts.py): the sharded
federation entry re-asserts merged-top-k == monolithic live inside the
op; the upsert entry re-asserts exactly-the-new-versions visibility.
These tests drive both at sf0.001 and pin output shape + determinism."""

import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _cleanup(ray_session):
    yield
    from probe_ray.ops import fts

    fts.close_readers()


def test_federated_search_op(ray_session):
    from probe_ray.ops import fts

    t = fts.fts_federated_search(SF)
    assert t.num_rows > 0
    assert set(t.column_names) >= {"qname", "rank", "score", "repo", "path"}
    assert set(t.column("qname").to_pylist()) == set(fts.FEDERATED_QUERIES)
    # repeat is deterministic (cached member indexes, warm readers)
    assert t.equals(fts.fts_federated_search(SF))


def test_upsert_lifecycle_op(ray_session):
    from probe_ray.ops import fts

    t = fts.fts_upsert_lifecycle(SF)
    assert t.num_rows == 3  # two rewrites + one insert, nothing else
    assert "brand/new_upserted.py" in t.column("path").to_pylist()
    assert t.equals(fts.fts_upsert_lifecycle(SF))


def test_compact_lifecycle_op(ray_session):
    from probe_ray.ops import fts

    t = fts.fts_compact_lifecycle(SF)
    assert t.num_rows == 3
    # identical visibility to the tombstone-masked federation is
    # asserted inside the op; here pin the shape and determinism
    assert t.equals(fts.fts_compact_lifecycle(SF))
