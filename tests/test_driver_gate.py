"""Non-vacuity of the driver-visible fts_search gate.

Round-1 verdict: all 14 code-flavored fts_search_* CORRECTNESS rows
returned 0 rows (code queries vs the documents corpus), making the gate
vacuous. This suite mirrors the driver at sf0.001: every fts_search_*
entry except the explicit negative control must return rows, and both
query sets must be rank-identical to the scalar oracle over their own
corpus (code queries -> synthetic code table, doc queries -> documents
table)."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"
NEGATIVE_CONTROLS = {"fts_search_empty_result"}


@pytest.fixture(scope="module")
def entry_queries(ray_session):
    import __ray_entry__ as entrymod

    yield entrymod.queries()
    # release the cached readers' actor-pool CPUs back to later modules
    from probe_ray.ops import fts

    fts.close_readers()


def _fts_names():
    from probe_ray.ops.fts import BLOCK_QUERIES, DOC_QUERIES, REFERENCE_QUERIES

    return [
        f"fts_search_{n}"
        for n in list(REFERENCE_QUERIES) + list(DOC_QUERIES) + list(BLOCK_QUERIES)
    ] + ["fts_search_blocks_reranked"]


@pytest.mark.parametrize("name", _fts_names())
def test_fts_search_nonvacuous(entry_queries, name):
    t = entry_queries[name](SF_DIR)
    if name in NEGATIVE_CONTROLS:
        assert t.num_rows == 0, f"{name} is the negative control, got rows"
        return
    assert t.num_rows > 0, f"{name} returned 0 rows — vacuous gate"
    # result schema is stable: scored, identified docs / blocks
    cols = (
        ("score", "repo", "path", "start_line", "end_line", "node_type")
        if "blocks" in name
        else ("score", "repo", "path", "sha256")
    )
    for col in cols:
        assert col in t.column_names


def test_driver_window_structure():
    """The driver verifies only the first 50 queries() entries. Round 3
    silently evicted whole operator families from that window by
    inserting new entries at the top of the dict. Pin the window: exactly
    the explicit DRIVER_WINDOW list, 50 entries, all oracle-bearing, at
    least one per operator family — so any future insertion that shifts
    the window fails HERE, before the driver sees it."""
    import __ray_entry__ as entrymod

    window = list(entrymod.queries().keys())[:50]
    assert window == entrymod.DRIVER_WINDOW
    assert len(window) == len(set(window)) == 50
    oracle = set(entrymod.oracle_sql().keys())
    missing = [n for n in window if n not in oracle]
    assert not missing, f"non-oracle entries inside driver window: {missing}"
    families = {n.split("_")[0] for n in window}
    assert {
        "rel", "text", "fts", "dedup", "ann", "embedding", "export",
        "io", "multimodal",
    } <= families
    # every oracle-bearing entry outside the window is still covered by
    # tests/test_ops_oracle.py (which parametrizes ALL oracle keys), and
    # rows-only entries sort strictly after the oracle-bearing ones
    rest = list(entrymod.queries().keys())[50:]
    first_rows_only = next(
        (i for i, n in enumerate(rest) if n not in oracle), len(rest)
    )
    assert all(n not in oracle for n in rest[first_rows_only:]), (
        "oracle-bearing entry sorted after a rows-only entry"
    )


def test_every_query_shape_covered():
    """Each corpus' query set exercises every parser shape: single term,
    AND, OR, grouping, required, excluded, quoted-exact, quoted+negative."""
    from probe_ray.ops.fts import DOC_QUERIES, REFERENCE_QUERIES

    for qs in (REFERENCE_QUERIES, DOC_QUERIES):
        text = " ".join(qs.values())
        assert " AND " in text
        assert " OR " in text
        assert "(" in text and ")" in text
        assert "+" in text
        assert " -" in text or text.startswith("-")
        assert '"' in text
