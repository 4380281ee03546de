"""Post-rank block merging + block-AST filtering pinned to the
reference's test suites. Case-by-case status map:
tests/fixtures/ast_block_cases.md (VERDICT round-3 item 7).

Reference semantics under test:
  - merge_ranked_blocks (src/search/block_merging.rs:18-168): per-file
    greedy fixed-point merge of overlapping / within-threshold ranked
    blocks; score = max, unique_terms = max, node_type from the
    higher-ranked block; gap fill / placeholder content rules.
  - filter_code_block_with_ast (tests/block_filtering_with_ast_tests.rs):
    the query AST evaluated per block (negation, required, nesting).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from probe_ray.query.bm25 import create_query_plan
from probe_ray.search.blocks import (
    filter_tokenized_block,
    merge_ranked_blocks,
)

COLS = (
    "score", "bm25", "repo", "path", "start_line", "end_line",
    "node_type", "block_unique_terms", "code",
)


def _tbl(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "score": pa.array([r["score"] for r in rows], pa.float64()),
            "bm25": pa.array([r.get("bm25", r["score"]) for r in rows], pa.float64()),
            "repo": pa.array([r.get("repo", "r") for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "start_line": pa.array([r["lines"][0] for r in rows], pa.int64()),
            "end_line": pa.array([r["lines"][1] for r in rows], pa.int64()),
            "node_type": pa.array(
                [r.get("node_type", "function") for r in rows], pa.string()
            ),
            "block_unique_terms": pa.array(
                [r.get("unique", 1) for r in rows], pa.int64()
            ),
            "code": pa.array([r["code"] for r in rows], pa.string()),
        }
    )


# --- block_merging_tests.rs:10 test_merge_ranked_blocks --------------------


def test_merge_ranked_blocks_reference_case():
    """3 blocks -> 2: the two adjacent test_file.rs blocks (1,5)+(6,10)
    merge to (1,10) with score = max(0.9, 0.8) and unique_terms >= 2;
    the other_file.rs block is preserved as-is."""
    t = _tbl(
        [
            {
                "score": 0.9, "path": "test_file.rs", "lines": (1, 5),
                "unique": 2,
                "code": "fn test_function() {\n    let x = 1;\n    let y = 2;\n    println!(\"{}\", x + y);\n}",
            },
            {
                "score": 0.8, "path": "test_file.rs", "lines": (6, 10),
                "unique": 2,
                "code": "fn another_function() {\n    let z = 3;\n    let result = z * 2;\n    println!(\"{}\", result);\n}",
            },
            {
                "score": 0.7, "path": "other_file.rs", "lines": (1, 5),
                "unique": 1,
                "code": "fn other_function() {\n    let a = 10;\n    let b = 20;\n    println!(\"{}\", a + b);\n}",
            },
        ]
    )
    got = merge_ranked_blocks(t, threshold=5)
    assert got.num_rows == 2
    rows = {r["path"]: r for r in got.to_pylist()}
    merged = rows["test_file.rs"]
    assert (merged["start_line"], merged["end_line"]) == (1, 10)
    assert merged["score"] == 0.9
    assert merged["block_unique_terms"] >= 2
    # content is the line-map union of the two adjacent blocks
    assert merged["code"].startswith("fn test_function()")
    assert "fn another_function()" in merged["code"]
    preserved = rows["other_file.rs"]
    assert (preserved["start_line"], preserved["end_line"]) == (1, 5)
    assert preserved["score"] == 0.7


def test_merge_ranked_single_block_per_file_untouched():
    t = _tbl(
        [
            {"score": 0.5, "path": "a.rs", "lines": (3, 9), "code": "x"},
            {"score": 0.4, "path": "b.rs", "lines": (1, 2), "code": "y"},
        ]
    )
    got = merge_ranked_blocks(t, threshold=5)
    assert got.num_rows == 2
    assert sorted(got.column("path").to_pylist()) == ["a.rs", "b.rs"]


# --- complex_block_merging_tests.rs ----------------------------------------


def test_comment_function_adjacency():
    """A comment within 2x threshold of a function merges (the relaxed
    comment rule); two functions at the same distance do not. node_type
    comes from the higher-ranked (earlier) row."""
    comment_fn = _tbl(
        [
            {
                "score": 0.9, "path": "a.rs", "lines": (20, 24),
                "node_type": "function", "code": "fn f() {\n1\n2\n3\n}",
            },
            {
                "score": 0.5, "path": "a.rs", "lines": (10, 11),
                "node_type": "block_comment", "code": "// doc\n// more",
            },
        ]
    )
    got = merge_ranked_blocks(comment_fn, threshold=4)  # gap 8 <= 2*4
    assert got.num_rows == 1
    r = got.to_pylist()[0]
    assert (r["start_line"], r["end_line"]) == (10, 24)
    assert r["node_type"] == "function"  # rank-0 row wins
    fn_fn = _tbl(
        [
            {
                "score": 0.9, "path": "a.rs", "lines": (20, 24),
                "node_type": "function", "code": "fn f() {\n1\n2\n3\n}",
            },
            {
                "score": 0.5, "path": "a.rs", "lines": (10, 11),
                "node_type": "function", "code": "fn g() {\n}",
            },
        ]
    )
    assert merge_ranked_blocks(fn_fn, threshold=4).num_rows == 2


def test_gap_fill_and_placeholders():
    """Small (<10 line) gaps fill from file content when available, else
    emit the reference's 'should be included' placeholder; >=10-line
    gaps always emit the 'skipped' placeholder."""
    t = _tbl(
        [
            {"score": 0.9, "path": "a.rs", "lines": (1, 2), "code": "l1\nl2"},
            {"score": 0.8, "path": "a.rs", "lines": (8, 9), "code": "l8\nl9"},
        ]
    )
    # no content: placeholder for the 5-line gap (3-7)
    got = merge_ranked_blocks(t, threshold=20).to_pylist()[0]
    assert "... lines 3-7 should be included ..." in got["code"]
    # with content: actual lines 3-7
    content = "\n".join(f"l{i}" for i in range(1, 13))
    got2 = merge_ranked_blocks(
        t, threshold=20, content_of={("r", "a.rs"): content}
    ).to_pylist()[0]
    assert "l5" in got2["code"] and "should be included" not in got2["code"]
    assert got2["code"] == "\n".join(f"l{i}" for i in range(1, 10))
    # large gap: skipped placeholder even with content
    big = _tbl(
        [
            {"score": 0.9, "path": "a.rs", "lines": (1, 2), "code": "l1\nl2"},
            {"score": 0.8, "path": "a.rs", "lines": (40, 41), "code": "l40\nl41"},
        ]
    )
    got3 = merge_ranked_blocks(
        big, threshold=50, content_of={("r", "a.rs"): content}
    ).to_pylist()[0]
    assert "... lines 3-39 skipped..." in got3["code"]


def test_overlapping_blocks_union():
    """Overlapping ranges union; shared lines keep the higher-ranked
    block's text (first-writer wins in the line map)."""
    t = _tbl(
        [
            {"score": 0.9, "path": "a.rs", "lines": (1, 4), "code": "a1\na2\na3\na4"},
            {"score": 0.8, "path": "a.rs", "lines": (3, 6), "code": "b3\nb4\nb5\nb6"},
        ]
    )
    got = merge_ranked_blocks(t, threshold=0).to_pylist()
    assert len(got) == 1
    r = got[0]
    assert (r["start_line"], r["end_line"]) == (1, 6)
    assert r["code"] == "a1\na2\na3\na4\nb5\nb6"


def test_fixed_point_multi_group():
    """Chained adjacency merges transitively (fixed point), while a far
    block in the same file stays its own group."""
    t = _tbl(
        [
            {"score": 0.9, "path": "a.rs", "lines": (1, 3), "code": "1\n2\n3"},
            {"score": 0.8, "path": "a.rs", "lines": (5, 7), "code": "5\n6\n7"},
            {"score": 0.7, "path": "a.rs", "lines": (9, 11), "code": "9\n10\n11"},
            {"score": 0.6, "path": "a.rs", "lines": (100, 102), "code": "x\ny\nz"},
        ]
    )
    got = merge_ranked_blocks(t, threshold=1)
    assert got.num_rows == 2
    spans = sorted(
        zip(got.column("start_line").to_pylist(), got.column("end_line").to_pylist())
    )
    assert spans == [(1, 11), (100, 102)]


# --- block_filtering_with_ast_tests.rs AST cases ---------------------------


def _block_matches(text: str, query: str) -> bool:
    from probe_ray.tokenize.tokenizer import tokenize

    plan = create_query_plan(query)
    return filter_tokenized_block(tokenize(text, plan.special_terms), plan)


def test_block_merge_filter_and_one_term():
    assert _block_matches("ip whitelist config", "ip AND whitelist")
    assert not _block_matches("ip only here", "ip AND whitelist")


def test_block_merge_filter_or_cases():
    assert _block_matches("ip here", "ip OR port")
    assert _block_matches("port here", "ip OR port")
    assert _block_matches("ip and port", "ip OR port")
    assert not _block_matches("nothing relevant", "ip OR port")


def test_negation_query_pinned():
    q = "(ip OR port) AND whitelist AND -denylist"
    assert _block_matches("ip whitelist", q)
    assert _block_matches("port whitelist extra", q)
    assert not _block_matches("ip whitelist denylist", q)
    assert not _block_matches("ip denylist", q)
    assert not _block_matches("whitelist only", q)


def test_required_terms_pinned():
    q = "+ip +whitelist +security"
    assert _block_matches("ip whitelist security", q)
    assert not _block_matches("ip whitelist", q)
    assert not _block_matches("whitelist security", q)


def test_nested_expressions_pinned():
    q = "ip AND (whitelist OR (security AND firewall))"
    assert _block_matches("ip whitelist", q)
    assert _block_matches("ip security firewall", q)
    assert not _block_matches("ip security", q)  # inner AND incomplete
    assert not _block_matches("whitelist security firewall", q)  # no ip
    assert not _block_matches("ip only", q)


# --- integration through search_blocks -------------------------------------


@pytest.fixture(scope="module")
def reader(built_index):
    from probe_ray.search.searcher import IndexReader

    rd = IndexReader(built_index[0])
    yield rd
    rd.close()


def test_search_blocks_merge_integration(ray_session, reader, small_corpus):
    """block_merging_tests.rs:163/:278 analog: with merging on, per-file
    result counts are <= the unmerged counts; merged ranges never
    overlap within a file; every result keeps the stable schema."""
    from collections import Counter

    from probe_ray.search.blocks import search_blocks

    q = "error AND handling"
    plain = search_blocks(reader, small_corpus, q, k=10)
    merged = search_blocks(reader, small_corpus, q, k=10, merge_threshold=20)
    assert plain.num_rows > 0 and merged.num_rows > 0
    assert merged.num_rows <= plain.num_rows
    for col in COLS:
        assert col in merged.column_names
    pc_ = Counter(plain.column("path").to_pylist())
    mc = Counter(merged.column("path").to_pylist())
    for path, n in mc.items():
        assert n <= pc_.get(path, 0) or path not in pc_
    # no overlapping ranges within a file after the merge pass
    by_file: dict[str, list[tuple[int, int]]] = {}
    for r in merged.to_pylist():
        by_file.setdefault(r["path"], []).append(
            (r["start_line"], r["end_line"])
        )
    for spans in by_file.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2, f"overlap after merge: {(s1, e1)} {(s2, e2)}"


def test_no_merge_flag_analog(ray_session, reader, small_corpus):
    """merge_threshold=None (the no_merge flag) leaves the ranked table
    exactly as ranked."""
    from probe_ray.search.blocks import search_blocks

    a = search_blocks(reader, small_corpus, "error AND handling", k=10)
    b = search_blocks(
        reader, small_corpus, "error AND handling", k=10, merge_threshold=None
    )
    assert a.equals(b)
