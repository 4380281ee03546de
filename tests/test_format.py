"""Formatter + limiter conformance (search/format.py).

XML output is validated with a port of the reference's own validator
(tests/xml_schema_validation_tests.rs:100-183: probe_results root,
required summary{count,total_bytes,total_tokens}, and per-result
file/lines/node_type/code). apply_limits is pinned to
search_limiter.rs:22-226 semantics: rank order, stop at the first
result that would cross any limit, remainder reported as skipped."""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import pyarrow as pa
import pytest

from probe_ray.search.format import (
    apply_limits,
    count_tokens,
    escape_xml,
    format_json,
    format_markdown,
    format_results,
    format_xml,
    rows_from_table,
)


def validate_xml_structure(xml_str: str) -> None:
    """Port of the reference's validate_xml_structure."""
    root = ET.fromstring(xml_str)
    assert root.tag == "probe_results"
    summary = root.find("summary")
    assert summary is not None, "missing summary"
    for el in ("count", "total_bytes", "total_tokens"):
        assert summary.find(el) is not None, f"missing summary/{el}"
    for result in root.findall("result"):
        for el in ("file", "lines", "node_type", "code"):
            assert result.find(el) is not None, f"missing result/{el}"


def _block_table():
    return pa.table(
        {
            "score": pa.array([2.5, 1.25], pa.float64()),
            "bm25": pa.array([1.25, 1.25], pa.float64()),
            "repo": pa.array(["org/r1", "org/r2"], pa.string()),
            "path": pa.array(["src/a.rs", "src/b.py"], pa.string()),
            "start_line": pa.array([3, 1], pa.int64()),
            "end_line": pa.array([9, 5], pa.int64()),
            "node_type": pa.array(["function", "comment"], pa.string()),
            "block_unique_terms": pa.array([2, 1], pa.int64()),
            "code": pa.array(
                ["fn a() {\n  <b> & 'c'\n}", "# doc\nx = 1"], pa.string()
            ),
        }
    )


def _file_table():
    return pa.table(
        {
            "rank": pa.array([1, 2], pa.int64()),
            "score": pa.array([3.5, 2.0], pa.float64()),
            "repo": pa.array(["org/r1", "org/r2"], pa.string()),
            "path": pa.array(["src/a.rs", "src/b.py"], pa.string()),
            "sha256": pa.array(["x", "y"], pa.string()),
        }
    )


def test_xml_valid_and_escaped():
    xml = format_xml(rows_from_table(_block_table()))
    validate_xml_structure(xml)
    # special chars escaped outside CDATA, raw inside CDATA
    assert "<![CDATA[fn a() {\n  <b> & 'c'\n}]]>" in xml
    assert "<lines>3-9</lines>" in xml


def test_xml_cdata_injection_safe():
    t = _block_table().set_column(
        8, "code", pa.array(["evil ]]> injection", "x"], pa.string())
    )
    xml = format_xml(rows_from_table(t))
    root = ET.fromstring(xml)
    assert root.findall("result")[0].find("code").text == "evil ]]> injection"


def test_xml_file_results_without_code():
    xml = format_xml(rows_from_table(_file_table()))
    validate_xml_structure(xml)


def test_escape_xml():
    assert escape_xml("<a & 'b' \"c\">") == "&lt;a &amp; &apos;b&apos; &quot;c&quot;&gt;"


def test_markdown_layout():
    md = format_markdown(rows_from_table(_block_table()))
    assert "File: org/r1/src/a.rs" in md
    assert "Lines: 3-9" in md
    assert "```rs" in md and "```py" in md
    # dry run: headers only
    dry = format_markdown(rows_from_table(_block_table()), dry_run=True)
    assert "```" not in dry and "Lines: 3-9" in dry


def test_json_wrapper():
    out = json.loads(format_json(rows_from_table(_block_table())))
    assert out["summary"]["count"] == 2
    assert out["summary"]["total_bytes"] == sum(
        len(c.encode()) for c in _block_table().column("code").to_pylist()
    )
    assert "version" in out
    assert out["results"][0]["file"] == "org/r1/src/a.rs"
    assert out["results"][0]["lines"] == [3, 9]


def test_format_results_dispatch():
    t = _block_table()
    for fmt in ("terminal", "markdown", "plain", "json", "xml", "color"):
        assert format_results(t, fmt)


# --- apply_limits (search_limiter.rs) --------------------------------------


def _rows(codes):
    return [
        {"rank": i + 1, "code": c, "file": f"f{i}", "lines": (1, 1),
         "node_type": "code", "score": 1.0}
        for i, c in enumerate(codes)
    ]


def test_limits_none_is_passthrough():
    rows = _rows(["a", "b"])
    kept, skipped, limits = apply_limits(rows)
    assert kept == rows and skipped == [] and limits is None


def test_max_results():
    kept, skipped, limits = apply_limits(_rows(["a", "b", "c"]), max_results=2)
    assert [r["file"] for r in kept] == ["f0", "f1"]
    assert [r["file"] for r in skipped] == ["f2"]
    assert limits["total_bytes"] == 2


def test_max_bytes_stops_at_first_crossing():
    # 4+4 bytes fit in 10; third (4) would cross -> skipped, as is the
    # fourth even though it alone would fit (early termination, no
    # backfilling — search_limiter.rs:135-146)
    kept, skipped, _ = apply_limits(
        _rows(["aaaa", "bbbb", "cccc", "d"]), max_bytes=10
    )
    assert [r["file"] for r in kept] == ["f0", "f1"]
    assert [r["file"] for r in skipped] == ["f2", "f3"]


def test_max_tokens():
    rows = _rows(["one two three", "four five", "six"])
    assert count_tokens("one two three") == 3
    kept, skipped, limits = apply_limits(rows, max_tokens=5)
    assert [r["file"] for r in kept] == ["f0", "f1"]
    assert limits["total_tokens"] == 5
    assert [r["file"] for r in skipped] == ["f2"]


def test_limits_rank_order_respected():
    rows = list(reversed(_rows(["a", "b", "c"])))  # ranks 3,2,1 in list
    kept, _, _ = apply_limits(rows, max_results=1)
    assert kept[0]["rank"] == 1


# --- CLI drive through the new surfaces ------------------------------------


@pytest.fixture(scope="module")
def corpus_and_index(ray_session, small_corpus, built_index):
    return small_corpus, built_index[0]


def test_cli_search_xml(corpus_and_index, capsys):
    from probe_ray.cli import main

    corpus, idx = corpus_and_index
    rc = main(
        ["search", "--index", idx, "error AND handling",
         "--format", "xml", "--corpus", corpus, "-k", "3"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    validate_xml_structure(out)
    # code attached from the corpus: non-empty CDATA
    assert "<![CDATA[" in out


def test_cli_search_blocks_markdown(corpus_and_index, capsys):
    from probe_ray.cli import main

    corpus, idx = corpus_and_index
    rc = main(
        ["search", "--index", idx, "error AND handling", "--blocks",
         "--corpus", corpus, "--format", "markdown", "-k", "3"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Lines: " in out and "```" in out


def test_cli_search_max_bytes(corpus_and_index, capsys):
    from probe_ray.cli import main

    corpus, idx = corpus_and_index
    rc = main(
        ["search", "--index", idx, "error", "--corpus", corpus,
         "--format", "json", "--max-bytes", "1"]
    )
    assert rc == 0
    captured = capsys.readouterr()
    out = json.loads(captured.out)
    assert out["summary"]["count"] == 0  # every file > 1 byte
    assert "limits applied" in captured.err


def test_cli_extract(corpus_and_index, capsys):
    import pyarrow.dataset as pads

    from probe_ray.cli import main

    corpus, idx = corpus_and_index
    path0 = (
        pads.dataset(corpus).to_table(columns=["path"]).column("path").to_pylist()[0]
    )
    rc = main(
        ["extract", f"{path0}:1-2", "--corpus", corpus, "--format", "json"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["summary"]["count"] == 1
    assert out["results"][0]["node_type"] == "range"
    assert out["results"][0]["lines"] == [1, 2]


def test_no_token_limit_overrun_on_symbol_heavy_code():
    """The reference's 4-bytes/token estimation can overrun the budget on
    compressed/symbol-heavy code (its own test_token_limiter_failures.rs
    documents overruns). Our apply_limits always counts precisely, so the
    kept set NEVER exceeds max_tokens — the documented divergence is a
    strict improvement, pinned here."""
    dense = "x=1;y=2;z=(a+b)*c;" * 40  # ~3 tokens per 2 bytes
    rows = _rows([dense, dense, dense, "plain words here"])
    for budget in (10, 50, 100, 200, 1000):
        kept, _, limits = apply_limits(rows, max_tokens=budget)
        assert limits["total_tokens"] <= budget, budget
        assert sum(count_tokens(r["code"]) for r in kept) <= budget
