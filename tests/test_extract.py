"""`probe extract` analog conformance (search/extract.py).

Spec parsing pinned against file_paths.rs:732-1000 behavior; extraction
semantics (clamping, context windows, symbol text-search fallback)
pinned against processor.rs:84-380 and symbol_finder.rs:525-650;
distributed extraction checked against direct string slicing of the
same corpus rows."""

from __future__ import annotations

import glob
import os

import pytest

from probe_ray.search.extract import (
    ExtractSpec,
    extract_from_content,
    parse_extract_spec,
)

PARSE_CASES = [
    ("src/main.rs", ExtractSpec("src/main.rs")),
    ("src/main.rs:10", ExtractSpec("src/main.rs", 10, None)),
    ("src/main.rs:5-20", ExtractSpec("src/main.rs", 5, 20)),
    ("src/main.rs#handle_request", ExtractSpec("src/main.rs", symbol="handle_request")),
    ("src/app.py#Class.method", ExtractSpec("src/app.py", symbol="Class.method")),
    # quote/backtick stripping (file_paths.rs:737-750)
    ("`src/main.rs:10`", ExtractSpec("src/main.rs", 10, None)),
    ('"src/main.rs"', ExtractSpec("src/main.rs")),
    ("'src/main.rs'", ExtractSpec("src/main.rs")),
    # trailing colon with no spec => file only
    ("src/main.rs:", ExtractSpec("src/main.rs")),
    # non-numeric spec after colon (e.g. grep output junk) => file only
    ("src/main.rs:foo", ExtractSpec("src/main.rs")),
    ("", None),
]


@pytest.mark.parametrize("text,expected", PARSE_CASES)
def test_parse_extract_spec(text, expected):
    assert parse_extract_spec(text) == expected, text


CONTENT = "alpha one\nbeta two\ngamma three\ndelta four\nepsilon five"


def test_extract_whole_file():
    got = extract_from_content(ExtractSpec("f"), CONTENT)
    assert got == (1, 5, "file", CONTENT)


def test_extract_range_and_clamping():
    got = extract_from_content(ExtractSpec("f", 2, 4), CONTENT)
    assert got == (2, 4, "range", "beta two\ngamma three\ndelta four")
    # out-of-range clamps (processor.rs:84-105), never errors
    assert extract_from_content(ExtractSpec("f", 4, 99), CONTENT) == (
        4, 5, "range", "delta four\nepsilon five",
    )
    assert extract_from_content(ExtractSpec("f", 99, 120), CONTENT)[:2] == (5, 5)


def test_extract_single_line_context():
    assert extract_from_content(ExtractSpec("f", 3, None), CONTENT, 0) == (
        3, 3, "context", "gamma three",
    )
    assert extract_from_content(ExtractSpec("f", 3, None), CONTENT, 1) == (
        2, 4, "context", "beta two\ngamma three\ndelta four",
    )
    # context clamps at file edges (processor.rs:341-346)
    assert extract_from_content(ExtractSpec("f", 1, None), CONTENT, 2)[:2] == (1, 3)
    assert extract_from_content(ExtractSpec("f", 5, None), CONTENT, 2)[:2] == (3, 5)


def test_extract_symbol_text_search():
    got = extract_from_content(ExtractSpec("f", symbol="gamma"), CONTENT, 1)
    assert got == (2, 4, "text_search", "beta two\ngamma three\ndelta four")
    # nested symbol: line must contain all dot-parts (symbol_finder.rs:538-545)
    got = extract_from_content(ExtractSpec("f", symbol="delta.four"), CONTENT, 0)
    assert got == (4, 4, "text_search", "delta four")
    assert extract_from_content(ExtractSpec("f", symbol="nope"), CONTENT) is None


def test_distributed_extract_matches_slicing(ray_session, small_corpus, corpus_rows):
    from probe_ray.search.extract import extract

    files = sorted(glob.glob(os.path.join(small_corpus, "*.parquet")))
    paths = corpus_rows.column("path").to_pylist()
    contents = corpus_rows.column("content").to_pylist()
    p0, p1 = paths[0], paths[1]
    got = extract(files, [f"{p0}:2-3", p1, f"{p0}#salt"], context_lines=1)
    rows = {r["spec"]: r for r in got.to_pylist()}
    c0 = contents[0].split("\n")
    assert rows[f"{p0}:2-3"]["code"] == "\n".join(c0[1:3])
    assert rows[f"{p0}:2-3"]["node_type"] == "range"
    assert rows[p1]["code"] == contents[1]
    assert rows[p1]["node_type"] == "file"
    sym = rows[f"{p0}#salt"]
    salt_line = next(i + 1 for i, ln in enumerate(c0) if "salt" in ln)
    assert sym["start_line"] == max(1, salt_line - 1)
    assert sym["node_type"] == "text_search"


def test_extract_test_file_filtering(ray_session, small_corpus):
    from probe_ray.search.extract import extract

    files = sorted(glob.glob(os.path.join(small_corpus, "*.parquet")))
    # a spec naming a test-path is dropped when allow_tests=False
    got = extract(files, ["tests/foo_test.rs:1"], allow_tests=False)
    assert got.num_rows == 0


# --- free-text + git-diff spec extraction (file_paths.rs:76-700) ------------


def test_parse_specs_from_text():
    from probe_ray.search.extract import parse_specs_from_text

    text = """Error in `src/main.rs:42` and also see 'lib/util.py:5-20'.
    Check **src/app.js#handleClick** and plain path/to/mod.go too.
    Compiler said foo/bar.c:10:7: warning. Not-a-path: hello world.
    src/main.rs:99 appears again but duplicates collapse."""
    got = parse_specs_from_text(text)
    by_path = {s.path: s for s in got}
    assert by_path["src/main.rs"] == ExtractSpec("src/main.rs", 42, None)
    assert by_path["lib/util.py"] == ExtractSpec("lib/util.py", 5, 20)
    assert by_path["src/app.js"] == ExtractSpec("src/app.js", symbol="handleClick")
    assert by_path["path/to/mod.go"] == ExtractSpec("path/to/mod.go")
    # line:col keeps the line, drops the column
    assert by_path["foo/bar.c"] == ExtractSpec("foo/bar.c", 10, None)
    assert len(got) == 5  # dedup by path, no junk matches


def test_parse_specs_from_text_test_filter():
    from probe_ray.search.extract import parse_specs_from_text

    got = parse_specs_from_text("see tests/foo_test.rs:3", allow_tests=False)
    assert got == []


DIFF = """diff --git a/src/alpha.rs b/src/alpha.rs
index 111..222 100644
--- a/src/alpha.rs
+++ b/src/alpha.rs
@@ -10,4 +10,5 @@ fn alpha() {
 context line
+added line at 11
 another context
+added line at 13
 tail
@@ -30 +40 @@
-removed
+added line at 40
diff --git a/src/beta.py b/src/beta.py
--- a/src/beta.py
+++ b/src/beta.py
@@ -1,2 +1,3 @@
 keep
+added at 2
"""


def test_parse_specs_from_git_diff():
    from probe_ray.search.extract import is_git_diff_format, parse_specs_from_git_diff

    assert is_git_diff_format(DIFF)
    got = parse_specs_from_git_diff(DIFF)
    assert got == [
        ExtractSpec("src/alpha.rs", 11, 40),  # min..max changed new lines
        ExtractSpec("src/beta.py", 2, 2),
    ]


def test_cli_extract_from_text(ray_session, small_corpus, corpus_rows, capsys, tmp_path):
    import json

    from probe_ray.cli import main

    path0 = corpus_rows.column("path").to_pylist()[0]
    note = tmp_path / "note.txt"
    note.write_text(f"please look at {path0}:1-2 for the bug")
    rc = main(
        ["extract", "--corpus", small_corpus, "--from-text", str(note),
         "--format", "json"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["summary"]["count"] == 1
    assert out["results"][0]["lines"] == [1, 2]
