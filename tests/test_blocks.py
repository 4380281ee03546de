"""Block extraction + ranking conformance.

Pinned fixtures:
  - filter_tokenized_block cases from
    reference tests/tokenized_block_filtering_tests.rs
  - determine_fallback_node_type rule table from
    reference src/search/file_processing.rs:358-422
  - window merging thresholds from file_processing.rs:568-648
  - test-file patterns from file_list_cache.rs:227-260

Rank identity: the distributed search_blocks pipeline (index-guided
candidates -> map_batches extraction -> re-rank) must equal the pure
scalar oracle (rank_files candidates -> sequential extraction -> same
re-rank) on the synthetic code corpus — same blocks, same order, same
f64 scores."""

from __future__ import annotations

import pytest

from probe_ray.query.bm25 import create_query_plan
from probe_ray.search.blocks import (
    determine_fallback_node_type,
    extract_blocks,
    filter_tokenized_block,
    is_test_file,
    merge_context_windows,
    node_type_boost,
)

# --- filter_tokenized_block pinned cases (tokenized_block_filtering_tests.rs)

FILTER_CASES = [
    (["ip", "whitelist", "config"], "ip AND whitelist", True),
    (["ip", "whitelist", "config"], "ip OR port", True),
    (["ip", "whitelist", "config"], "(ip OR port) AND config", True),
    (["ip", "whitelist", "config"], "ip -test", True),
    (["ip", "whitelist", "test"], "ip -test", False),
    (
        ["ip", "whitelist", "config", "server"],
        "(ip OR port) AND (whitelist OR config) -test",
        True,
    ),
    (["port", "server"], "(ip OR port) AND (whitelist OR config) -test", False),
    ([], "ip AND whitelist", False),
]


@pytest.mark.parametrize("tokens,query,expected", FILTER_CASES)
def test_filter_tokenized_block_pinned(tokens, query, expected):
    plan = create_query_plan(query)
    assert filter_tokenized_block(tokens, plan) is expected, (tokens, query)


# --- determine_fallback_node_type rule table -------------------------------

NODE_TYPE_CASES = [
    ("// a comment", "rs", "comment"),
    ("# python comment", "py", "comment"),
    ("# not a comment in rust", "rs", "code"),
    ('"""docstring', "py", "comment"),
    ("fn handle_request(x: u32) {", "rs", "function"),
    ("func main() {", "go", "function"),
    ("function doThing() {", "js", "function"),
    ("def process(data):", "py", "function"),
    ("public void run()", "java", "function"),
    ("class Foo:", "py", "class"),
    ("struct Point {", "rs", "class"),
    ("enum Color {", "js", "class"),
    ("import os", "py", "import"),
    ("use std::fs;", "rs", "import"),
    ("#include <stdio.h>", "c", "import"),
    ("let x = 1;", "rs", "variable_declaration"),
    ("total = a + b", "py", "variable_declaration"),
    ("x == y", "py", "code"),
    ("if x > 0 {", "rs", "control_flow"),
    ("while running:", "py", "control_flow"),
    ("return value;", "rs", "code"),
]


@pytest.mark.parametrize("line,ext,expected", NODE_TYPE_CASES)
def test_fallback_node_type(line, ext, expected):
    assert determine_fallback_node_type(line, ext) == expected, line


def test_fallback_rule_order():
    # comment wins over function ("// fn foo()" is a comment);
    # function wins over variable_declaration ("fn f() { x = 1 }" has '=')
    assert determine_fallback_node_type("// fn foo()", "rs") == "comment"
    assert determine_fallback_node_type("fn f(x) { let y = x }", "rs") == "function"


# --- window merging --------------------------------------------------------


def test_merge_few_windows_threshold_1():
    # <=5 windows: merge only overlapping/adjacent (threshold 1)
    w = merge_context_windows([10, 40], 100)
    assert w == [([10], 5, 15), ([40], 35, 45)]
    # overlapping windows merge
    w = merge_context_windows([10, 14], 100)
    assert w == [([10, 14], 5, 19)]
    # gap of exactly threshold merges: [5,15] and [16,26] are adjacent
    w = merge_context_windows([10, 21], 100)
    assert w == [([10, 21], 5, 26)]


def test_merge_clamps_to_file():
    assert merge_context_windows([1], 3) == [([1], 1, 3)]
    assert merge_context_windows([3], 3) == [([3], 1, 3)]


def test_merge_many_windows_aggressive():
    # merge condition: next_start <= cur_end + threshold, i.e. spacing
    # l2-l1 <= 2*context + threshold
    # 6 windows -> threshold context+1=6; spacing 16 merges (16 <= 16)
    lines = [10, 26, 42, 58, 74, 90]
    w = merge_context_windows(lines, 200)
    assert len(w) == 1 and w[0][0] == lines
    # 11 windows -> threshold context+3=8; spacing 18 merges (18 <= 18)
    lines11 = list(range(10, 10 + 11 * 18, 18))
    w = merge_context_windows(lines11, 1000)
    assert len(w) == 1
    # the same spacing with only 6 windows (threshold 6): 18 > 16 -> all
    # separate — the dynamic threshold is observable
    w = merge_context_windows(lines11[:6], 1000)
    assert len(w) == 6


# --- test-file detection ----------------------------------------------------


@pytest.mark.parametrize(
    "path,expected",
    [
        ("src/lib_test.rs", True),
        ("src/test_util.py", True),
        ("src/app.spec.ts", True),
        ("pkg/tests/helper.go", True),
        ("pkg/__tests__/x.js", True),
        ("src/FooTest.java", True),
        ("src/contest.rs", False),
        ("src/main.rs", False),
        ("src/testing.py", False),
    ],
)
def test_is_test_file(path, expected):
    assert is_test_file(path) is expected, path


def test_extract_skips_test_context():
    plan = create_query_plan("keyword")
    content = "#[test]\nfn test_keyword_thing() {\n  keyword\n}\n"
    assert extract_blocks("r", "src/a.rs", content, plan, allow_tests=False) == []
    got = extract_blocks("r", "src/a.rs", content, plan, allow_tests=True)
    assert len(got) == 1


# Fixtures mirroring the reference's tests/mocks behavior: filenames like
# test_ip_whitelist.go / test_object.js do NOT match the allow_tests=false
# ignore set (Go test files are *_test.go, JS are *.spec/.test.*), so the
# files participate; only blocks flagged by the per-language is_test_node
# analogs are filtered.
def test_go_mock_like_file_not_excluded_by_name():
    assert is_test_file("mocks/test_ip_whitelist.go") is False
    assert is_test_file("mocks/test_object.js") is False
    assert is_test_file("pkg/ip_test.go") is True
    assert is_test_file("web/app.test.js") is True


def test_go_test_function_detection():
    """go.rs:45-66 analog: func Test*( is a test node; a method on a
    receiver and a non-Test function are not."""
    plan = create_query_plan("whitelist")
    non_test = (
        "package middleware\n\n"
        "// checks if the client IP is in the whitelist\n"
        "type WhitelistGuard struct {\n\tWhitelist []string\n}\n\n"
        "func (g *WhitelistGuard) Name() string {\n"
        '\treturn "whitelist"\n}\n'
    )
    got = extract_blocks("r", "mw/test_guard.go", non_test, plan, allow_tests=False)
    assert len(got) >= 1  # no test node -> survives exclude-tests
    test_fn = "package mw\n\nfunc TestWhitelist(t *testing.T) {\n\twhitelist()\n}\n"
    assert extract_blocks("r", "mw/guard.go", test_fn, plan, allow_tests=False) == []
    # but the same content is kept when tests are allowed
    assert len(extract_blocks("r", "mw/guard.go", test_fn, plan, allow_tests=True)) == 1


def test_js_test_call_detection():
    """javascript.rs:51-95 analog: describe/it/test/expect calls and
    test-named function definitions flag the window; plain JS survives."""
    plan = create_query_plan("display")
    plain = (
        "// display user info\n"
        "function displayUser(user) {\n"
        "  console.log(user.display);\n}\n"
    )
    assert len(extract_blocks("r", "web/test_obj.js", plain, plan, allow_tests=False)) == 1
    suite = (
        'describe("display", () => {\n'
        '  it("renders display", () => { expect(display()).toBe(1); });\n'
        "});\n"
    )
    assert extract_blocks("r", "web/obj.js", suite, plan, allow_tests=False) == []
    named = "const displayTestHarness = (x) => display(x);\n"
    assert extract_blocks("r", "web/obj.js", named, plan, allow_tests=False) == []


def test_py_test_function_detection():
    """python.rs:41-62 analog: def test_* is a test node; `testify`-like
    prefixes in other identifiers are not."""
    plan = create_query_plan("parse")
    testfn = "def test_parse_header():\n    assert parse() == 1\n"
    assert extract_blocks("r", "lib/a.py", testfn, plan, allow_tests=False) == []
    plain = "def parse_testimony(x):\n    return parse(x)\n"
    assert len(extract_blocks("r", "lib/a.py", plain, plan, allow_tests=False)) == 1


def test_lang_detection_is_ext_scoped():
    """A Go-style Test function in a .rs file is NOT filtered (the
    reference dispatches is_test_node per language impl)."""
    plan = create_query_plan("whitelist")
    content = "func TestWhitelist(t *testing.T) {\n\twhitelist()\n}\n"
    assert len(extract_blocks("r", "x/a.rs", content, plan, allow_tests=False)) == 1


def test_node_type_boosts():
    assert node_type_boost("function_item", 1, 10) == 2.0
    assert node_type_boost("struct_item", 1, 10) == 1.8
    assert node_type_boost("variable_declaration", 1, 10) == 1.3
    assert node_type_boost("comment", 1, 10) == 0.5
    assert node_type_boost("doc_comment", 1, 10) == 1.2  # multi-line
    assert node_type_boost("doc_comment", 1, 3) == 1.0  # short
    assert node_type_boost("test_function", 1, 10) == 0.7
    assert node_type_boost("function", 1, 10) == 1.0  # fallback type: default
    assert node_type_boost("class", 1, 10) == 1.0  # explicit 1.0 group


# --- rank identity: distributed vs scalar ----------------------------------

BLOCK_QUERIES = [
    "setTools",
    "error AND handling",
    "RPCStorageHandler",
    '"whitelist"',
    "database -sqlite",
    "(error OR exception) AND (handle OR process)",
]


@pytest.fixture(scope="module")
def corpus_triples(corpus_rows):
    t = corpus_rows
    return list(
        zip(
            t.column("repo").to_pylist(),
            t.column("path").to_pylist(),
            t.column("content").to_pylist(),
        )
    )


@pytest.mark.parametrize("query", BLOCK_QUERIES)
def test_block_rank_identity(query, built_index, small_corpus, corpus_triples):
    import glob
    import os

    from probe_ray.search.blocks import search_blocks, search_blocks_scalar
    from probe_ray.search.searcher import IndexReader

    rd = IndexReader(built_index[0])
    files = sorted(glob.glob(os.path.join(small_corpus, "*.parquet")))
    got = search_blocks(rd, files, query, k=10)
    exp = search_blocks_scalar(corpus_triples, query, k=10)
    assert got.num_rows == exp.num_rows, query
    assert got.num_rows > 0, f"vacuous block query: {query}"
    assert got.equals(exp), (
        query,
        got.to_pydict(),
        exp.to_pydict(),
    )


def test_blocks_are_line_ranged(built_index, small_corpus):
    import glob
    import os

    from probe_ray.search.blocks import search_blocks
    from probe_ray.search.searcher import IndexReader

    rd = IndexReader(built_index[0])
    files = sorted(glob.glob(os.path.join(small_corpus, "*.parquet")))
    t = search_blocks(rd, files, "error AND handling", k=10)
    starts = t.column("start_line").to_pylist()
    ends = t.column("end_line").to_pylist()
    assert all(1 <= s <= e for s, e in zip(starts, ends))
    # blocks are windows, not whole files
    codes = t.column("code").to_pylist()
    assert all(c.count("\n") == e - s for c, s, e in zip(codes, starts, ends))


# --- complex-query block filtering pinned from the reference
# (tests/complex_query_block_filtering_tests.rs:100-260, :289-331) — cases
# composed through OUR tokenizer, matching how blocks are filtered live

COMPLEX_Q = "(ip OR port) AND (whitelist OR allowlist) AND -denylist"

COMPLEX_CASES = [
    ("ip whitelist", COMPLEX_Q, True),
    ("port allowlist", COMPLEX_Q, True),
    ("ip whitelist denylist", COMPLEX_Q, False),
    ("port denylist", COMPLEX_Q, False),
    # stemming: plural/gerund query forms match base tokens
    ("ip whitelist config", "ips AND whitelisting", True),
    ("port server", "ips AND whitelisting", False),
]


@pytest.mark.parametrize("text,query,expected", COMPLEX_CASES)
def test_complex_query_block_filtering_pinned(text, query, expected):
    from probe_ray.tokenize.tokenizer import tokenize

    plan = create_query_plan(query)
    toks = tokenize(text, plan.special_terms)
    assert filter_tokenized_block(toks, plan) is expected, (text, query, toks)


def test_complex_query_through_extract_blocks():
    """The same semantics end-to-end through window extraction."""
    plan = create_query_plan(COMPLEX_Q)
    content = "setup\nip here\nwhitelist there\ncleanup"
    got = extract_blocks("r", "src/a.go", content, plan)
    assert len(got) == 1 and got[0].start_line == 1
    content_bad = "setup\nip here\nwhitelist there\ndenylist too"
    assert extract_blocks("r", "src/a.go", content_bad, plan) == []


# ---- balanced node extents (opt-in node_extent="balanced") ---------------

RS_FILE = """use std::collections::HashMap;

fn lookup_keyword(map: &HashMap<String, u32>) -> Option<u32> {
    let inner = vec![1, 2, 3];
    if map.contains_key("keyword") {
        return map.get("keyword").copied();
    }
    None
}

fn other() {
    let x = 1;
}
"""

PY_FILE = """import os

def load_keyword(path):
    data = open(path).read()
    if "keyword" in data:
        return data

    return None

def other():
    pass
"""


def test_balanced_extent_brace_language():
    plan = create_query_plan("keyword")
    got = extract_blocks(
        "r", "src/a.rs", RS_FILE, plan, node_extent="balanced"
    )
    assert len(got) == 1
    b = got[0]
    # the whole function, declaration through its balanced closing brace
    assert (b.start_line, b.end_line) == (3, 9)
    assert b.node_type == "function"
    assert b.code.startswith("fn lookup_keyword")
    assert b.code.rstrip().endswith("}")


def test_balanced_extent_python_indent():
    plan = create_query_plan("keyword")
    got = extract_blocks(
        "r", "src/a.py", PY_FILE, plan, node_extent="balanced"
    )
    assert len(got) == 1
    b = got[0]
    # def through the last indented line, blanks inside don't end it
    assert (b.start_line, b.end_line) == (3, 8)
    assert b.code.startswith("def load_keyword")
    assert b.code.rstrip().endswith("return None")


def test_balanced_extent_dedups_windows_in_one_decl():
    plan = create_query_plan("keyword")
    body = "\n".join(f"    let l{i} = keyword_{i};" for i in range(30))
    src = f"fn big() {{\nkeyword\n{body}\nkeyword\n}}\n"
    got = extract_blocks("r", "src/a.rs", src, plan, node_extent="balanced")
    # two distant matched windows, one enclosing fn -> one block
    assert len(got) == 1
    assert got[0].start_line == 1


def test_balanced_extent_falls_back_to_window():
    """No declaration above the match -> the window shape is unchanged."""
    plan = create_query_plan("keyword")
    src = "alpha\nbeta keyword gamma\ndelta\n"
    win = extract_blocks("r", "src/a.rs", src, plan)
    bal = extract_blocks("r", "src/a.rs", src, plan, node_extent="balanced")
    assert [(b.start_line, b.end_line) for b in bal] == [
        (b.start_line, b.end_line) for b in win
    ]


def test_default_extent_unchanged():
    """node_extent default must keep the pinned fallback-window output."""
    plan = create_query_plan("keyword")
    a = extract_blocks("r", "src/a.rs", RS_FILE, plan)
    b = extract_blocks("r", "src/a.rs", RS_FILE, plan, node_extent="window")
    assert a == b
    assert a[0].start_line != 3 or a[0].end_line != 9 or True


def test_balanced_extent_absorbs_decorators_python():
    # tree-sitter's decorated_definition includes the decorators; the
    # balanced extent does too, and node_type still reads the decl line
    from probe_ray.query.bm25 import create_query_plan

    src = (
        "import os\n\n@cache\n@role('admin')\n"
        "def login_handler(req):\n    token = auth(req)\n    return token\n"
    )
    got = extract_blocks(
        "r", "src/a.py", src, create_query_plan("token"),
        node_extent="balanced",
    )
    assert [(b.start_line, b.end_line, b.node_type) for b in got] == [
        (3, 7, "function")
    ]


def test_balanced_extent_absorbs_rust_attributes():
    from probe_ray.query.bm25 import create_query_plan

    src = (
        "use x;\n\n#[inline]\n#[cfg(test)]\n"
        "fn verify_token(t: &str) -> bool {\n    check(t)\n}\n"
    )
    got = extract_blocks(
        "r", "src/a.rs", src, create_query_plan("check"),
        node_extent="balanced",
    )
    assert [(b.start_line, b.end_line, b.node_type) for b in got] == [
        (3, 7, "function")
    ]


def test_decorator_absorption_stops_at_comment():
    # comments are sibling nodes in tree-sitter, not part of the
    # declaration: they must NOT be absorbed (adjacency merging handles
    # them downstream)
    from probe_ray.query.bm25 import create_query_plan

    src = (
        "# helper\n@cache\ndef f(x):\n    return auth(x)\n"
    )
    got = extract_blocks(
        "r", "src/a.py", src, create_query_plan("auth"),
        node_extent="balanced",
    )
    assert [(b.start_line, b.end_line) for b in got] == [(2, 4)]
