"""Pattern-query lite (search/pattern.py) — the `probe query` analog.

Text-level approximation of the ast-grep pattern language (query.rs):
$NAME identifier metavariables (with backreference semantics for
repeats), $$$ multi metavariable, whitespace-insensitive literals."""

from __future__ import annotations

import glob
import json
import os

import pytest

from probe_ray.search.pattern import (
    LANG_EXTENSIONS,
    compile_pattern,
    match_content,
    query_pattern,
)

SRC = """fn parse_config(input: &str) -> Config {
    let x = 1;
}

fn main() {
    parse_config("a");
    let y = y;
}
"""


def test_metavar_binds_identifier():
    p = compile_pattern("fn $NAME($$$)")
    got = match_content(p, SRC)
    assert [m[5]["NAME"] for m in got] == ["parse_config", "main"]
    # line spans are 1-based
    assert got[0][0] == 1
    assert got[1][0] == 5


def test_multi_metavar_nongreedy():
    p = compile_pattern("fn $NAME($$$) -> $RET")
    got = match_content(p, SRC)
    assert len(got) == 1
    assert got[0][5] == {"NAME": "parse_config", "RET": "Config"}


def test_repeated_metavar_backreference():
    p = compile_pattern("let $A = $A;")
    got = match_content(p, SRC)
    assert len(got) == 1 and got[0][5]["A"] == "y"


def test_whitespace_insensitive_literals():
    p = compile_pattern("let  x   =  1 ;")
    assert len(match_content(p, "let x=1;")) == 1


def test_columns_one_based():
    p = compile_pattern("let $V = 1")
    got = match_content(p, "  let q = 1\n")
    assert got[0][2] == 3  # column_start
    assert got[0][0] == got[0][1] == 1


def test_language_table_matches_reference():
    # query.rs:55-72
    assert LANG_EXTENSIONS["javascript"] == ["js", "jsx", "mjs"]
    assert LANG_EXTENSIONS["cpp"] == ["cpp", "hpp", "cc", "hh", "cxx", "hxx"]


def test_distributed_pattern_query(ray_session, small_corpus, corpus_rows):
    files = sorted(glob.glob(os.path.join(small_corpus, "*.parquet")))
    t = query_pattern(files, "fn $ID")
    assert t.num_rows > 0
    # every match's captured identifier appears in the matched text
    for r in t.to_pylist()[:20]:
        caps = json.loads(r["captures"])
        assert caps["ID"] in r["matched_text"]
    # scalar cross-check on one file
    repo0 = corpus_rows.column("repo").to_pylist()[0]
    path0 = corpus_rows.column("path").to_pylist()[0]
    content0 = corpus_rows.column("content").to_pylist()[0]
    expected = len(match_content(compile_pattern("fn $ID"), content0))
    got = t.filter(
        (pa_field("repo") == repo0) & (pa_field("path") == path0)
    ).num_rows
    assert got == expected


def pa_field(name):
    import pyarrow.compute as pc

    return pc.field(name)


def test_language_filter(ray_session, small_corpus):
    files = sorted(glob.glob(os.path.join(small_corpus, "*.parquet")))
    t = query_pattern(files, "fn $ID", language="rust")
    assert all(p.endswith(".rs") for p in t.column("path").to_pylist())
    with pytest.raises(ValueError, match="unsupported"):
        query_pattern(files, "x", language="cobol")


def test_max_results(ray_session, small_corpus):
    files = sorted(glob.glob(os.path.join(small_corpus, "*.parquet")))
    t = query_pattern(files, "fn $ID", max_results=3)
    assert t.num_rows == 3


# ---- fixtures pinned from the reference's own query tests ----------------
# tests/query_command_tests.rs:6-57 (rust fn with named multi metavars),
# :59-110 (js function + arrow), :140 (empty-body fn). Same content shapes,
# same assertions on match counts and captured/matched text.

RUST_SRC = """
fn hello_world() {
    println!("Hello, world!");
}

fn add(a: i32, b: i32) -> i32 {
    a + b
}
"""

JS_SRC = """
function greet(name) {
    return `Hello, ${name}!`;
}

const multiply = (a, b) => a * b;
"""


def test_named_multi_rust_functions():
    p = compile_pattern("fn $NAME($$$PARAMS) $$$BODY")
    got = match_content(p, RUST_SRC)
    assert len(got) == 2
    by_name = {m[5]["NAME"]: m for m in got}
    assert "println!" in by_name["hello_world"][4]
    assert "a + b" in by_name["add"][4]
    assert by_name["add"][5]["PARAMS"] == "a: i32, b: i32"
    # the trailing multi runs through the whole balanced body
    assert by_name["add"][5]["BODY"].strip().endswith("}")


def test_named_multi_js_function_not_arrow():
    p = compile_pattern("function $NAME($$$PARAMS) $$$BODY")
    got = match_content(p, JS_SRC)
    assert len(got) == 1
    assert got[0][5]["NAME"] == "greet"
    assert "return" in got[0][4]


def test_named_multi_js_arrow():
    p = compile_pattern("const $NAME = ($$$PARAMS) => $$$BODY")
    got = match_content(p, JS_SRC)
    assert len(got) == 1
    assert got[0][5]["NAME"] == "multiply"
    assert got[0][5]["PARAMS"] == "a, b"
    assert got[0][5]["BODY"] == "a * b;"


def test_empty_body_pattern():
    p = compile_pattern("fn $NAME() {}")
    src = "fn a() {}\nfn b() {\n    work();\n}\nfn c() {\n}\n"
    got = match_content(p, src)
    assert [m[5]["NAME"] for m in got] == ["a", "c"]


def test_balanced_multi_spans_nested_delimiters():
    """The r2 divergence: $$$ between delimiters must count nesting, not
    stop at the first closer."""
    p = compile_pattern("foo($$$ARGS)")
    got = match_content(p, "x = foo(bar(1, 2), baz[3]);")
    assert len(got) == 1
    assert got[0][5]["ARGS"] == "bar(1, 2), baz[3]"
    p2 = compile_pattern("if $COND { $$$ }")
    src = "if ready { if deep { a(); } b(); }"
    got2 = match_content(p2, src)
    assert len(got2) == 1
    assert got2[0][4] == src


# -- string/comment mask + wildcards (round 4: divergence closures) -------


def test_balanced_extent_skips_string_delimiters():
    # old divergence #2: a ")" inside a string literal must not close
    # the counted extent
    p = compile_pattern("foo($$$ARGS)")
    got = match_content(p, 'foo(a, ")", b); bar()\n', "rs")
    assert len(got) == 1 and got[0][5]["ARGS"] == 'a, ")", b'


def test_no_match_starting_in_comment_or_string():
    # old divergence #1: commented-out / quoted code is not matched
    src = '// foo(x)\nlet s = "foo(y)";\nfoo(z)\n'
    got = match_content(compile_pattern("foo($A)"), src, "rs")
    assert [m[5] for m in got] == [{"A": "z"}]


def test_mask_rules_are_per_extension():
    src = "# foo(q)\nfoo(r)\n"
    # '#' is a comment in python but plain text in rust (e.g. attrs)
    assert len(match_content(compile_pattern("foo($A)"), src, "py")) == 1
    assert len(match_content(compile_pattern("foo($A)"), src, "rs")) == 2


def test_block_comment_masked_across_lines():
    src = "/* foo(dead)\n   foo(dead2) */ foo(live)\n"
    got = match_content(compile_pattern("foo($A)"), src, "c")
    assert [m[5] for m in got] == [{"A": "live"}]


def test_python_triple_quote_masked():
    src = '"""foo(doc)"""\nfoo(real)\n'
    got = match_content(compile_pattern("foo($A)"), src, "py")
    assert [m[5] for m in got] == [{"A": "real"}]


def test_underscore_wildcard_no_capture_no_link():
    src = "add(a, b)\nadd(c, c)\n"
    got = match_content(compile_pattern("add($_, $_)"), src, "rs")
    assert len(got) == 2 and all(m[5] == {} for m in got)
    # named vars still enforce linking on the same source
    linked = match_content(compile_pattern("add($A, $A)"), src, "rs")
    assert len(linked) == 1 and linked[0][0] == 2


def test_string_containing_comment_marker_stays_string():
    # a // inside a string must not hide the rest of the line
    src = 'let u = "http://x"; foo(a)\n'
    got = match_content(compile_pattern("foo($A)"), src, "rs")
    assert [m[5] for m in got] == [{"A": "a"}]


def test_single_node_metavar_identifier_and_call():
    # $$X matches exactly one node: an identifier, or a balanced group
    src = "let a = foo;\nlet b = bar(x, y);\n"
    p = compile_pattern("let $N = $$V;")
    got = match_content(p, src, "rs")
    assert [m[5]["N"] for m in got] == ["a", "b"]
    # one node each: a bare identifier, and — via the postfix-extension
    # backtrack — the whole call expression (one node in a real AST)
    assert [m[5]["V"] for m in got] == ["foo", "bar(x, y)"]


def test_single_node_metavar_balanced_group():
    src = "check((a + b));\ncheck(c);\n"
    p = compile_pattern("check($$ARG);")
    got = match_content(p, src, "rs")
    assert [m[5]["ARG"] for m in got] == ["(a + b)", "c"]


def test_single_node_metavar_operator_and_backref():
    src = "x == x; y != z; w == v;"
    p = compile_pattern("$A $$OP $B;")
    got = match_content(p, src, "rs")
    assert [(m[5]["A"], m[5]["OP"], m[5]["B"]) for m in got] == [
        ("x", "==", "x"),
        ("y", "!=", "z"),
        ("w", "==", "v"),
    ]
    # backreference: repeated $$OP must bind the same text
    src2 = "a == b == c; a == b != c;"
    p2 = compile_pattern("$_ $$OP $_ $$OP $_;")
    got2 = match_content(p2, src2, "rs")
    assert [m[4] for m in got2] == ["a == b == c;"]


def test_single_node_metavar_string_literal_node():
    src = 'log("hello, world");\nlog(name);\n'
    p = compile_pattern("log($$MSG);")
    got = match_content(p, src, "rs")
    assert [m[5]["MSG"] for m in got] == ['"hello, world"', "name"]


def test_single_node_does_not_cross_separator():
    # $$ is ONE node: it cannot swallow "x, y" (the , is a separator)
    src = "f(x, y);\n"
    p = compile_pattern("f($$A);")
    assert match_content(p, src, "rs") == []


def test_anonymous_single_node_no_capture():
    src = "take(alpha);"
    p = compile_pattern("take($$);")
    got = match_content(p, src, "rs")
    assert len(got) == 1 and got[0][5] == {}


def test_word_boundary_guards():
    # a word-leading pattern must not fire mid-identifier, and a
    # word-trailing pattern must not stop on an identifier prefix
    src = "myfoo(a); foo(b); foobar = c; call(foo);\n"
    p = compile_pattern("foo($A)")
    got = match_content(p, src, "rs")
    assert [(m[5]["A"]) for m in got] == ["b"]
    p2 = compile_pattern("call(foo)")
    assert len(match_content(p2, src, "rs")) == 1


# -- node-boundary anchoring (round 5: the last divergence closed) ----------


def _find(pat, content, ext="js"):
    from probe_ray.search.pattern import CompiledPattern, code_mask

    p = CompiledPattern(pat)
    return [m.group(0) for m in p.finditer(content, code_mask(content, ext))]


def test_boundary_rejects_tighter_binding_slices():
    # `y + z` inside `x * y + z` is not an AST node ((x*y)+z)
    assert _find("$A + $B", "r = x * y + z;") == []
    # the last operand continuing into a tighter-binding expression
    assert _find("$A + $B", "r = x + y * z;") == []
    # whole nodes still match
    assert _find("$A + $B", "r = y + z;") == ["y + z"]
    assert _find("$A + $B", "f(y + z)") == ["y + z"]


def test_boundary_associativity():
    # left-assoc: (a+b)+c — the inner node is `a + b`, not `b + c`
    assert _find("$A + $B", "a + b + c") == ["a + b"]
    # right-assoc: a = (b = c) — the inner node is `b = c`
    assert _find("$A = $B", "a = b = c") == ["b = c"]
    # looser operator on the left does not block a tighter node
    assert _find("$A * $B", "x + y * z") == ["y * z"]


def test_boundary_member_names():
    # `foo` after `.` is a member name — the callee of `a.foo(x)` is the
    # member expression, so the identifier-callee pattern must not fire
    assert _find("foo($A)", "a.foo(x)") == []
    # but a call node inside a postfix chain or as an operand is a node
    assert _find("foo($A)", "z = foo(x).bar()") == ["foo(x)"]
    assert _find("foo($A)", "u - foo(x)") == ["foo(x)"]


def test_boundary_exempt_without_top_level_operator():
    # operators nested in brackets don't make the pattern an expression
    assert _find("foo($A + $B)", "r = foo(y + z) * 2") == ["foo(y + z)"]
