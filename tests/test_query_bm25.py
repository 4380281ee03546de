"""Query parse/eval + BM25 oracle fixtures (FIXTURES.md SS3-SS4; pinned
from elastic_query_tests.rs, elastic_query_evaluate_tests.rs and
ranking.rs:796-893)."""

import math

from probe_ray.query.bm25 import (
    B,
    K1,
    create_query_plan,
    idf,
    rank_documents,
)
from probe_ray.query.parser import And, Or, Term, evaluate, parse_query


def test_prefixes():
    assert parse_query("foo").ast == Term(keywords=["foo"])
    assert parse_query("+foo").ast.required
    assert parse_query("-foo").ast.excluded


def test_implicit_or():
    ast = parse_query("foo bar").ast
    assert isinstance(ast, Or)


def test_explicit_and_or():
    assert isinstance(parse_query("error AND handling").ast, And)
    assert isinstance(parse_query("error OR handling").ast, Or)
    # case-insensitive keywords
    assert isinstance(parse_query("error and handling").ast, And)


def test_plus_minus_bind_as_and():
    ast = parse_query("+foo bar -baz").ast
    # ((foo OR bar) AND -baz)
    assert isinstance(ast, And)
    assert ast.right.excluded


def test_grouping():
    ast = parse_query("(ip OR port) AND config").ast
    assert isinstance(ast, And) and isinstance(ast.left, Or)


def test_field_captured_but_ignored():
    ast = parse_query("title:foo").ast
    assert ast.field == "title" and ast.keywords == ["foo"]


def test_quoted_exact_registers_special():
    res = parse_query('"JWTMiddleware"')
    assert res.ast.exact and res.ast.keywords == ["JWTMiddleware"]
    assert "jwtmiddleware" in res.special_terms


def test_unquoted_multi_keyword_term():
    assert parse_query("JWTMiddleware").ast.keywords == [
        "jwt", "middleware", "middlewar",
    ]


def test_evaluate_fixtures():
    plan = create_query_plan("(ip OR port) AND config")
    ti = plan.term_indices
    assert evaluate(plan.ast, {ti["ip"], ti["config"]}, ti)
    assert not evaluate(plan.ast, {ti["config"]}, ti)

    plan = create_query_plan("ip -test")
    ti = plan.term_indices
    assert evaluate(plan.ast, {ti["ip"]}, ti)
    assert not evaluate(plan.ast, {ti["ip"], ti["test"]}, ti)
    # ignore_negatives variant used for file-level filtering
    assert evaluate(plan.ast, {ti["ip"], ti["test"]}, ti, ignore_negatives=True)


def test_required_term_global_rule():
    plan = create_query_plan("+foo OR bar")
    ti = plan.term_indices
    assert not evaluate(plan.ast, {ti["bar"]}, ti)
    assert evaluate(plan.ast, {ti["foo"]}, ti)


def test_multi_keyword_and_within_term():
    plan = create_query_plan("JWTMiddleware")
    ti = plan.term_indices
    # one keyword present, others missing -> fails (AND within Term)
    assert not evaluate(plan.ast, {ti["jwt"]}, ti)
    assert evaluate(plan.ast, set(ti.values()), ti)


def test_rank_required_all_must_match():
    docs = ["api process load", "another random text with process"]
    r = rank_documents(docs, "+api +process +load")
    assert len(r) == 1 and r[0][0] == 0 and r[0][1] > 0


def test_rank_coverage_order():
    docs = ["api process load data", "api process load", "api process", "api"]
    r = rank_documents(docs, "api process load data")
    assert [i for i, _ in r] == [0, 1, 2, 3]
    assert all(r[i][1] > r[i + 1][1] for i in range(len(r) - 1))


def test_rank_term_cap_256():
    q = " ".join(f"uniqword{i}xx" for i in range(300))
    assert rank_documents(["uniqword1xx"], q) == []


def test_rank_only_excluded():
    r = rank_documents(["has sqlite here", "clean doc"], "-sqlite")
    assert r == [(1, 0.0)]


def test_exact_bm25_value():
    # hand-computed single-doc, single-term value
    docs = ["alpha beta", "gamma delta"]
    r = rank_documents(docs, "alpha")
    n, df = 2, 1
    expected_idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    tf, dl, avgdl = 1.0, 2.0, 2.0
    expected = expected_idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / avgdl))
    # doc 1 matches nothing -> optional Some(0.0), included at 0
    assert r[0] == (0, expected)
    assert r[1] == (1, 0.0)
    assert idf(2, 1) == expected_idf


def test_tie_break_doc_index():
    docs = ["same text here", "same text here", "same text here"]
    r = rank_documents(docs, "same")
    assert [i for i, _ in r] == [0, 1, 2]
    assert r[0][1] == r[1][1] == r[2][1]


def test_lex_fallback():
    # lexer failure (no valid tokens) raises, weird chars are skipped
    ast = parse_query("@@@ foo").ast
    assert ast == Term(keywords=["foo"])


def test_evaluate_nested_missing_optional_reference_cases():
    """Pinned from elastic_query_evaluate_tests.rs:265-400 (nested,
    missing-term, optional-mix, exact-term evaluation)."""
    from probe_ray.query.parser import And, Or, Term, evaluate

    def T(k, **kw):
        return Term(keywords=[k], **kw)

    idx5 = {t: i for i, t in enumerate(["a", "b", "c", "d", "e"])}
    # a AND (b OR (c AND (d OR e)))
    e = And(T("a"), Or(T("b"), And(T("c"), Or(T("d"), T("e")))))
    assert evaluate(e, {0, 1}, idx5)
    assert evaluate(e, {0, 2, 3}, idx5)
    assert evaluate(e, {0, 2, 4}, idx5)
    assert evaluate(e, {0, 1, 2, 3, 4}, idx5)
    assert not evaluate(e, {1, 2, 3, 4}, idx5)
    assert not evaluate(e, {0, 2}, idx5)

    # term not in the index
    idx2 = {"foo": 0, "bar": 1}
    assert not evaluate(And(T("foo"), T("baz")), {0}, idx2)
    assert evaluate(And(T("foo"), T("baz", excluded=True)), {0}, idx2)

    # +required optional -excluded  == (req OR opt) AND NOT excl
    idx3 = {"required": 0, "optional": 1, "excluded": 2}
    e = And(
        Or(T("required", required=True), T("optional")),
        T("excluded", excluded=True),
    )
    assert evaluate(e, {0}, idx3)
    assert evaluate(e, {0, 1}, idx3)
    assert not evaluate(e, {1}, idx3)  # required missing => global fail
    assert not evaluate(e, {0, 2}, idx3)

    # exact term matches only the verbatim token
    idxe = {"running": 0, "run": 1}
    assert evaluate(T("running", exact=True), {0}, idxe)
    assert not evaluate(T("running", exact=True), {1}, idxe)


def test_filter_tokenized_block_reference_cases():
    """Pinned from tests/tokenized_block_filtering_tests.rs — the
    candidate-keep decision is evaluate() over the block's matched-term
    set (file_processing.rs:202-355 calls the same AST evaluation)."""
    from probe_ray.query.bm25 import create_query_plan
    from probe_ray.query.parser import evaluate

    def keep(tokens, query):
        plan = create_query_plan(query)
        matched = {
            i for t, i in plan.term_indices.items() if t in set(tokens)
        }
        return evaluate(plan.ast, matched, plan.term_indices)

    block = ["ip", "whitelist", "config"]
    assert keep(block, "ip AND whitelist")
    assert keep(block, "ip OR port")
    assert keep(block, "(ip OR port) AND config")
    assert keep(block, "ip -test")
    assert not keep(["ip", "whitelist", "test"], "ip -test")
    big = ["ip", "whitelist", "config", "server"]
    assert keep(big, "(ip OR port) AND (whitelist OR config) -test")
    assert not keep(
        ["port", "server"], "(ip OR port) AND (whitelist OR config) -test"
    )
    assert not keep([], "ip AND whitelist")


def test_negative_compound_word_reference_cases():
    """Pinned from tests/negative_compound_word_tests.rs:216-245 —
    excluded compound terms are kept verbatim (no compound splitting) and
    registered as dynamic special terms."""
    from probe_ray.query.bm25 import create_query_plan

    p = create_query_plan("-networkfirewall")
    assert "networkfirewall" in p.excluded_terms
    assert "networkfirewall" in p.special_terms
    assert "network" not in p.excluded_terms
    assert "firewall" not in p.excluded_terms

    p2 = create_query_plan("settings AND -networkfirewall")
    assert "networkfirewall" in p2.excluded_terms
    assert "set" in p2.term_indices  # settings -> stemmed positive term


def test_necessary_keywords():
    """Anchor-soundness invariant for the searcher's conjunctive-anchor
    path: a keyword reported necessary must be present in EVERY document
    eval_mask/evaluate accepts. And unions, Or intersects, excluded and
    required-mode queries contribute nothing (the searcher uses
    required_kws on that path)."""
    from probe_ray.query.parser import necessary_keywords

    def nk(q):
        return necessary_keywords(parse_query(q).ast)

    assert nk("error AND handling") == {"error", "handl"}  # stemmed kws
    assert nk("error OR handling") == set()
    assert nk("(error OR handling) AND config") == {"config"}
    assert nk("(a AND c) OR (b AND c)") == {"c"}
    assert nk("error -handling") == {"error"}
    assert nk("-handling") == set()
    # compound term: ALL its split keywords are necessary
    kws = nk("whitelist AND config")
    assert "config" in kws and len(kws) >= 2  # white+list or whitelist


def test_necessary_keywords_sound_vs_evaluate():
    """Exhaustive check on small universes: every doc accepted by
    evaluate() contains every necessary keyword."""
    from itertools import combinations

    from probe_ray.query.parser import necessary_keywords

    queries = [
        "a AND b", "a OR b", "(a OR b) AND c", "(a AND b) OR (a AND c)",
        "a AND (b OR (c AND d))", "a -b", "(a OR b) AND (c OR d)",
        "a AND b AND c", "(a AND b) OR c",
    ]
    universe = ["a", "b", "c", "d"]
    for q in queries:
        plan = create_query_plan(q)
        nec = necessary_keywords(plan.ast)
        for r in range(len(universe) + 1):
            for present in combinations(universe, r):
                matched = {
                    plan.term_indices[t]
                    for t in present
                    if t in plan.term_indices
                }
                if evaluate(plan.ast, matched, plan.term_indices):
                    assert nec <= set(present), (q, present, nec)
