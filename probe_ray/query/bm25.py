"""BM25 scoring with Elasticsearch-style bool logic — the scalar oracle.

Behavior parity with /root/reference/src/ranking.rs:
  - k1=1.5, b=0.5                                   (:361-362)
  - idf = ln(1 + (N - df + 0.5)/(df + 0.5)), df>0   (:115-144)
  - token score = idf * tf*(k1+1)/(tf + k1*(1-b+b*doc_len/avgdl))  (:186-208)
  - Term score = sum over keywords in keyword order (:211-217) — summation
    order matters for f64 parity (SURVEY H4)
  - AST combination (:226-274): excluded -> None if score>0 else Some(0);
    required -> None if score==0; optional -> Some(score); And -> both Some,
    sum; Or -> at least one Some, sum of present sides. None => excluded.
  - 256 unique query terms cap -> empty results (:162-182, :305-314)
  - ordering: score desc, then doc index asc (:406-418)

This scalar implementation is the conformance oracle for the distributed
index path (probe_ray.search): both must produce identical (doc, score)
lists. Stats (N, df, avgdl) are computed over the documents passed in; the
distributed engine computes them over the whole indexed corpus and the
oracle must be called with the same corpus (SURVEY H3).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from probe_ray.tokenize.tokenizer import preprocess_text_with_filename, tokenize
from .parser import (
    And,
    Expr,
    Or,
    ParseError,
    Term,
    extract_query_terms,
    parse_query,
    walk_terms,
)

K1 = 1.5
B = 0.5
MAX_QUERY_TERMS = 256


@dataclass
class QueryPlan:
    """Parsed query + term bookkeeping (query.rs:81-201 analog)."""

    ast: Expr
    term_indices: dict[str, int]  # sorted, deduped keywords -> index
    excluded_terms: set[str]
    special_terms: frozenset[str]

    @property
    def positive_terms(self) -> list[str]:
        excluded = self.excluded_terms
        return [t for t in self.term_indices if t not in excluded]


def create_query_plan(query: str, exact: bool = False) -> QueryPlan:
    res = parse_query(query, exact)
    all_terms: list[str] = []
    excluded: set[str] = set()
    for t in walk_terms(res.ast):
        all_terms.extend(t.keywords)
        if t.excluded:
            excluded.update(t.keywords)
    term_indices = {t: i for i, t in enumerate(sorted(set(all_terms)))}
    return QueryPlan(res.ast, term_indices, excluded, res.special_terms)


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))


def score_term(
    keywords: list[str],
    tf: dict[str, int],
    doc_len: int,
    avgdl: float,
    idfs: dict[str, float],
) -> float:
    total = 0.0
    for kw in keywords:
        freq = tf.get(kw, 0)
        if freq <= 0:
            continue
        kw_idf = idfs.get(kw, 0.0)
        tf_part = (freq * (K1 + 1.0)) / (
            freq + K1 * (1.0 - B + B * (doc_len / avgdl))
        )
        total += kw_idf * tf_part
    return total


def score_expr(
    expr: Expr,
    tf: dict[str, int],
    doc_len: int,
    avgdl: float,
    idfs: dict[str, float],
) -> float | None:
    """None => document excluded from results."""
    if isinstance(expr, Term):
        s = score_term(expr.keywords, tf, doc_len, avgdl, idfs)
        if expr.excluded:
            return None if s > 0.0 else 0.0
        if expr.required:
            return s if s > 0.0 else None
        return s
    if isinstance(expr, And):
        ls = score_expr(expr.left, tf, doc_len, avgdl, idfs)
        if ls is None:
            return None
        rs = score_expr(expr.right, tf, doc_len, avgdl, idfs)
        if rs is None:
            return None
        return ls + rs
    ls = score_expr(expr.left, tf, doc_len, avgdl, idfs)
    rs = score_expr(expr.right, tf, doc_len, avgdl, idfs)
    if ls is None and rs is None:
        return None
    return (ls or 0.0) + (rs or 0.0)


def rank_documents(
    documents: list[str] | None,
    query: str,
    pre_tokenized: list[list[str]] | None = None,
) -> list[tuple[int, float]]:
    """rank_documents() parity (ranking.rs:279-428).

    ``documents`` are raw texts tokenized with the query's dynamic special
    terms unless ``pre_tokenized`` is given.
    """
    try:
        res = parse_query(query, False)
    except ParseError:
        return []
    query_terms = extract_query_terms(res.ast)
    if len(query_terms) > MAX_QUERY_TERMS:
        return []

    if pre_tokenized is None:
        assert documents is not None
        pre_tokenized = [tokenize(d, res.special_terms) for d in documents]

    n_docs = len(pre_tokenized)
    doc_lens = [len(toks) for toks in pre_tokenized]
    avgdl = sum(float(x) for x in doc_lens) / n_docs if n_docs else 0.0

    dfs: dict[str, int] = {}
    tfs: list[dict[str, int]] = []
    for toks in pre_tokenized:
        tf: dict[str, int] = {}
        for t in toks:
            if t in query_terms:
                tf[t] = tf.get(t, 0) + 1
        tfs.append(tf)
        for t in set(toks):
            if t in query_terms:
                dfs[t] = dfs.get(t, 0) + 1

    idfs = {t: idf(n_docs, dfs[t]) for t in query_terms if dfs.get(t, 0) > 0}

    scored: list[tuple[int, float]] = []
    for i, tf in enumerate(tfs):
        s = score_expr(res.ast, tf, doc_lens[i], avgdl, idfs)
        if s is not None:
            scored.append((i, s))
    scored.sort(key=lambda p: (-p[1], p[0]))
    return scored


def rank_files(
    rows: list[tuple[str, str]],  # (path, content) in corpus order
    query: str,
) -> list[tuple[int, float]]:
    """Whole-file END-TO-END oracle: doc tokens = content ++ path tokens;
    boolean evaluate() GATES inclusion before ranking — the reference CLI
    composition (filter_tokenized_block then rank_search_results,
    file_processing.rs:1333-1367 -> ranking). rank_documents alone stays
    scoring-only for ranking.rs fixture parity.

    Stats (N, df, avgdl) are computed over the WHOLE corpus, matching the
    engine's index-manifest stats scope (SURVEY H3)."""
    from .parser import evaluate, is_only_excluded_terms

    res = parse_query(query, False)
    toks = [
        preprocess_text_with_filename(content, path, res.special_terms)
        for path, content in rows
    ]
    scored = rank_documents(None, query, pre_tokenized=toks)
    plan = create_query_plan(query)
    only_excl = is_only_excluded_terms(plan.ast)
    out = []
    for i, s in scored:
        tokset = set(toks[i])
        matched = {
            idx for t, idx in plan.term_indices.items() if t in tokset
        }
        if not matched and not only_excl:
            continue
        if evaluate(plan.ast, matched, plan.term_indices):
            out.append((i, s))
    return out
