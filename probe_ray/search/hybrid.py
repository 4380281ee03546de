"""Index-assisted answering of special-term queries (quoted / excluded).

Special terms change *document* tokenization (hazard H2 — reference:
elastic_query.rs:768-773 -> tokenization.rs:843-851), so the pre-built
index (default tokenization) cannot serve those queries directly. The
original answer was an exhaustive re-tokenize of the whole corpus per
query (search/scan.py — the reference's own architecture: it re-scans
every file on every search, search_runner.rs:215-1560). This module
replaces that with an exact two-sided split:

AFFECTED docs — docs whose tokenization under the query's special-term
set can differ from default. A special term only alters tokenization
where a whole alphanumeric unit (raw token, camel part, or split
remainder — tokenizer.py:110,117,226) lowercases to it, and every such
unit is a contiguous substring of content or path. Hence
``match_substring(content|path, term, ignore_case=True)`` is a *sound*
over-approximation. (TERM-postings-based discovery would NOT be sound:
stem collisions — "whitelists" stems to "whitelist" — put the
keyword's token into docs that never contain the special unit, and
in-document negation tokens like "--flag" can suppress the marker
stems entirely.) Candidates are discovered from the index's UNIT
postings when present (index/build.py UNIT_PREFIX: per-doc distinct
lowercased alnum runs; "term substring of text" == "term substring of
some unit" because an alnum-only term cannot cross a run boundary, and
per-codepoint str.lower() preserves substring containment) — one
substring pass over each segment's unit vocabulary inside the
persistent actor pool, O(vocabulary + candidates) per query instead of
O(corpus). Pre-units indexes fall back to the original one-pass
streaming substring scan of the corpus. Only the candidates are then
read back (path-IN parquet predicate) and re-tokenized (default ctx +
query ctx) for exact tf/doc_len both ways, and they are scored exactly
on the driver (the set is small).

UNAFFECTED docs — tokenization identical to default, so the quoted /
excluded keyword behaves there as an ordinary index term (its tf is
whatever default tokenization produced, e.g. via stem collisions).
They are served by the normal block-max index path (persistent actor
pool) with overridden global stats and the candidate set masked out.

Global BM25 stats under the query context are derived exactly, in
integer arithmetic, from the manifest + candidate deltas::

    sum_dlen' = n_tokens + sum_C(ctx_dlen - default_dlen)
    avgdl'    = sum_dlen' / N
    df'(t)    = df_dict(t) - |{C: default tf>0}| + |{C: ctx tf>0}|
    min_dlen' = min(manifest min_dlen, min_C ctx_dlen)   # sound, may be loose

so every score is bit-equal to the exhaustive scan path
(tests/test_hybrid.py asserts table equality against scan_search_many,
and the engine-vs-scalar-oracle e2e suite keeps covering this route).

Scale shape: one column-pruned streaming pass running a C++ substring
kernel replaces corpus-wide Python re-tokenization (orders of magnitude
per-byte cheaper), two of the scan path's three pipeline barriers
disappear, and the index query itself is answered by the persistent
actor pool in milliseconds. Worst case — a special term that matches
most of the corpus (e.g. a quoted stop word) — falls back to the scan
path, bounded by SCAN_FALLBACK_MIN / SCAN_FALLBACK_FRAC.
"""

from __future__ import annotations

import hashlib
import re
import threading
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from probe_ray.query.bm25 import QueryPlan, idf as idf_fn
from probe_ray.query.parser import is_only_excluded_terms
from probe_ray.search.scoring import eval_mask, score_ast
from probe_ray.tokenize.tables import SPECIAL_CASE_WORDS
from probe_ray.tokenize.tokenizer import preprocess_text_with_filename

# Candidate-count ceiling for the hybrid path, two independent bounds:
#   - SCAN_FALLBACK_FRAC of the corpus: the hybrid tokenizes candidates
#     under both contexts, but the scan tokenizes the WHOLE corpus and
#     materializes a full per-(doc,ctx) intermediate — measured at sf0.1
#     the hybrid is ~5x faster even with large candidate sets, so only a
#     near-degenerate special term (most of the corpus matches) makes
#     the scan's flat cost the better shape.
#   - SCAN_FALLBACK_ABS: driver-side candidate rows / exclusion masks
#     stop being "small" past this regardless of corpus size.
# SCAN_FALLBACK_FLOOR keeps tiny corpora (tests, sf0.001) on the hybrid
# path where the fraction bound would be meaninglessly small.
SCAN_FALLBACK_FLOOR = 1_000
SCAN_FALLBACK_ABS = 200_000
SCAN_FALLBACK_FRAC = 0.75

# Reader-scoped LRU of per-context candidate tables. A reader's corpus
# view is immutable after open (segments, tombstones — searcher.py
# IndexReader contract; upserts open a NEW reader), so the candidate
# discovery + double-tokenization product for a given special-term
# context can be reused verbatim across calls. This is the dominant
# cost of a REPEATED special-term query — the agent/MCP usage shape,
# where the same quoted/excluded queries recur against one warm reader.
# Entries are keyed by (full special set, keyword tuple) because the
# stage's tf columns are keyword-positional. Oversized candidate sets
# are not cached (recomputing beats pinning tens of MB per entry).
_CTX_CACHE_MAX = 16
_CTX_CACHE_MAX_ROWS = 65_536


def _cache_enabled() -> bool:
    # PROBE_RAY_HYBRID_CACHE=0 forces every call down the cold path —
    # for measuring uncached latency (rehearsal tools) and for A/B
    # correctness checks; read per call so tests can toggle it.
    import os

    return os.environ.get("PROBE_RAY_HYBRID_CACHE", "1") != "0"

# Size-aware crossover for candidate tokenization: at or below these
# bounds the candidates are read with one driver-side pushdown scan and
# tokenized in-process (no Dataset launch); above them the work is
# distributed. ~4k docs / 2M tokens ≈ tens of MB of text — trivially
# driver-sized, while the distributed branch keeps the degenerate case
# (a special term matching half the corpus) off the driver.
DIRECT_CAND_ROWS = 4_096
DIRECT_CAND_TOKENS = 2_000_000


def _fallback_threshold(n_docs: int) -> float:
    return max(
        SCAN_FALLBACK_FLOOR, min(SCAN_FALLBACK_ABS, SCAN_FALLBACK_FRAC * n_docs)
    )

# A special term can only match a tokenizer unit if it is one alnum run
# (units are produced by [^\W_]+ — tokenizer.py:_ALNUM_RUNS); terms with
# spaces/underscores/punctuation can never fire and need no candidates.
_UNIT_RE = re.compile(r"[^\W_]+\Z", re.UNICODE)


class _CandidateStage:
    """map_batches stage: substring-prefilter, then double-tokenize only
    the matching rows. Emits one row per (candidate doc, ctx) with
    default/ctx doc_len and per-keyword tf under both tokenizations."""

    def __init__(self, ctxs: list[tuple[int, frozenset, list[str]]], keywords: list[str]):
        self.ctxs = ctxs  # (ci, full special set, active alnum specials)
        self.keywords = keywords
        self.kw_pos = {t: j for j, t in enumerate(keywords)}

    def _schema_arrays(self, out, d_tf, c_tf):
        tbl = {
            "ctx": pa.array(out["ctx"], pa.int32()),
            "repo": pa.array(out["repo"], pa.string()),
            "path": pa.array(out["path"], pa.string()),
            "commit": pa.array(out["commit"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "sha256": pa.array(out["sha256"], pa.string()),
            "d_dlen": pa.array(out["d_dlen"], pa.int64()),
            "c_dlen": pa.array(out["c_dlen"], pa.int64()),
        }
        for j in range(len(self.keywords)):
            tbl[f"d_tf_{j}"] = pa.array(d_tf[j], pa.int32())
            tbl[f"c_tf_{j}"] = pa.array(c_tf[j], pa.int32())
        return pa.table(tbl)

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch.column("content")
        path = batch.column("path")
        out = {c: [] for c in ("ctx", "repo", "path", "commit", "lang", "sha256", "d_dlen", "c_dlen")}
        nk = len(self.keywords)
        d_tf: list[list[int]] = [[] for _ in range(nk)]
        c_tf: list[list[int]] = [[] for _ in range(nk)]
        for ci, specials_full, active in self.ctxs:
            mask = None
            for s in active:
                m = pc.or_(
                    pc.match_substring(content, s, ignore_case=True),
                    pc.match_substring(path, s, ignore_case=True),
                )
                mask = m if mask is None else pc.or_(mask, m)
            if mask is None:
                continue
            idxs = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            if not len(idxs):
                continue
            sub = batch.take(pa.array(idxs))
            conts = sub.column("content").to_pylist()
            paths = sub.column("path").to_pylist()
            repos = sub.column("repo").to_pylist()
            commits = sub.column("commit").to_pylist()
            langs = sub.column("lang").to_pylist()
            for i in range(len(conts)):
                d_toks = preprocess_text_with_filename(conts[i], paths[i])
                c_toks = preprocess_text_with_filename(
                    conts[i], paths[i], specials_full
                )
                out["ctx"].append(ci)
                out["repo"].append(repos[i])
                out["path"].append(paths[i])
                out["commit"].append(commits[i])
                out["lang"].append(langs[i])
                out["sha256"].append(
                    hashlib.sha256(conts[i].encode()).hexdigest()
                )
                out["d_dlen"].append(len(d_toks))
                out["c_dlen"].append(len(c_toks))
                dd: dict[str, int] = {}
                for t in d_toks:
                    if t in self.kw_pos:
                        dd[t] = dd.get(t, 0) + 1
                cc: dict[str, int] = {}
                for t in c_toks:
                    if t in self.kw_pos:
                        cc[t] = cc.get(t, 0) + 1
                for t, j in self.kw_pos.items():
                    d_tf[j].append(dd.get(t, 0))
                    c_tf[j].append(cc.get(t, 0))
        return self._schema_arrays(out, d_tf, c_tf)


def _candidate_filter_mask(
    cand: pa.Table, filters: dict[str, str]
) -> np.ndarray | None:
    """Same semantics as searcher._filter_mask, over candidate rows."""
    if not filters:
        return None
    mask = None
    for fld, val in filters.items():
        if fld == "lang":
            m = pc.equal(cand.column("lang"), val)
        else:
            m = pc.match_substring(cand.column(fld), val)
        arr = m.to_numpy(zero_copy_only=False)
        mask = arr if mask is None else (mask & arr)
    return mask


def hybrid_search_many(
    reader,
    queries: dict[str, tuple[str, QueryPlan]],
    k: int = 10,
    filters: dict[str, dict[str, str]] | None = None,
    exact: bool = False,
    max_total_tokens: int | None = None,
) -> dict[str, pa.Table]:
    """Answer special-term queries via candidate-prefilter + stat-adjusted
    index search. ``reader`` is an IndexReader; ``queries`` maps name ->
    (raw query string, parsed plan). Results are bit-equal to
    scan.scan_search_many (which remains the fallback)."""
    import ray.data

    from probe_ray.search.scan import scan_search_many
    from probe_ray.search.searcher import (
        _QuerySpec,
        _empty_result,
        _finalize,
        RESULT_COLS,
    )

    filters = filters or {}
    results: dict[str, pa.Table] = {}

    # group queries by tokenization context (= their special-term set)
    ctx_of: dict[frozenset, int] = {}
    ctx_specs: list[tuple[int, frozenset, list[str]]] = []
    per_query: list[tuple[str, QueryPlan, int]] = []
    for name, (_q, plan) in queries.items():
        sp = plan.special_terms
        if sp not in ctx_of:
            ci = len(ctx_of)
            ctx_of[sp] = ci
            # inactive specials need no candidates: non-unit terms
            # (spaces/punct) can never match an alnum run, and STATIC
            # special-case words (tokenization.rs:1105-1146) are already
            # in every tokenizer table — adding them to the dynamic set
            # changes no document's tokenization, so the index is exact
            # for them (their verbatim keyword == the indexed token).
            active = sorted(
                s
                for s in sp
                if _UNIT_RE.match(s) and s not in SPECIAL_CASE_WORDS
            )
            ctx_specs.append((ci, sp, active))
        per_query.append((name, plan, ctx_of[sp]))

    keywords = sorted({t for _, plan, _ in per_query for t in plan.term_indices})
    kw_pos = {t: j for j, t in enumerate(keywords)}

    n_docs = reader.n_docs
    n_tokens = int(reader.manifest.get("n_tokens", 0))
    df_global = reader.df_lookup(keywords)

    def _scan_fallback():
        # degenerate special term (matches much of the corpus):
        # candidate machinery stops being "small" — exhaustive scan
        # is the better shape. Bounded worst case.
        return scan_search_many(
            reader.manifest["input_files"],
            {name: q for name, (q, _p) in queries.items()},
            k,
            filters=filters,
            exact=exact,
            max_total_tokens=max_total_tokens,
            exclude_keys=reader.tombstones or None,
        )

    use_cache = _cache_enabled()
    cache: OrderedDict = reader.__dict__.setdefault(
        "_hybrid_ctx_cache", OrderedDict()
    )
    # One reader serves concurrent threads (the MCP/agent shape): guard
    # the check→move_to_end→read / store→evict sequences, which are not
    # atomic as a group — an eviction between them raises KeyError. Two
    # threads missing the same key both compute and store bit-equal
    # tables; that duplicate work is benign.
    cache_lock: threading.Lock = reader.__dict__.setdefault(
        "_hybrid_ctx_lock", threading.Lock()
    )
    kw_key = tuple(keywords)
    ctx_sub: dict[int, pa.Table | None] = {}
    pending: list[tuple[int, frozenset, list[str]]] = []
    with cache_lock:
        for ci, sp, active in ctx_specs:
            if not active:
                ctx_sub[ci] = None
                continue
            key = (sp, kw_key)
            if use_cache and key in cache:
                cache.move_to_end(key)
                ctx_sub[ci] = cache[key]
            else:
                pending.append((ci, sp, active))

    cand_tbl = None
    if pending:
        stage = _CandidateStage(pending, keywords)
        read_cols = ["repo", "path", "commit", "lang", "content"]
        ds = None
        cand_bs = 1024
        if reader.has_units:
            # Index-served candidate discovery: one substring pass over
            # each segment's unit VOCABULARY + pruned payload reads,
            # inside the persistent actor pool — per-query cost is
            # O(unit vocabulary + candidates), not O(corpus). The corpus
            # is then read with a path-IN predicate pushed to parquet
            # (only candidate rows decode their content column), and
            # _CandidateStage's exact per-ctx mask refines the path-level
            # over-selection, so results stay bit-equal to the scan.
            actives_union = sorted({s for _, _, act in pending for s in act})
            # per-ctx tokenization sets: on a units_cased index the
            # worker filters substring-matched units to those whose
            # expansion actually changes under SOME query context —
            # exact, so dropping them cannot alter any score
            keys = reader.special_candidate_keys(
                actives_union, [sp for _, sp, act in pending if act]
            )
            # upper bound on candidate (doc, ctx) rows, known BEFORE any
            # corpus read — the fallback decision is now free
            if keys.num_rows * len(pending) > _fallback_threshold(n_docs):
                return _scan_fallback()
            if keys.num_rows and (
                keys.num_rows <= DIRECT_CAND_ROWS
                and int(pc.sum(keys.column("doc_len")).as_py() or 0)
                <= DIRECT_CAND_TOKENS
            ):
                # Small candidate set: pushdown-read + tokenize the
                # candidates inside the persistent actor pool (one RPC
                # round over warm workers). Skips the Dataset pipeline's
                # fixed launch cost (~1-2 s) — a realistic-selectivity
                # quoted term answers in tens of ms. Bounded by rows AND
                # total token length so fat docs can't blow a worker
                # heap; bigger sets take the distributed branch below.
                direct = reader.candidate_stage_fanout(
                    pc.unique(keys.column("path")).to_pylist(),
                    read_cols,
                    stage,
                )
                if direct.num_rows:
                    cand_tbl = direct
            elif keys.num_rows:
                import pyarrow.dataset as pads

                ds = ray.data.read_parquet(
                    reader.manifest["input_files"],
                    columns=read_cols,
                    filter=pads.field("path").isin(
                        pc.unique(keys.column("path"))
                    ),
                )
                # every filtered row is a candidate (the stage tokenizes
                # all of them) — size batches so the work spreads across
                # the cluster instead of a few 1024-row tasks
                import ray as _ray

                cpus = int(_ray.cluster_resources().get("CPU", 8))
                cand_bs = max(
                    32, min(1024, -(-keys.num_rows // (2 * cpus)))
                )
        else:
            # pre-units index: streaming substring prefilter over the
            # whole corpus (one vectorized C++ pass, no tokenization for
            # non-matching rows)
            ds = ray.data.read_parquet(
                reader.manifest["input_files"], columns=read_cols
            )
        if ds is not None:
            inter = ds.map_batches(
                stage, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=cand_bs,
            ).materialize()
            if inter.count() > _fallback_threshold(n_docs):
                return _scan_fallback()
            parts = [
                pa.table(b)
                for b in inter.iter_batches(batch_format="pyarrow")
            ]
            if parts:
                cand_tbl = pa.concat_tables(parts)

    # split the freshly computed contexts out of cand_tbl and cache them
    for ci, sp, _active in pending:
        sub = None
        if cand_tbl is not None:
            sub = cand_tbl.filter(pc.equal(cand_tbl.column("ctx"), ci))
            sub = sub.combine_chunks() if sub.num_rows else None
        ctx_sub[ci] = sub
        if use_cache and (sub is None or sub.num_rows <= _CTX_CACHE_MAX_ROWS):
            with cache_lock:
                cache[(sp, kw_key)] = sub
                while len(cache) > _CTX_CACHE_MAX:
                    cache.popitem(last=False)

    # per-ctx candidate arrays + stat deltas
    ctx_data: dict[int, dict] = {}
    for ci, _sp, _active in ctx_specs:
        sub = ctx_sub.get(ci)
        if sub is None:
            ctx_data[ci] = None
            continue
        d_dlen = sub.column("d_dlen").to_numpy()
        c_dlen = sub.column("c_dlen").to_numpy()
        repos = sub.column("repo").to_pylist()
        paths = sub.column("path").to_pylist()
        ctx_data[ci] = {
            "table": sub,
            "d_dlen": d_dlen,
            "c_dlen": c_dlen,
            "d_tf": {
                t: sub.column(f"d_tf_{j}").to_numpy().astype(np.int64)
                for t, j in kw_pos.items()
            },
            "c_tf": {
                t: sub.column(f"c_tf_{j}").to_numpy().astype(np.int64)
                for t, j in kw_pos.items()
            },
            "exclude": frozenset(
                f"{r}\x00{p}" for r, p in zip(repos, paths)
            ),
            "sum_delta": int(c_dlen.sum() - d_dlen.sum()),
            "min_c_dlen": int(c_dlen.min()),
        }

    # per-query adjusted stats -> index specs
    specs: list[_QuerySpec] = []
    q_stats: dict[str, tuple[float, dict[str, float]]] = {}
    for name, plan, ci in per_query:
        cd = ctx_data[ci]
        if cd is None:
            sum_dlen = n_tokens
            dfs = {t: df_global.get(t, 0) for t in plan.term_indices}
            min_dl = reader.min_dlen
        else:
            sum_dlen = n_tokens + cd["sum_delta"]
            dfs = {
                t: df_global.get(t, 0)
                - int((cd["d_tf"][t] > 0).sum())
                + int((cd["c_tf"][t] > 0).sum())
                for t in plan.term_indices
            }
            min_dl = min(reader.min_dlen or cd["min_c_dlen"], cd["min_c_dlen"])
        avgdl = sum_dlen / n_docs if n_docs else 0.0
        idfs = {
            t: idf_fn(n_docs, df) for t, df in dfs.items() if df > 0
        }
        q_stats[name] = (avgdl, idfs)
        specs.append(
            _QuerySpec(
                name=name,
                plan=plan,
                idfs=idfs,
                need_fill=is_only_excluded_terms(plan.ast),
                filters=filters.get(name, {}),
                avgdl=avgdl,
                min_dlen=min_dl,
                exclude_keys=(
                    ((cd["exclude"] if cd else frozenset())
                     | reader.tombstones)
                    or None
                ),
            )
        )

    merged = reader._run_specs(specs, k)

    # driver-side exact scoring of the candidates under the query ctx
    for name, plan, ci in per_query:
        cd = ctx_data[ci]
        avgdl, idfs = q_stats[name]
        rows = merged.filter(pc.equal(merged.column("query"), name))
        if cd is not None:
            sub = cd["table"]
            tfs = {t: cd["c_tf"][t] for t in plan.term_indices}
            dlen = cd["c_dlen"].astype(np.float64)
            scores, included = score_ast(plan.ast, tfs, dlen, avgdl, idfs)
            present = {t: v > 0 for t, v in tfs.items()}
            gate = eval_mask(plan.ast, present, sub.num_rows)
            anym = np.zeros(sub.num_rows, dtype=bool)
            for t in plan.term_indices:
                anym |= tfs[t] > 0
            keep = included & gate & (
                anym | is_only_excluded_terms(plan.ast)
            )
            fm = _candidate_filter_mask(sub, filters.get(name, {}))
            if fm is not None:
                keep = keep & fm
            if reader.tombstones:
                key = pc.binary_join_element_wise(
                    sub.column("repo"), sub.column("path"), "\x00"
                )
                keep = keep & pc.invert(
                    pc.is_in(
                        key,
                        value_set=reader.tombstone_value_set(),
                    )
                ).to_numpy(zero_copy_only=False)
            idxs = np.flatnonzero(keep)
            if len(idxs):
                take = sub.take(pa.array(idxs))
                crow = pa.table(
                    {
                        "query": pa.array([name] * len(idxs), pa.string()),
                        "score": pa.array(scores[idxs], type=pa.float64()),
                        "repo": take.column("repo"),
                        "path": take.column("path"),
                        "commit": take.column("commit"),
                        "lang": take.column("lang"),
                        "sha256": take.column("sha256"),
                        "doc_len": pc.cast(take.column("c_dlen"), pa.int32()),
                    }
                )
                rows = pa.concat_tables(
                    [rows.select(RESULT_COLS), crow.select(RESULT_COLS)]
                )
        if rows.num_rows == 0:
            results[name] = _empty_result()
            continue
        idx = pc.sort_indices(
            rows,
            sort_keys=[
                ("score", "descending"),
                ("repo", "ascending"),
                ("path", "ascending"),
            ],
        )[:k]
        top = rows.take(idx)
        if max_total_tokens is not None:
            # same K2 budget rule as the index path (searcher.search_many)
            cum = np.cumsum(top.column("doc_len").to_numpy())
            top = top.slice(
                0, int(np.searchsorted(cum, max_total_tokens, "right"))
            )
        results[name] = _finalize(top)
    return results
