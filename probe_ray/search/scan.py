"""Exact distributed scan-and-score path for special-term queries.

Queries containing quoted or excluded keywords register *dynamic special
terms* that change how documents tokenize (reference: elastic_query.rs:
768-773 -> tokenization.rs:843-851; SURVEY hazard H2). A pre-built index
stores the default tokenization, so those queries are answered by
re-tokenizing the corpus under the query's special-term set — the same
architecture the reference uses for every query (it re-scans all files per
search, search_runner.rs:215-1560); here it is a streaming Ray Data
pipeline and only the rare special-term queries pay for it.

Two passes over a small intermediate (written once; tokenization runs ONCE):
  pass 1: map_batches(tokenize + per-doc tf over query keywords)
          -> intermediate rows (repo, path, commit, lang, sha256, doc_len,
             tf_<i> columns) + per-batch STATS rows fused into the same
             output (is_stats=True: N, sum doc_len, df per kw — computed
             from the batch's own arrays, no second distributed pass)
  pass 2: map_batches(vectorized AST scoring with global stats)
          -> per-batch top-k -> driver merge.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from probe_ray.query.bm25 import MAX_QUERY_TERMS, QueryPlan, create_query_plan, idf as idf_fn
from probe_ray.query.parser import is_only_excluded_terms
from probe_ray.search.scoring import eval_mask, score_ast
from probe_ray.tokenize.tokenizer import preprocess_text_with_filename, tokenize


class _TfStage:
    def __init__(
        self,
        specs: list[tuple[str, QueryPlan]],
        include_filenames: bool = True,
    ):
        self.specs = specs
        # reference --exclude-filenames (cli.rs:31): filename matching off
        # => path tokens contribute neither candidates nor TF/doc_len
        self.include_filenames = include_filenames
        # union of keywords across queries; per-query tokenization contexts
        kws: list[str] = []
        for _, plan in specs:
            kws.extend(plan.term_indices)
        self.keywords = sorted(set(kws))
        self.kw_pos = {t: i for i, t in enumerate(self.keywords)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        commits = batch.column("commit").to_pylist()
        langs = batch.column("lang").to_pylist()
        contents = batch.column("content").to_pylist()
        n = len(repos)
        nk = len(self.keywords)
        # per-query special-term sets may differ -> tokenize per context;
        # in practice queries in one call share few contexts, so cache by set
        ctxs = {}
        for name, plan in self.specs:
            ctxs.setdefault(plan.special_terms, []).append((name, plan))

        # per context, a tf matrix; emit one intermediate row per (doc, ctx)
        out = {
            "ctx": [], "repo": [], "path": [], "commit": [], "lang": [],
            "sha256": [], "doc_len": [],
        }
        tf_cols: list[list[int]] = [[] for _ in range(nk)]
        for ci, (ctx, _) in enumerate(ctxs.items()):
            for i in range(n):
                if self.include_filenames:
                    toks = preprocess_text_with_filename(
                        contents[i], paths[i], ctx
                    )
                else:
                    toks = tokenize(contents[i], ctx)
                tf: dict[str, int] = {}
                for t in toks:
                    if t in self.kw_pos:
                        tf[t] = tf.get(t, 0) + 1
                out["ctx"].append(ci)
                out["repo"].append(repos[i])
                out["path"].append(paths[i])
                out["commit"].append(commits[i])
                out["lang"].append(langs[i])
                out["sha256"].append(
                    hashlib.sha256(contents[i].encode()).hexdigest()
                )
                out["doc_len"].append(len(toks))
                for t, j in self.kw_pos.items():
                    tf_cols[j].append(tf.get(t, 0))
        # fused per-(batch, ctx) stats rows: n docs, sum doc_len, df per kw
        n_ctx = len(ctxs)
        ctx_vals = np.asarray(out["ctx"], dtype=np.int32)
        dlen_vals = np.asarray(out["doc_len"], dtype=np.int64)
        for ci in range(n_ctx):
            m = ctx_vals == ci
            out["ctx"].append(ci)
            out["repo"].append(None)
            out["path"].append(None)
            out["commit"].append(None)
            out["lang"].append(None)
            out["sha256"].append(None)
            out["doc_len"].append(int(dlen_vals[m].sum()))
            for j in range(nk):
                tf_cols[j].append(
                    int((np.asarray(tf_cols[j], dtype=np.int64)[: len(m)][m] > 0).sum())
                )
        nrows = len(out["ctx"])
        is_stats = [False] * (nrows - n_ctx) + [True] * n_ctx
        n_col = [0] * (nrows - n_ctx) + [
            int((ctx_vals == ci).sum()) for ci in range(n_ctx)
        ]
        tbl = {
            "ctx": pa.array(out["ctx"], pa.int32()),
            "is_stats": pa.array(is_stats, pa.bool_()),
            "n": pa.array(n_col, pa.int64()),
            "repo": pa.array(out["repo"], pa.string()),
            "path": pa.array(out["path"], pa.string()),
            "commit": pa.array(out["commit"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "sha256": pa.array(out["sha256"], pa.string()),
            "doc_len": pa.array(out["doc_len"], pa.int64()),
        }
        for j in range(nk):
            tbl[f"tf_{j}"] = pa.array(tf_cols[j], pa.int32())
        return pa.table(tbl)


def scan_search_many(
    input_files: list[str],
    queries: dict[str, str],
    k: int = 10,
    filters: dict[str, dict[str, str]] | None = None,
    exact: bool = False,
    include_filenames: bool = True,
    max_total_tokens: int | None = None,
    exclude_keys: frozenset[str] | None = None,
) -> dict[str, pa.Table]:
    import ray.data

    filters = filters or {}
    results: dict[str, pa.Table] = {}
    specs: list[tuple[str, QueryPlan]] = []
    for name, q in queries.items():
        plan = create_query_plan(q, exact)
        if len(plan.term_indices) > MAX_QUERY_TERMS:
            from probe_ray.search.searcher import _empty_result

            results[name] = _empty_result()
        else:
            specs.append((name, plan))
    if not specs:
        return results

    stage = _TfStage(specs, include_filenames)
    ds = ray.data.read_parquet(
        input_files, columns=["repo", "path", "commit", "lang", "content"]
    )
    inter = ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True, batch_size=256
    ).materialize()

    nk = len(stage.keywords)
    ctx_list = []
    seen_ctx = {}
    for name, plan in specs:
        if plan.special_terms not in seen_ctx:
            seen_ctx[plan.special_terms] = len(seen_ctx)
        ctx_list.append((name, plan, seen_ctx[plan.special_terms]))

    # global stats per ctx from the fused stats rows: a distributed filter
    # ships ONLY the tiny stats rows to the driver
    def stats_rows(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch.column("is_stats"), True)
        )

    agg: dict[int, dict] = {}
    for r in inter.map_batches(stats_rows, batch_format="pyarrow").take_all():
        a = agg.setdefault(
            int(r["ctx"]), {"n": 0, "sum_dlen": 0, "df": [0] * nk}
        )
        a["n"] += int(r["n"])
        a["sum_dlen"] += int(r["doc_len"])
        for j in range(nk):
            a["df"][j] += int(r[f"tf_{j}"])

    per_query = []
    for name, plan, ci in ctx_list:
        a = agg.get(ci, {"n": 0, "sum_dlen": 0, "df": [0] * nk})
        n_docs = a["n"]
        avgdl = a["sum_dlen"] / n_docs if n_docs else 0.0
        idfs = {}
        for t in plan.term_indices:
            df = a["df"][stage.kw_pos[t]]
            if df > 0:
                idfs[t] = idf_fn(n_docs, df)
        per_query.append((name, plan, ci, avgdl, idfs))

    def score_batch(batch: pa.Table) -> pa.Table:
        from probe_ray.search.searcher import _filter_mask

        batch = batch.filter(pc.equal(batch.column("is_stats"), False))
        ctx_arr = batch.column("ctx").to_numpy()
        dlen = batch.column("doc_len").to_numpy().astype(np.float64)
        tf_mat = {
            t: batch.column(f"tf_{stage.kw_pos[t]}").to_numpy()
            for t in stage.keywords
        }
        out = {
            "query": [], "score": [], "repo": [], "path": [], "commit": [],
            "lang": [], "sha256": [], "doc_len": [],
        }
        for name, plan, ci, avgdl, idfs in per_query:
            m = ctx_arr == ci
            if not m.any():
                continue
            tfs = {t: v[m] for t, v in tf_mat.items()}
            scores, included = score_ast(plan.ast, tfs, dlen[m], avgdl, idfs)
            # reference-CLI composition: boolean evaluate() gates inclusion
            # (filter_tokenized_block), scoring ranks the survivors; docs
            # matching nothing survive only for only-excluded queries
            present = {t: v > 0 for t, v in tfs.items()}
            gate = eval_mask(plan.ast, present, int(m.sum()))
            anym = np.zeros(int(m.sum()), dtype=bool)
            for t in plan.term_indices:
                anym |= tfs[t] > 0
            keep_mask = included & gate & (
                anym | is_only_excluded_terms(plan.ast)
            )
            # metadata field filters + tombstones select from the
            # corpus-global ranking (stats stay corpus-global, same as
            # the index path)
            fm = _filter_mask(batch, filters.get(name) or {}, exclude_keys)
            if fm is not None:
                keep_mask &= fm[m]
            idxs = np.flatnonzero(m)[keep_mask]
            scores = scores[keep_mask]
            if len(idxs) > k:
                order = np.argsort(-scores, kind="stable")
                kth = scores[order[k - 1]]
                cnt = int(
                    np.searchsorted(-scores[order], -kth, side="right")
                )
                sel = order[:cnt]
                idxs, scores = idxs[sel], scores[sel]
            sub = batch.take(pa.array(idxs))
            repo_arr = np.asarray(sub.column("repo").to_pylist(), dtype=object)
            path_arr = np.asarray(sub.column("path").to_pylist(), dtype=object)
            order = np.lexsort((path_arr, repo_arr, -scores))[:k]
            sub = sub.take(pa.array(order))
            out["query"].extend([name] * len(order))
            out["score"].extend(scores[order].tolist())
            for col in ("repo", "path", "commit", "lang", "sha256"):
                out[col].extend(sub.column(col).to_pylist())
            out["doc_len"].extend(sub.column("doc_len").to_pylist())
        return pa.table(
            {
                "query": pa.array(out["query"], pa.string()),
                "score": pa.array(out["score"], pa.float64()),
                "repo": pa.array(out["repo"], pa.string()),
                "path": pa.array(out["path"], pa.string()),
                "commit": pa.array(out["commit"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "sha256": pa.array(out["sha256"], pa.string()),
                "doc_len": pa.array(out["doc_len"], pa.int32()),
            }
        )

    parts = [
        pa.table(b)
        for b in inter.map_batches(score_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = pa.concat_tables(parts) if parts else None

    from probe_ray.search.searcher import _empty_result, _finalize

    for name, plan, ci, avgdl, idfs in per_query:
        if merged is None or merged.num_rows == 0:
            results[name] = _empty_result()
            continue
        use = merged.filter(pc.equal(merged.column("query"), name))
        idx = pc.sort_indices(
            use,
            sort_keys=[
                ("score", "descending"),
                ("repo", "ascending"),
                ("path", "ascending"),
            ],
        )[:k]
        top = use.take(idx)
        if max_total_tokens is not None:
            # same K2 budget rule as the index path (searcher.search_many)
            cum = np.cumsum(top.column("doc_len").to_numpy())
            top = top.slice(
                0, int(np.searchsorted(cum, max_total_tokens, "right"))
            )
        results[name] = _finalize(top)
    return results
