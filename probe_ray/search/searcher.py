"""Distributed top-k BM25 query engine over the built index.

Query flow (SURVEY.md SS4.2 "query job"):
  driver: parse -> QueryPlan(s); queries whose plans register dynamic
  special terms (quoted/excluded keywords — they change *document*
  tokenization, hazard H2) are answered by the exact distributed scan path
  (probe_ray.search.scan) instead of the index.

  index path:
    read_parquet(postings, filter=term.isin(query_terms))  # predicate
      pushdown; only matched posting rows leave storage
    -> global df per term aggregated driver-side (tiny)
    -> groupby([wave, subshard]).map_groups(score_group)   # each partition
         scored independently with global stats; docstats cached per worker
    -> driver merges per-partition top-k by (score desc, repo, path)

Exactness optimizations inside a partition:
  - required-term narrowing: candidates = intersection of required-term
    postings (cheap sorted-array intersect) — other docs are excluded by
    score_expr anyway.
  - block-max pruning: candidates appearing ONLY in "hot" postings are
    kept only if their block upper bound (idf * impact(block max_tf,
    subshard min doc_len)) summed with the other hot terms' global upper
    bounds can reach the partition-local threshold established by scoring
    the rare-term candidates first. Skipped blocks are never varint-decoded
    (block-aligned codec). Both steps discard only provably sub-threshold
    docs => results identical to exhaustive scoring.

Result ordering: (score desc, repo asc, path asc) — the distributed
equivalent of the reference's (score desc, doc index asc) over its sorted
file walk (ranking.rs:406-418).
"""

from __future__ import annotations

import functools
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from probe_ray.index.build import _docstats_path
from probe_ray.index.codec import (
    BLOCK,
    decode_selected_blocks,
    decode_varint_deltas,
    unpack_tf,
)
from probe_ray.query.bm25 import QueryPlan, create_query_plan, idf as idf_fn
from probe_ray.search.scoring import max_impact, score_ast, zero_match_included

# Partition-local candidate count above which a term is treated as "hot"
# (block-max pruned) when it is not required/excluded.
HOT_DF = 8192

_DOCSTATS_CACHE: dict[tuple[str, int, int], pa.Table] = {}


def _load_docstats(index_dir: str, wave: int, subshard: int) -> pa.Table:
    key = (index_dir, wave, subshard)
    t = _DOCSTATS_CACHE.get(key)
    if t is None:
        t = pq.read_table(_docstats_path(index_dir, wave, subshard))
        if len(_DOCSTATS_CACHE) > 64:
            _DOCSTATS_CACHE.clear()
        _DOCSTATS_CACHE[key] = t
    return t


@dataclass
class _QuerySpec:
    name: str
    plan: QueryPlan
    idfs: dict[str, float]
    need_fill: bool


def _intersect_sorted(arrays: list[np.ndarray]) -> np.ndarray:
    out = arrays[0]
    for a in arrays[1:]:
        out = out[np.isin(out, a, assume_unique=True)]
        if len(out) == 0:
            break
    return out


def score_group(
    group: pa.Table,
    *,
    index_dir: str,
    specs: list[_QuerySpec],
    k: int,
    avgdl: float,
    min_dlen: int,
) -> pa.Table:
    """Score one (wave, subshard) partition for every query; return its
    top-k rows per query (comparator: -score, repo, path)."""
    wave = int(group.column("wave")[0].as_py())
    sub = int(group.column("subshard")[0].as_py())
    stats = _load_docstats(index_dir, wave, sub)
    doc_len_all = stats.column("doc_len").to_numpy().astype(np.float64)
    n_local = len(doc_len_all)

    terms = group.column("term").to_pylist()
    by_term: dict[str, int] = {t: i for i, t in enumerate(terms)}
    dfs = group.column("df").to_numpy()
    payloads = group.column("payload").to_pylist()
    tf_bits = group.column("tf_bits").to_pylist()
    blk_last = group.column("blk_last").to_pylist()
    blk_maxtf = group.column("blk_maxtf").to_pylist()

    decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def full_decode(t: str) -> tuple[np.ndarray, np.ndarray]:
        hit = decoded.get(t)
        if hit is None:
            i = by_term[t]
            n = int(dfs[i])
            ids = decode_varint_deltas(payloads[i], n)
            tfs = unpack_tf(tf_bits[i], n)
            hit = (ids, tfs)
            decoded[t] = hit
        return hit

    out_rows = {
        "query": [], "score": [], "repo": [], "path": [], "commit": [],
        "lang": [], "sha256": [], "doc_len": [], "wave": [], "subshard": [],
        "is_fill": [],
    }

    def emit(name: str, scores: np.ndarray, cand: np.ndarray, fill_mask=None):
        take = stats.take(pa.array(cand.astype(np.int64)))
        out_rows["query"].extend([name] * len(cand))
        out_rows["score"].extend(scores.tolist())
        out_rows["repo"].extend(take.column("repo").to_pylist())
        out_rows["path"].extend(take.column("path").to_pylist())
        out_rows["commit"].extend(take.column("commit").to_pylist())
        out_rows["lang"].extend(take.column("lang").to_pylist())
        out_rows["sha256"].extend(take.column("sha256").to_pylist())
        out_rows["doc_len"].extend(
            take.column("doc_len").to_numpy().tolist()
        )
        out_rows["wave"].extend([wave] * len(cand))
        out_rows["subshard"].extend([sub] * len(cand))
        out_rows["is_fill"].extend(
            [False] * len(cand) if fill_mask is None else fill_mask
        )

    for spec in specs:
        plan = spec.plan
        q_terms = [t for t in plan.term_indices if t in by_term]
        required_kws: set[str] = set()
        from probe_ray.query.parser import walk_terms

        for tnode in walk_terms(plan.ast):
            if tnode.required and not tnode.excluded:
                required_kws.update(tnode.keywords)
        # A required keyword with no posting anywhere in this partition =>
        # no doc here can match (score 0 for it => None) unless it has df>0
        # globally but not locally — still no local matches.
        if required_kws and any(t not in by_term for t in required_kws):
            # no candidates can pass; zero-match fill impossible (required)
            continue

        if required_kws:
            req_ids = [full_decode(t)[0] for t in sorted(required_kws)]
            cand = _intersect_sorted(sorted(req_ids, key=len))
            hot_terms: list[str] = []
            rare_terms = [t for t in q_terms if t not in required_kws]
        else:
            excluded = plan.excluded_terms
            rare_terms = [
                t
                for t in q_terms
                if t in excluded or int(dfs[by_term[t]]) <= HOT_DF
            ]
            hot_terms = [t for t in q_terms if t not in rare_terms]
            cand_parts = [full_decode(t)[0] for t in rare_terms]
            cand = (
                np.unique(np.concatenate(cand_parts))
                if cand_parts
                else np.empty(0, dtype=np.uint64)
            )

        def tf_for(t: str, cand_arr: np.ndarray) -> np.ndarray:
            ids, tfs = full_decode(t)
            pos = np.searchsorted(ids, cand_arr)
            pos_c = np.minimum(pos, len(ids) - 1) if len(ids) else pos
            arr = np.zeros(len(cand_arr), dtype=np.int64)
            if len(ids):
                hit = ids[pos_c] == cand_arr
                arr[hit] = tfs[pos_c[hit]]
            return arr

        if required_kws or not hot_terms:
            # exact scoring over cand with all terms fully decoded
            tf_arrays = {t: tf_for(t, cand) for t in q_terms}
            scores, included = score_ast(
                plan.ast, tf_arrays, doc_len_all[cand], avgdl, spec.idfs
            )
        else:
            # Phase A: rare candidates exact (hot tf via targeted blocks).
            hot_blocks_needed: dict[str, np.ndarray] = {}
            hot_data: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for t in hot_terms:
                i = by_term[t]
                n = int(dfs[i])
                last = np.frombuffer(blk_last[i], dtype=np.uint64)
                need = (
                    np.unique(np.searchsorted(last, cand))
                    if len(cand)
                    else np.empty(0, dtype=np.int64)
                )
                need = need[need < len(last)]
                hot_blocks_needed[t] = need
                ids_sel, pos_sel = decode_selected_blocks(
                    payloads[i], n, need
                )
                tf_all = unpack_tf(tf_bits[i], n)
                hot_data[t] = (ids_sel, tf_all[pos_sel])

            def tf_hot(t: str, cand_arr: np.ndarray) -> np.ndarray:
                ids_sel, tfs_sel = hot_data[t]
                arr = np.zeros(len(cand_arr), dtype=np.int64)
                if len(ids_sel):
                    pos = np.searchsorted(ids_sel, cand_arr)
                    pos_c = np.minimum(pos, len(ids_sel) - 1)
                    hit = ids_sel[pos_c] == cand_arr
                    arr[hit] = tfs_sel[pos_c[hit]]
                return arr

            tf_arrays = {t: tf_for(t, cand) for t in rare_terms}
            tf_arrays.update({t: tf_hot(t, cand) for t in hot_terms})
            scores, included = score_ast(
                plan.ast, tf_arrays, doc_len_all[cand], avgdl, spec.idfs
            )
            # threshold from phase A
            inc_scores = scores[included]
            if len(inc_scores) >= k:
                theta = np.partition(inc_scores, -k)[-k]
            else:
                theta = -np.inf
            # Phase B: hot-only candidates via block-max pruning.
            ub_global = {
                t: spec.idfs.get(t, 0.0)
                * max_impact(2.0, float(min_dlen or 1), avgdl)
                for t in hot_terms
            }
            extra_parts = []
            for t in hot_terms:
                i = by_term[t]
                n = int(dfs[i])
                last = np.frombuffer(blk_last[i], dtype=np.uint64)
                maxtf = np.frombuffer(blk_maxtf[i], dtype=np.uint8)
                others = sum(ub for u, ub in ub_global.items() if u != t)
                ub_blocks = np.array(
                    [
                        spec.idfs.get(t, 0.0)
                        * max_impact(float(m), float(min_dlen or 1), avgdl)
                        + others
                        for m in maxtf
                    ]
                )
                keep = np.flatnonzero(ub_blocks >= theta) if theta > -np.inf else np.arange(len(last))
                keep = np.union1d(keep, hot_blocks_needed[t])
                ids_sel, pos_sel = decode_selected_blocks(payloads[i], n, keep)
                tf_all = unpack_tf(tf_bits[i], n)
                hot_data[t] = (ids_sel, tf_all[pos_sel])
                extra_parts.append(ids_sel)
            extra = np.unique(np.concatenate(extra_parts)) if extra_parts else np.empty(0, np.uint64)
            if len(cand):
                extra = extra[~np.isin(extra, cand, assume_unique=True)]
            if len(extra):
                tf2 = {t: tf_for(t, extra) for t in rare_terms}
                tf2.update({t: tf_hot(t, extra) for t in hot_terms})
                s2, inc2 = score_ast(
                    plan.ast, tf2, doc_len_all[extra], avgdl, spec.idfs
                )
                cand = np.concatenate([cand, extra])
                scores = np.concatenate([scores, s2])
                included = np.concatenate([included, inc2])

        cand = cand[included]
        scores = scores[included]
        if len(cand) == 0:
            continue
        # top-k by (-score, repo, path): sort by score first, cut to the
        # tie-window at the k-th score, then break ties with strings.
        if len(cand) > k:
            order = np.argsort(-scores, kind="stable")
            kth = scores[order[k - 1]]
            s_sorted = scores[order]
            cnt = int(np.searchsorted(-s_sorted, -kth, side="right"))
            keep = order[:cnt]
            cand, scores = cand[keep], scores[keep]
        take = stats.take(pa.array(cand.astype(np.int64)))
        repo_arr = np.asarray(take.column("repo").to_pylist(), dtype=object)
        path_arr = np.asarray(take.column("path").to_pylist(), dtype=object)
        order = np.lexsort((path_arr, repo_arr, -scores))[:k]
        emit(spec.name, scores[order], cand[order])

    return pa.table(
        {
            "query": pa.array(out_rows["query"], pa.string()),
            "score": pa.array(out_rows["score"], pa.float64()),
            "repo": pa.array(out_rows["repo"], pa.string()),
            "path": pa.array(out_rows["path"], pa.string()),
            "commit": pa.array(out_rows["commit"], pa.string()),
            "lang": pa.array(out_rows["lang"], pa.string()),
            "sha256": pa.array(out_rows["sha256"], pa.string()),
            "doc_len": pa.array(out_rows["doc_len"], pa.int32()),
            "wave": pa.array(out_rows["wave"], pa.int32()),
            "subshard": pa.array(out_rows["subshard"], pa.int32()),
            "is_fill": pa.array(out_rows["is_fill"], pa.bool_()),
        }
    )


class IndexReader:
    """Driver-side handle over a built index."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.n_docs = self.manifest["n_docs"]
        self.avgdl = self.manifest["avgdl"]
        self.min_dlen = self.manifest.get("min_dlen", 1)

    def _postings_paths(self) -> list[str]:
        import glob

        out: list[str] = []
        for w in range(self.manifest["num_waves"]):
            d = os.path.join(self.index_dir, "waves", f"w{w:04d}", "postings")
            out.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        return out

    def search(self, query: str, k: int = 10) -> pa.Table:
        return self.search_many({"q": query}, k)["q"]

    def search_many(self, queries: dict[str, str], k: int = 10) -> dict[str, pa.Table]:
        import ray.data

        from probe_ray.query.bm25 import MAX_QUERY_TERMS
        from probe_ray.search.scan import scan_search_many

        plans: dict[str, QueryPlan] = {}
        scan_queries: dict[str, str] = {}
        results: dict[str, pa.Table] = {}
        for name, q in queries.items():
            try:
                plan = create_query_plan(q)
            except Exception:
                results[name] = _empty_result()
                continue
            if len(plan.term_indices) > MAX_QUERY_TERMS:
                results[name] = _empty_result()
            elif plan.special_terms:
                scan_queries[name] = q
            else:
                plans[name] = plan

        if scan_queries:
            results.update(
                scan_search_many(
                    self.manifest["input_files"], scan_queries, k
                )
            )
        if not plans:
            return results

        all_terms = sorted({t for p in plans.values() for t in p.term_indices})
        ds = ray.data.read_parquet(
            self._postings_paths(),
            filter=pc.field("term").isin(all_terms),
        )
        mat = ds.materialize()
        df_rows = mat.select_columns(["term", "df"]).take_all()
        df_global: dict[str, int] = {}
        for r in df_rows:
            df_global[r["term"]] = df_global.get(r["term"], 0) + int(r["df"])

        specs = []
        for name, plan in plans.items():
            idfs = {
                t: idf_fn(self.n_docs, df_global[t])
                for t in plan.term_indices
                if df_global.get(t, 0) > 0
            }
            specs.append(
                _QuerySpec(
                    name=name,
                    plan=plan,
                    idfs=idfs,
                    need_fill=zero_match_included(plan.ast),
                )
            )

        if mat.count() == 0:
            parts: list[pa.Table] = []
        else:
            scored = mat.groupby(["wave", "subshard"]).map_groups(
                functools.partial(
                    score_group,
                    index_dir=self.index_dir,
                    specs=specs,
                    k=k,
                    avgdl=self.avgdl,
                    min_dlen=self.min_dlen,
                ),
                batch_format="pyarrow",
            )
            parts = [pa.table(b) for b in scored.iter_batches(batch_format="pyarrow")]
        merged = (
            pa.concat_tables(parts)
            if parts
            else _empty_scored()
        )

        for spec in specs:
            use = merged.filter(pc.equal(merged.column("query"), spec.name))
            if spec.need_fill and use.num_rows < k:
                fill = self._fill_rows(spec, mat, k - use.num_rows)
                if fill is not None and fill.num_rows:
                    use = pa.concat_tables(
                        [use.select(fill.schema.names), fill]
                    )
            idx = pc.sort_indices(
                use,
                sort_keys=[
                    ("score", "descending"),
                    ("repo", "ascending"),
                    ("path", "ascending"),
                ],
            )[:k]
            top = use.take(idx)
            results[spec.name] = _finalize(top)
        return results

    def _docstats_files(self) -> list[str]:
        files = []
        for wm in self.manifest["waves"]:
            w = wm["wave"]
            for s in wm.get("subshards", []):
                files.append(_docstats_path(self.index_dir, w, s["subshard"]))
        return files

    def _fill_rows(self, spec: _QuerySpec, mat, need: int) -> pa.Table | None:
        """Zero-match docs (included at score 0 by the AST) in global
        (repo, path) order — needed only when matches < k (rare queries:
        only-excluded, field-only). Exact; heavy for hot excluded terms,
        which is inherent to their semantics."""
        import ray.data

        from probe_ray.index.build import _load_docmap

        cand_hashes: set[int] = set()
        for r in mat.take_all():
            if r["term"] not in spec.plan.term_indices:
                continue
            docmap = _load_docmap(self.index_dir, int(r["wave"]), int(r["subshard"]))
            local = decode_varint_deltas(r["payload"], int(r["df"]))
            cand_hashes.update(docmap[local.astype(np.int64)].tolist())

        stats_ds = ray.data.read_parquet(
            self._docstats_files(),
            columns=["doc_hash", "repo", "path", "commit", "lang", "sha256", "doc_len"],
        )
        cand_arr = np.fromiter(cand_hashes, dtype=np.int64) if cand_hashes else None

        def local_min(batch: pa.Table) -> pa.Table:
            if cand_arr is not None and len(cand_arr):
                keep = ~np.isin(batch.column("doc_hash").to_numpy(), cand_arr)
                batch = batch.filter(pa.array(keep))
            idx = pc.sort_indices(
                batch, sort_keys=[("repo", "ascending"), ("path", "ascending")]
            )[: need + 1]
            return batch.take(idx)

        got = pa.concat_tables(
            [
                pa.table(b)
                for b in stats_ds.map_batches(
                    local_min, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow")
            ]
        )
        if got.num_rows == 0:
            return None
        idx = pc.sort_indices(
            got, sort_keys=[("repo", "ascending"), ("path", "ascending")]
        )[:need]
        got = got.take(idx)
        n = got.num_rows
        return pa.table(
            {
                "query": pa.array([spec.name] * n, pa.string()),
                "score": pa.array(np.zeros(n), pa.float64()),
                "repo": got.column("repo"),
                "path": got.column("path"),
                "commit": got.column("commit"),
                "lang": got.column("lang"),
                "sha256": got.column("sha256"),
                "doc_len": got.column("doc_len"),
            }
        )


def _empty_scored() -> pa.Table:
    return pa.table(
        {
            "query": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "repo": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "commit": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "sha256": pa.array([], pa.string()),
            "doc_len": pa.array([], pa.int32()),
            "wave": pa.array([], pa.int32()),
            "subshard": pa.array([], pa.int32()),
            "is_fill": pa.array([], pa.bool_()),
        }
    )


def _empty_result() -> pa.Table:
    return pa.table(
        {
            "rank": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "repo": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "commit": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "sha256": pa.array([], pa.string()),
        }
    )


def _finalize(top: pa.Table) -> pa.Table:
    return pa.table(
        {
            "rank": pa.array(np.arange(1, top.num_rows + 1), pa.int64()),
            "score": top.column("score"),
            "repo": top.column("repo"),
            "path": top.column("path"),
            "commit": top.column("commit"),
            "lang": top.column("lang"),
            "sha256": top.column("sha256"),
        }
    )
