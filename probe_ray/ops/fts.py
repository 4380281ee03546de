"""Fulltext pipelines over the testdata ``documents`` table.

Maps documents into the canonical code-table shape
(repo, path, commit, lang, content) per BASELINE.json input_hint, builds
the inverted index once per sf_dir (cached under /tmp), and exposes
search + index-introspection operators for the driver's correctness gate."""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow as pa

from probe_ray.index.build import IndexConfig, build_index
from probe_ray.search.searcher import IndexReader

CACHE_ROOT = "/tmp/probe_ray_cache"


def _cache_dir(sf_dir: str) -> str:
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(CACHE_ROOT, key)


def corpus_parquet(sf_dir: str) -> str:
    """documents -> (repo, path, commit, lang, content) parquet, cached."""
    import ray.data

    out = os.path.join(_cache_dir(sf_dir), "corpus")
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        sources = batch.column("source").to_pylist()
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "repo": pa.array(sources, pa.string()),
                "path": pa.array(
                    [f"{s}/doc_{d:08d}.txt" for s, d in zip(sources, doc_ids)],
                    pa.string(),
                ),
                "commit": pa.array(
                    [hashlib.sha1(s.encode()).hexdigest() for s in sources],
                    pa.string(),
                ),
                "lang": pa.array(langs, pa.string()),
                "content": pa.array(texts, pa.string()),
            }
        )

    os.makedirs(out, exist_ok=True)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet").map_batches(
        fn, batch_format="pyarrow"
    )
    # small row groups => the scan path's reads split across CPUs
    ds.write_parquet(out, row_group_size=2048)
    open(marker, "w").close()
    return out


def ensure_index(sf_dir: str) -> str:
    import json
    import shutil

    from probe_ray import ENGINE_VERSION

    corpus = corpus_parquet(sf_dir)
    idx = os.path.join(_cache_dir(sf_dir), "index")
    mpath = os.path.join(idx, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            m = json.load(f)
        if m.get("version") == 2 and m.get("engine_version") == ENGINE_VERSION:
            return idx
        shutil.rmtree(idx, ignore_errors=True)
    build_index([corpus], idx, IndexConfig(num_waves=2, subshards=4))
    return idx


REFERENCE_QUERIES = {
    "single_term": "setTools",
    "and": "error AND handling",
    "or_chain": "login OR authentication OR auth",
    "grouped": "(error OR exception) AND (handle OR process)",
    "excluded": "database -sqlite",
    "required": "+api +process load",
    "and_pair": "ip AND whitelist",
    "quoted_exact": '"JWTMiddleware"',
    "quoted_with_negative": '"setTools" -database',
    "camel_compound": "RPCStorageHandler",
    "camel_exception": "enableFirewallWhitelist",
    "determinism_stressor": "yaml workflow agent multi-agent user input",
    "generic": "keyword",
    "empty_result": "nonexistent_xyz",
}

# documents-table-flavored queries (the synthetic documents text is
# data-engineering English, not code — still exercises the same paths)
DOC_QUERIES = {
    "docs_single": "shuffle",
    "docs_and": "hash AND join",
    "docs_or": "scan OR filter OR sort",
    "docs_required": "+table +row merge",
    "docs_excluded": "partition -window",
}


_READER_CACHE: dict[str, IndexReader] = {}


def _reader(idx: str) -> IndexReader:
    """One IndexReader (and its persistent query actor pool) per index —
    repeated queries() calls reuse warm actors instead of paying pool
    startup per query."""
    rd = _READER_CACHE.get(idx)
    if rd is None:
        rd = IndexReader(idx)
        _READER_CACHE[idx] = rd
    return rd


def fts_search(sf_dir: str, name: str, k: int = 10) -> pa.Table:
    idx = ensure_index(sf_dir)
    q = {**REFERENCE_QUERIES, **DOC_QUERIES}[name]
    return _reader(idx).search(q, k=k)


def fts_search_all(sf_dir: str, k: int = 10) -> dict[str, pa.Table]:
    idx = ensure_index(sf_dir)
    return _reader(idx).search_many({**REFERENCE_QUERIES, **DOC_QUERIES}, k=k)


def corpus_sha256(sf_dir: str) -> pa.Table:
    """Per-row invariant surface: (path, sha256) straight from the index's
    docstats — compared by the driver against sha256(text) in SQL."""
    import pyarrow.parquet as pq

    idx = ensure_index(sf_dir)
    tables = []
    for f in sorted(
        glob.glob(os.path.join(idx, "waves", "*", "docstats", "*.parquet"))
    ):
        tables.append(pq.read_table(f, columns=["path", "sha256"]))
    t = pa.concat_tables(tables)
    return t.sort_by([("path", "ascending")])


def index_doc_stats(sf_dir: str) -> pa.Table:
    """(n_docs, n_distinct_sha) from the index — SQL-checkable."""
    import pyarrow.parquet as pq

    idx = ensure_index(sf_dir)
    shas = []
    n = 0
    for f in sorted(
        glob.glob(os.path.join(idx, "waves", "*", "docstats", "*.parquet"))
    ):
        t = pq.read_table(f, columns=["sha256"])
        n += t.num_rows
        shas.extend(t.column("sha256").to_pylist())
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_distinct_sha": pa.array([len(set(shas))], pa.int64()),
        }
    )


def term_df_topk(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k document-frequency terms from the postings (term, df) —
    index introspection; ties broken by term asc."""
    import pyarrow.parquet as pq

    idx = ensure_index(sf_dir)
    df: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(idx, "waves", "*", "postings", "*.parquet"))):
        t = pq.read_table(f, columns=["term", "df"])
        for term, d in zip(t.column("term").to_pylist(), t.column("df").to_pylist()):
            df[term] = df.get(term, 0) + int(d)
    top = sorted(df.items(), key=lambda p: (-p[1], p[0]))[:k]
    return pa.table(
        {
            "term": pa.array([t for t, _ in top], pa.string()),
            "df": pa.array([d for _, d in top], pa.int64()),
        }
    )
