"""Hybrid RRF retrieval (ops/fts.py:hybrid_rrf_search): fused ranking
pinned against a driver-side scalar recomputation from the raw tables."""

import numpy as np
import pyarrow.parquet as pq

from probe_ray.ops import fts

SF = "/root/testdata/sf0.001"


def scalar_rrf(sf_dir, query, k, fetch_k):
    bm25 = fts._reader(fts.ensure_index(sf_dir)).search(query, k=fetch_k)
    bm_ids = [
        fts._doc_id_from_path(p) for p in bm25.column("path").to_pylist()
    ]
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by([("vec_id", "ascending")])
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    vid = np.array(t.column("vec_id").to_pylist())
    sims = m @ m[np.flatnonzero(vid == bm_ids[0])[0]]
    order = np.lexsort((vid, -sims))[:fetch_k]
    ann_ids = vid[order].tolist()
    score, flags = {}, {}
    for rank, d in enumerate(bm_ids, 1):
        score[d] = score.get(d, 0) + 1_000_000_000 // (fts.RRF_C + rank)
        flags.setdefault(d, [0, 0])[0] = 1
    for rank, d in enumerate(ann_ids, 1):
        score[d] = score.get(d, 0) + 1_000_000_000 // (fts.RRF_C + rank)
        flags.setdefault(d, [0, 0])[1] = 1
    fused = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [
        (i + 1, d, s // 1000, flags[d][0], flags[d][1])
        for i, (d, s) in enumerate(fused)
    ]


def test_hybrid_rrf_matches_scalar(ray_session):
    got = fts.hybrid_rrf_search(SF, k=10, fetch_k=50)
    want = scalar_rrf(SF, "hash AND join", 10, 50)
    assert [
        (r["rank"], r["doc_id"], r["rrf_milli"], r["in_bm25"], r["in_ann"])
        for r in got.to_pylist()
    ] == want
    # non-vacuous: both retrieval modes contribute
    rows = got.to_pylist()
    assert any(r["in_bm25"] for r in rows) and any(r["in_ann"] for r in rows)


def test_hybrid_rrf_fetch_k_monotone(ray_session):
    """The top-1 (the BM25 seed doc, which is also its own nearest
    neighbor) is stable across fetch_k."""
    a = fts.hybrid_rrf_search(SF, k=3, fetch_k=20).to_pylist()
    b = fts.hybrid_rrf_search(SF, k=3, fetch_k=50).to_pylist()
    assert a[0]["doc_id"] == b[0]["doc_id"]
