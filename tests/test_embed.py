"""Text -> embedding -> near-dup chain (ops/embed.py): actor-pool model
stage + blockwise broadcast similarity join, validated against a scalar
recomputation of the same embedder + threshold over the same corpus."""

from __future__ import annotations


import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _collect(ds):
    return pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )


def test_embedder_unit():
    from probe_ray.ops.embed import HashEmbedder

    e = HashEmbedder()
    t = pa.table({"doc_id": [1, 2], "text": ["a b a", "a b a"]})
    out = e(t)
    v = out.column("embedding").to_pylist()
    assert v[0] == v[1]  # deterministic + identical inputs
    import numpy as np

    assert abs(np.linalg.norm(v[0]) - 1.0) < 1e-12


def test_chain_matches_scalar_and_is_nonvacuous(ray_session):
    """Distributed chain == scalar recomputation (same embedder, full
    matmul, same milli rounding); the corpus' engineered near-dups make
    the result non-empty at the default threshold."""
    import numpy as np

    from probe_ray.ops.embed import HashEmbedder, text_embed_neardup_pairs

    got = _collect(text_embed_neardup_pairs(SF))
    assert got.num_rows > 0, "vacuous: no near-dup pairs found"

    t = (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        .sort_by([("doc_id", "ascending")])
    )
    ids = np.asarray(t.column("doc_id").to_pylist())
    keep = ids < 500
    v = HashEmbedder()._embed(
        [x for x, k in zip(t.column("text").to_pylist(), keep) if k]
    )
    ids = ids[keep]
    sims = np.floor((v @ v.T) * 1000.0 + 0.5).astype(np.int64)
    expected = sorted(
        (int(ids[i]), int(ids[j]), int(sims[i, j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and sims[i, j] >= 995
    )
    assert [
        (r["a_id"], r["b_id"], r["sim_milli"]) for r in got.to_pylist()
    ] == expected
    # determinism
    got2 = _collect(text_embed_neardup_pairs(SF))
    assert got.equals(got2)


def test_ann_recall_monotone_and_exact_at_full_probe(ray_session):
    """ann_recall: recall@k is non-decreasing in nprobe, and probing all
    centroids IS the exact search (recall_milli == 1000). Also pins the
    truth-set size: n_truth == nq * k at every level."""
    import pyarrow as pa

    from probe_ray.ops.ann import N_CENTROIDS, ann_recall

    t = ann_recall("/root/testdata/sf0.001", k=10, nq=8)
    assert isinstance(t, pa.Table)
    nprobe = t.column("nprobe").to_pylist()
    rec = t.column("recall_milli").to_pylist()
    truth = t.column("n_truth").to_pylist()
    assert nprobe[-1] == N_CENTROIDS
    assert rec == sorted(rec), "recall must be monotone in nprobe"
    assert rec[-1] == 1000, "full probe must equal exact search"
    assert all(x == 8 * 10 for x in truth)
