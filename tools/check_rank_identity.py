"""Rank-identity validation at arbitrary scale: build (or reuse) the index
over the documents-table corpus, run the full reference query set through
the distributed engine, and compare (path, score) lists against the
pure-Python rank_documents oracle over the same corpus.

Usage: python tools/check_rank_identity.py [sf_dir] [k]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, log_to_driver=False)

    import pyarrow.dataset as pads

    from probe_ray.ops.fts import DOC_QUERIES, REFERENCE_QUERIES, corpus_parquet, ensure_index
    from probe_ray.query.bm25 import rank_files
    from probe_ray.search.searcher import IndexReader

    idx = ensure_index(SF_DIR)
    rd = IndexReader(idx)

    corpus = (
        pads.dataset(corpus_parquet(SF_DIR))
        .to_table(columns=["repo", "path", "content"])
        .sort_by([("repo", "ascending"), ("path", "ascending")])
    )
    rows = list(
        zip(corpus.column("path").to_pylist(), corpus.column("content").to_pylist())
    )
    paths = corpus.column("path").to_pylist()

    n_ok = n_bad = 0
    for name, q in {**REFERENCE_QUERIES, **DOC_QUERIES}.items():
        got = rd.search(q, k=K)
        engine = [
            (r["path"], round(r["score"], 12)) for r in got.to_pylist()
        ]
        oracle_ranked = rank_files(rows, q)[:K]
        oracle = [
            (paths[i], round(s, 12)) for i, s in oracle_ranked
        ]
        ok = engine == oracle
        n_ok += ok
        n_bad += not ok
        print(("OK  " if ok else "FAIL"), name, f"({len(engine)} results)")
        if not ok:
            for a, b in zip(engine, oracle):
                if a != b:
                    print("   engine:", a, "\n   oracle:", b)
                    break
    rd.close()
    print(f"\nSUMMARY ok={n_ok} fail={n_bad} (k={K}, {len(rows)} docs)")
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
