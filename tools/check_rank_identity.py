"""Rank-identity validation at arbitrary scale: build (or reuse) both
driver-visible indexes — the synthetic code-table corpus for the
code-flavored reference query set, the documents-table corpus for the
doc query set — run every query through the distributed engine, and
compare (path, score) lists against the pure-Python rank_documents
oracle over the same corpus.

Non-vacuity is enforced: queries expected to hit (everything except the
explicit negative controls) FAIL the run if both engine and oracle
return nothing — a 0==0 match demonstrates nothing.

Usage: python tools/check_rank_identity.py [sf_dir] [k]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# queries whose empty result is the expected outcome
NEGATIVE_CONTROLS = {"empty_result"}


def _corpus_rows(corpus_dir):
    import pyarrow.dataset as pads

    t = (
        pads.dataset(corpus_dir)
        .to_table(columns=["repo", "path", "content"])
        .sort_by([("repo", "ascending"), ("path", "ascending")])
    )
    rows = list(
        zip(t.column("path").to_pylist(), t.column("content").to_pylist())
    )
    return rows, t.column("path").to_pylist()


def _check(reader, queries, rows, paths):
    from probe_ray.query.bm25 import rank_files

    n_ok = n_bad = n_vacuous = 0
    for name, q in queries.items():
        got = reader.search(q, k=K)
        engine = [(r["path"], round(r["score"], 12)) for r in got.to_pylist()]
        oracle = [
            (paths[i], round(s, 12)) for i, s in rank_files(rows, q)[:K]
        ]
        ok = engine == oracle
        vacuous = not engine and not oracle and name not in NEGATIVE_CONTROLS
        n_ok += ok and not vacuous
        n_bad += not ok
        n_vacuous += vacuous
        tag = "FAIL" if not ok else ("VACUOUS" if vacuous else "OK  ")
        print(tag, name, f"({len(engine)} results)")
        if not ok:
            for a, b in zip(engine, oracle):
                if a != b:
                    print("   engine:", a, "\n   oracle:", b)
                    break
    return n_ok, n_bad, n_vacuous


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, log_to_driver=False)

    from probe_ray.ops.fts import (
        DOC_QUERIES,
        REFERENCE_QUERIES,
        code_corpus_parquet,
        corpus_parquet,
        ensure_code_index,
        ensure_index,
    )
    from probe_ray.search.searcher import IndexReader

    tot_ok = tot_bad = tot_vac = 0
    for label, queries, corpus, idx in (
        ("code", REFERENCE_QUERIES, code_corpus_parquet(SF_DIR), ensure_code_index(SF_DIR)),
        ("docs", DOC_QUERIES, corpus_parquet(SF_DIR), ensure_index(SF_DIR)),
    ):
        print(f"--- {label} corpus ---")
        rows, paths = _corpus_rows(corpus)
        rd = IndexReader(idx)
        ok, bad, vac = _check(rd, queries, rows, paths)
        rd.close()
        print(f"{label}: ok={ok} fail={bad} vacuous={vac} ({len(rows)} docs)\n")
        tot_ok += ok
        tot_bad += bad
        tot_vac += vac

    print(f"SUMMARY ok={tot_ok} fail={tot_bad} vacuous={tot_vac} (k={K})")
    ray.shutdown()
    return 1 if (tot_bad or tot_vac) else 0


if __name__ == "__main__":
    raise SystemExit(main())
