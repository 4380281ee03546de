"""Concurrent-query (QPS) rehearsal (round-5 VERDICT item 6).

The engine's stated usage shape is an MCP/agent backend, so queries
arrive CONCURRENTLY at one warm ``IndexReader`` — but every bench so
far issues them one at a time. This harness drives N driver threads
round-robin over a query mix against a single warm reader/actor pool
and reports throughput (QPS) plus per-query p50/p99 at each
concurrency level. Each in-flight query fans out to every
``SegmentWorker`` actor (each owns a segment subset), so concurrency
exercises per-actor request queuing — the axis the one-at-a-time bench
never touches.

Two query sources:
  --index DIR --vocab V   reuse a rehearse_zipf index; the query mix is
                          the Zipf df ladder (hot/mid/rare AND/OR/NOT)
  --sf-dir DIR            ensure the sf corpus index (ops.fts) and use
                          REFERENCE_QUERIES (index-path entries only)

Usage:
    python tools/rehearse_qps.py --index /tmp/pr5/zipf2m/idx_w2s16 \
        --vocab 100000 [--concurrency 1,4,16] [--nqueries 200] [--cpus 32]

Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pctl(xs: list[float], q: float) -> float:
    ys = sorted(xs)
    return ys[min(len(ys) - 1, int(q * len(ys)))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default=None)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--concurrency", default="1,4,16")
    ap.add_argument(
        "--batch",
        action="store_true",
        help="issue the whole query mix per call via search_many (the "
        "MCP/agent batching shape): one actor fan-out serves all "
        "queries of the batch, amortizing the per-query RPC round",
    )
    ap.add_argument("--nqueries", type=int, default=200)
    ap.add_argument(
        "--index-only",
        action="store_true",
        help="drop special-term (hybrid-lane) queries from the mix — "
        "the pure index-path ceiling",
    )
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus, include_dashboard=False
        )

    from probe_ray.search.searcher import IndexReader

    if args.index:
        from tools.rehearse_zipf import query_ladder

        idx = args.index
        mix = query_ladder(args.vocab)
        label = f"zipf:{os.path.basename(idx)}"
    else:
        from probe_ray.ops.fts import REFERENCE_QUERIES, ensure_index

        sf = args.sf_dir or "/root/testdata/sf0.1"
        idx = ensure_index(sf)
        # index-path entries only: special-term queries take the hybrid
        # scan lane whose latency is a separate, documented budget
        from probe_ray.query.bm25 import create_query_plan

        mix = {}
        for n, q in REFERENCE_QUERIES.items():
            try:
                if not create_query_plan(q).special_terms:
                    mix[n] = q
            except Exception:
                pass
        label = f"sf:{sf}"

    rd = IndexReader(idx)
    if args.index_only:
        mix = {
            n: q
            for n, q in mix.items()
            if rd.explain(q).get("path") == "index"
        }
    names = sorted(mix)
    # warm: every query once (postings/doc-stats caches, actor pool up)
    for n in names:
        rd.search(mix[n], k=args.k)

    levels = [int(c) for c in args.concurrency.split(",")]
    out: dict[str, dict] = {}
    if args.batch:
        ncalls = max(1, args.nqueries // len(names))
        work = list(range(ncalls))

        def one(_i: int) -> float:
            t0 = time.time()
            rd.search_many(mix, k=args.k)
            return (time.time() - t0) / len(names)  # per-query latency

    else:
        work = [names[i % len(names)] for i in range(args.nqueries)]

        def one(qname: str) -> float:
            t0 = time.time()
            rd.search(mix[qname], k=args.k)
            return time.time() - t0

    per_call = len(names) if args.batch else 1
    for c in levels:
        with ThreadPoolExecutor(max_workers=c) as ex:
            t0 = time.time()
            lats = list(ex.map(one, work))
            wall = time.time() - t0
        out[str(c)] = {
            "qps": round(len(work) * per_call / wall, 1),
            "p50_ms": round(1000 * statistics.median(lats), 1),
            "p99_ms": round(1000 * _pctl(lats, 0.99), 1),
            "wall_s": round(wall, 2),
        }

    rd.close()
    print(
        json.dumps(
            {
                "source": label,
                "n_queries": args.nqueries,
                "query_mix": len(names),
                "k": args.k,
                "num_cpus": args.cpus,
                "levels": out,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
