"""Zipfian-corpus query rehearsal (round-3 VERDICT item 6).

The standard synthetic corpus draws its common words from a 35-word
pool, so every common word has df ~= N and block-max pruning has no
rare term to anchor a threshold (round-3 10M-doc rehearsal, bottleneck
#2). This harness generates the SAME corpus shape with a large Zipfian
vocabulary (synth.make_rows(zipf_vocab=...)), builds the index, runs a
query ladder spanning the df spectrum, and reports per-query warm
latency plus block-max pruning effectiveness (hot posting blocks
decoded / total — from searcher.PRUNE_STATS via
IndexReader.prune_stats).

Usage:
    python tools/rehearse_zipf.py [--rows 10000000] [--vocab 200000] \
        [--dir /tmp/probe_ray_bench/zipf] [--cpus 32] [--waves 4] \
        [--subshards 32] [--reps 5]

Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_corpus(d: str, rows: int, vocab: int, nfiles: int) -> str:
    import ray

    marker = os.path.join(d, "_done")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)

    import pyarrow.parquet as pq

    from probe_ray.data.synth import make_rows

    @ray.remote
    def gen(part: int, start: int, count: int) -> str:
        p = os.path.join(d, f"part-{part:05d}.parquet")
        pq.write_table(
            make_rows(start, count, zipf_vocab=vocab),
            p,
            row_group_size=2048,
        )
        return p

    per = (rows + nfiles - 1) // nfiles
    futs, start = [], 0
    for f in range(nfiles):
        count = min(per, rows - start)
        if count <= 0:
            break
        futs.append(gen.remote(f, start, count))
        start += count
    ray.get(futs)
    open(marker, "w").close()
    return d


def query_ladder(vocab: int) -> dict[str, str]:
    """Queries spanning the df spectrum. zipf_word(r) is the rank-r word;
    with s=1.07 over a 200k vocabulary at 10M docs, rank 0 has df ~= N,
    rank ~2000 df ~= tens of thousands, rank ~50000 df ~= hundreds."""
    from probe_ray.data.synth import zipf_word

    w = zipf_word
    mid = min(2000, vocab // 100)
    rare = min(50_000, vocab // 4)
    deep = min(150_000, vocab - 1)
    semi = min(30, max(4, vocab // 6000))
    return {
        "hot_single": w(0),
        "hot_and_hot": f"{w(0)} AND {w(1)}",
        "hot_or_hot": f"{w(2)} OR {w(3)}",
        "hot_and_semi": f"{w(0)} AND {w(semi)}",  # anchor df ~0.1N:
        # thousands of candidates/segment — the anchored-refinement case
        "hot_and_mid": f"{w(0)} AND {w(mid)}",
        "hot_and_rare": f"{w(1)} AND {w(rare)}",
        "mid_single": w(mid),
        "mid_and_mid": f"{w(mid)} AND {w(mid + 7)}",
        "rare_single": w(rare),
        "rare_or_deep": f"{w(rare)} OR {w(deep)}",
        "hot_not_mid": f"{w(0)} -{w(mid)}",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--vocab", type=int, default=200_000)
    ap.add_argument("--dir", default="/tmp/probe_ray_bench/zipf")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--subshards", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--nfiles", type=int, default=64)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus, include_dashboard=False
        )

    t0 = time.time()
    corpus = gen_corpus(args.dir, args.rows, args.vocab, args.nfiles)
    gen_s = time.time() - t0

    from probe_ray.index.build import IndexConfig, build_index
    from probe_ray.search.searcher import IndexReader

    idx = os.path.join(args.dir, f"idx_w{args.waves}s{args.subshards}")
    # The index nests inside the corpus dir: pass the explicit part
    # files, not the dir, so a resumed build never sweeps its own
    # partial output into the input fragment list.
    parts = sorted(
        os.path.join(corpus, f)
        for f in os.listdir(corpus)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    t0 = time.time()
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        build_index(
            parts,
            idx,
            IndexConfig(num_waves=args.waves, subshards=args.subshards),
        )
    build_s = time.time() - t0

    rd = IndexReader(idx)
    out: dict[str, dict] = {}
    ladder = query_ladder(args.vocab)
    # df ladder evidence (and term warmup)
    dfs = rd.df_lookup(
        sorted({t for q in ladder.values() for t in q.replace("-", " ").split() if t not in ("AND", "OR")})
    )
    for name, q in ladder.items():
        rd.search(q, k=10)  # warm postings/doc-stats caches
        rd.prune_stats(reset=True)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            rd.search(q, k=10)
            times.append(time.time() - t0)
        st = rd.prune_stats(reset=True)
        tot = st["hot_blocks_total"]
        dec = st["hot_blocks_decoded"]
        ts = sorted(times)
        out[name] = {
            "query": q,
            "p50_ms": round(1000 * statistics.median(times), 1),
            "p99_ms": round(
                1000 * ts[min(len(ts) - 1, int(0.99 * len(ts)))], 1
            ),
            "hot_terms": st["hot_terms"] // args.reps,
            "blocks_total": tot // args.reps,
            "blocks_decoded": dec // args.reps,
            "skipped_pct": round(100 * (1 - dec / tot), 1) if tot else None,
        }
    rd.close()
    print(
        json.dumps(
            {
                "rows": args.rows,
                "vocab": args.vocab,
                "gen_seconds": round(gen_s, 1),
                "build_seconds": round(build_s, 1),
                "term_dfs": dfs,
                "queries": out,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
