"""Benchmark harness.

Default: one JSON line with headline timings over $GRAFT_SF_DIR
(default /root/testdata/sf0.1) at $RAY_GRAFT_CPUS (default 32):
  - synthetic code-corpus generation (cached), inverted-index build
    (files/s, MB/s), reference-query-set execution (per-query seconds)
  - documents-table ops (dedup, token stats, ANN)

--scaling: runs the index build + query set twice in fresh Ray sessions at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs
plus scaling efficiency = rate32 / (4 * rate8)  (the sandbox stand-in for
the N- vs 4N-node cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROOT = "/tmp/probe_ray_bench"


def _sf() -> float:
    base = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _corpus(rows: int, stmt_scale: int = 1, nfiles: int = 16) -> str:
    """Cached deterministic synthetic corpus (parallel generation)."""
    import ray

    d = os.path.join(BENCH_ROOT, f"corpus_{rows}_x{stmt_scale}")
    marker = os.path.join(d, "_done")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)

    from probe_ray.data.synth import make_rows

    import pyarrow.parquet as pq

    @ray.remote
    def gen(part: int, start: int, count: int) -> str:
        p = os.path.join(d, f"part-{part:05d}.parquet")
        # small row groups: parquet reads can only split AT row-group
        # boundaries, and a single-row-group file caps the fused
        # read->tokenize stage at one task per file
        pq.write_table(
            make_rows(start, count, stmt_scale=stmt_scale), p,
            row_group_size=2048,
        )
        return p

    per = (rows + nfiles - 1) // nfiles
    futs = []
    start = 0
    for f in range(nfiles):
        count = min(per, rows - start)
        if count <= 0:
            break
        futs.append(gen.remote(f, start, count))
        start += count
    ray.get(futs)
    open(marker, "w").close()
    return d


def _effective_parallelism(num_cpus: int) -> float:
    """Calibration: how many CPUs' worth of cycles the host actually
    delivers right now. This sandbox VM's hypervisor sometimes caps the
    machine at ~a third of its vCPUs for minutes at a time; a scaling
    ratio measured during such a window reflects the host, not the
    engine — so every measurement self-reports this number."""
    import ray

    @ray.remote(num_cpus=1)
    def spin(n: int) -> float:
        t0 = time.time()
        x = 0
        for i in range(n):
            x += i * i
        return time.time() - t0

    n = 3_000_000
    # Warm the worker pool with a full-size concurrent round (untimed):
    # a cold measurement folds worker-process startup into the wall time
    # and under-reads badly (~1.3 "effective CPUs" at num_cpus=4 on an
    # idle host), and short warmup tasks don't help — Ray reuses a few
    # fast-turnaround workers instead of spawning the whole pool, so the
    # timed round still pays the startup. Only a round that actually
    # occupies num_cpus slots at once forces the full pool into being.
    ray.get([spin.remote(n) for _ in range(num_cpus)])
    t_single = ray.get(spin.remote(n))
    t0 = time.time()
    singles = ray.get([spin.remote(n) for _ in range(num_cpus)])
    wall = time.time() - t0
    return round(num_cpus * min(min(singles), t_single) / wall, 2)


def _warmup_ray_data():
    """One tiny Dataset round before timing: starts Ray Data's worker
    processes and executor so measured build time is steady-state engine
    throughput, not session cold-start (which a long-running cluster pays
    once, not per job)."""
    import ray
    import ray.data

    # one block per CPU + a brief hold per task forces the FULL worker
    # pool to spawn (a single tiny block warms only 1-2 workers and the
    # first timed op then pays the rest of the ramp)
    cpus = int(ray.cluster_resources().get("CPU", 8))

    def hold(b):
        time.sleep(0.2)
        return b

    ds = ray.data.range(cpus * 4, override_num_blocks=cpus)
    ds.map_batches(hold, batch_format="pyarrow").materialize()


def _timed(fn, reps: int, stat: str) -> tuple[float, object]:
    """Run fn reps times; return (rounded median or min of the wall
    times, last return value)."""
    samples, out = [], None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        samples.append(time.time() - t0)
    samples.sort()
    val = samples[len(samples) // 2] if stat == "median" else samples[0]
    return round(val, 4), out


def _corpus_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def run_headline(
    num_cpus: int,
    rows: int,
    tag: str,
    stmt_scale: int = 1,
    subshards: int | None = None,
    run_queries: bool = True,
    num_waves: int = 2,
) -> dict:
    """Fresh Ray session: build index over the synthetic corpus + run the
    reference query set. Returns timings."""
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        log_to_driver=False,
    )
    try:
        from probe_ray.index.build import IndexConfig, build_index
        from probe_ray.ops.fts import REFERENCE_QUERIES
        from probe_ray.search.searcher import IndexReader

        corpus = _corpus(rows, stmt_scale)
        # per-run growable hardlink copy: the incremental-append timing
        # below adds a shard to the input dir; the shared cached corpus
        # must stay pristine across runs
        grow = os.path.join(BENCH_ROOT, f"grow_{rows}_{tag}")
        shutil.rmtree(grow, ignore_errors=True)
        os.makedirs(grow)
        for f in os.listdir(corpus):
            if f.endswith(".parquet"):
                os.link(os.path.join(corpus, f), os.path.join(grow, f))
        _warmup_ray_data()
        eff_par = _effective_parallelism(num_cpus)
        nbytes = _corpus_bytes(corpus)
        idx = os.path.join(BENCH_ROOT, f"index_{rows}_{tag}")
        shutil.rmtree(idx, ignore_errors=True)
        cfg = IndexConfig(
            num_waves=num_waves,
            subshards=subshards or max(4, num_cpus // 4),
        )
        t0 = time.time()
        build_index([grow], idx, cfg)
        build_s = time.time() - t0
        if not run_queries:
            return {
                "build_seconds": round(build_s, 3),
                "docs_per_sec": round(rows / build_s, 1),
                "mb_per_sec": round(nbytes / 1e6 / build_s, 2),
                "rows": rows,
                "corpus_bytes": nbytes,
                "effective_parallelism": eff_par,
            }

        from probe_ray.query.bm25 import create_query_plan

        rd = IndexReader(idx)
        qtimes = {}
        # warm (starts the actor pool, loads docstats caches)
        rd.search("setTools", k=10)
        for name, q in REFERENCE_QUERIES.items():
            special = bool(create_query_plan(q).special_terms)
            # dynamic special queries run a candidate pipeline (unit-
            # postings discovery + candidate re-tokenize) — cheap enough
            # to take a median of 3; index-path queries median of 5
            qtimes[f"fts_{name}"], _ = _timed(
                lambda q=q: rd.search(q, k=10),
                reps=3 if special else 5, stat="median",
            )
        # all index-path queries in ONE search_many batch: the shared
        # candidate/postings pass amortizes per-query overhead — the
        # realistic agent/MCP usage shape (reference serves one query per
        # process; this engine batches)
        batch_qs = {
            n: q
            for n, q in REFERENCE_QUERIES.items()
            if not create_query_plan(q).special_terms
        }
        t1 = time.time()
        rd.search_many(batch_qs, k=10)
        qtimes["fts_batch_index_path"] = round(time.time() - t1, 4)
        # block-granularity search + extract over the same corpus/index
        from probe_ray.search.blocks import search_blocks
        from probe_ray.search.extract import extract as extract_specs

        cfiles = sorted(
            os.path.join(grow, f)
            for f in os.listdir(grow)
            if f.endswith(".parquet")
        )
        # median of 3, like the query entries: the first rep also pays the
        # session's first task-pool Dataset pipeline spin-up, which is
        # Ray's constant, not the operator's cost
        qtimes["fts_blocks_and"], bt = _timed(
            lambda: search_blocks(rd, cfiles, "error AND handling", k=10),
            reps=3, stat="median",
        )
        qtimes["fts_blocks_merged"], _ = _timed(
            lambda: search_blocks(
                rd, cfiles, "error AND handling", k=10, merge_threshold=5
            ),
            reps=3, stat="median",
        )
        p0 = bt.column("path").to_pylist()[0] if bt.num_rows else "none"
        qtimes["extract_range"], _ = _timed(
            lambda: extract_specs(cfiles, [f"{p0}:1-5"], context_lines=0),
            reps=3, stat="median",
        )
        # incremental append: +5% new docs re-invokes build_index on the
        # grown dir — done waves are kept as recorded (O(new files), not
        # a rebuild; index/build.py _plan_waves). Close the reader first
        # so its actors' CPU reservations don't starve the build.
        rd.close()
        import pyarrow.parquet as pq_mod

        from probe_ray.data.synth import make_rows

        extra = max(1000, rows // 20)
        pq_mod.write_table(
            make_rows(rows, extra, stmt_scale=stmt_scale),
            os.path.join(grow, "append.parquet"),
            row_group_size=2048,
        )
        t1 = time.time()
        build_index([grow], idx, cfg)
        qtimes["append_5pct_docs"] = round(time.time() - t1, 4)
        return {
            "build_seconds": round(build_s, 3),
            "docs_per_sec": round(rows / build_s, 1),
            "mb_per_sec": round(nbytes / 1e6 / build_s, 2),
            "rows": rows,
            "corpus_bytes": nbytes,
            "query_seconds": qtimes,
            "query_p50": round(
                sorted(qtimes.values())[len(qtimes) // 2], 4
            ),
            "query_max": round(max(qtimes.values()), 4),
            "effective_parallelism": eff_par,
        }
    finally:
        ray.shutdown()



def _nrows(x) -> int:
    """Row count for any operator return type: lazy ray.data.Dataset
    (consume via .count()), pyarrow.Table, or pandas.DataFrame. Bench
    rows must consume lazy pipelines inside the timed lambda."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(x, pa.Table):
        return x.num_rows
    if isinstance(x, pd.DataFrame):
        return len(x)
    return x.count()

def run_sf_ops(num_cpus: int) -> dict:
    """documents/embeddings-table operator timings over SF_DIR."""
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        log_to_driver=False,
    )
    try:
        from probe_ray.ops import (
            ann,
            dedup,
            embed,
            export,
            multimodal,
            relational,
            text,
        )
        from probe_ray.ops import fts as fts_ops
        from probe_ray.ops import io as io_ops

        # same session warmup the build section uses: spawn the worker
        # pool on a trivial pipeline so the first timed op measures the
        # operator, not Ray Data's first-pipeline setup
        _warmup_ray_data()
        out = {}
        for name, fn in [
            ("dedup_exact", lambda: _nrows(dedup.exact_dedup_groups(SF_DIR))),
            ("text_stats", lambda: _nrows(text.text_stats(SF_DIR))),
            ("ann_brute_topk", lambda: _nrows(ann.ann_brute_topk(SF_DIR))),
            ("ann_ivf_topk", lambda: _nrows(ann.ann_ivf_topk(SF_DIR))),
            ("ann_ivf_recall", lambda: _nrows(ann.ann_recall(SF_DIR))),
            ("minhash_pairs", lambda: _nrows(dedup.minhash_lsh_pairs(SF_DIR))),
            ("minhash_verified", lambda: _nrows(dedup.minhash_verified_pairs(SF_DIR))),
            ("simhash", lambda: _nrows(dedup.simhash(SF_DIR))),
            ("train_val_split", lambda: _nrows(text.train_val_split(SF_DIR))),
            ("decontaminate", lambda: _nrows(text.decontaminate(SF_DIR))),
            ("ngram_topk", lambda: _nrows(text.ngram_topk(SF_DIR))),
            ("repetition_stats", lambda: _nrows(text.repetition_stats(SF_DIR))),
            ("stratified_sample", lambda: _nrows(text.stratified_sample(SF_DIR))),
            ("shared_ngram_counts", lambda: _nrows(text.shared_ngram_counts(SF_DIR))),
            ("neardup_clusters", lambda: _nrows(dedup.neardup_clusters(SF_DIR))),
            ("distinctive_terms", lambda: _nrows(text.distinctive_terms(SF_DIR))),
            ("hll_distinct", lambda: _nrows(text.hll_distinct_tokens(SF_DIR))),
            ("unigram_surprisal", lambda: _nrows(text.unigram_surprisal(SF_DIR))),
            ("dsir_weights", lambda: _nrows(text.dsir_importance_weights(SF_DIR))),
            ("pack_sequences", lambda: _nrows(export.pack_sequences(SF_DIR))),
            ("curated_pack", lambda: _nrows(export.curated_pack(SF_DIR))),
            ("tar_shards", lambda: _nrows(export.write_tar_shards(SF_DIR))),
            ("seq_stats", lambda: _nrows(export.seq_stats(SF_DIR))),
            ("pack_by_lang", lambda: _nrows(export.pack_sequences_by_lang(SF_DIR))),
            ("shuffle_order", lambda: _nrows(export.shuffle_export(SF_DIR))),
            ("budget_select", lambda: _nrows(export.budget_select(SF_DIR))),
            ("rel_q1_pricing", lambda: _nrows(relational.q1_pricing_summary(SF_DIR))),
            ("rel_top_customers", lambda: _nrows(relational.top_customers_by_revenue(SF_DIR))),
            ("rel_semijoin", lambda: _nrows(relational.order_priority_semijoin(SF_DIR))),
            ("rel_sliding_window", lambda: _nrows(relational.events_sliding_window_counts(SF_DIR))),
            ("rel_asof_join", lambda: _nrows(relational.events_asof_last_click(SF_DIR))),
            ("rel_quantiles", lambda: _nrows(relational.column_quantiles_disc(SF_DIR))),
            ("text_curation", lambda: _nrows(text.curation_pipeline(SF_DIR))),
            ("embed_neardup_chain", lambda: _nrows(embed.text_embed_neardup_pairs(SF_DIR))),
            ("semantic_dedup", lambda: _nrows(ann.semantic_dedup(SF_DIR))),
            ("prototype_filter", lambda: _nrows(ann.prototype_filter(SF_DIR))),
            ("knn_classify_ivf", lambda: _nrows(ann.ann_knn_classify_ivf(SF_DIR))),
            ("dedup_spans", lambda: _nrows(text.dedup_spans(SF_DIR))),
            ("multimodal_frames", lambda: _nrows(multimodal.frame_features(SF_DIR))),
            ("rel_q5_volume", lambda: _nrows(relational.local_supplier_volume(SF_DIR))),
            ("rel_q10_returns", lambda: _nrows(relational.returned_item_revenue(SF_DIR))),
            ("rel_q18_large_orders", lambda: _nrows(relational.large_order_customers(SF_DIR))),
            ("rel_q19_brackets", lambda: _nrows(relational.discounted_bracket_revenue(SF_DIR))),
            ("rel_q22_antijoin", lambda: _nrows(relational.rich_inactive_customers(SF_DIR))),
            ("rel_q17_small_qty", lambda: _nrows(relational.small_quantity_revenue(SF_DIR))),
            ("rel_q21_sole_late", lambda: _nrows(relational.sole_late_supplier_counts(SF_DIR))),
            ("rel_q15_top_supplier", lambda: _nrows(relational.top_supplier_revenue(SF_DIR))),
            ("rel_q7_volume_shipping", lambda: _nrows(relational.volume_shipping_regions(SF_DIR))),
            ("rel_q11_important_parts", lambda: _nrows(relational.important_parts_by_region(SF_DIR))),
            ("rel_q8_market_share", lambda: _nrows(relational.nation_market_share(SF_DIR))),
            ("rel_q9_nation_revenue", lambda: _nrows(relational.nation_keyword_revenue(SF_DIR))),
            ("rel_running_order_spend", lambda: _nrows(relational.running_order_spend(SF_DIR))),
            ("rel_customer_rfm", lambda: _nrows(relational.customer_rfm(SF_DIR))),
            ("rel_top_parts_per_brand", lambda: _nrows(relational.top_parts_per_brand(SF_DIR))),
            ("rel_customer_order_gaps", lambda: _nrows(relational.customer_order_gaps(SF_DIR))),
            ("ann_range_search", lambda: _nrows(ann.ann_range_search(SF_DIR))),
            ("ann_int8_quantize", lambda: _nrows(ann.ann_int8_quantize(SF_DIR))),
            ("text_mixture_sample", lambda: _nrows(text.mixture_sample(SF_DIR))),
            ("io_hive_roundtrip", lambda: _nrows(io_ops.hive_partitioned_roundtrip(SF_DIR))),
            ("rel_event_funnel", lambda: _nrows(relational.event_funnel(SF_DIR))),
            ("rel_retention", lambda: _nrows(relational.retention_cohorts(SF_DIR))),
            ("rel_rolling_active", lambda: _nrows(relational.rolling_active_users(SF_DIR))),
            ("quality_pct_by_lang", lambda: _nrows(text.quality_percentile_filter_by_lang(SF_DIR))),
            ("fts_federated_search", lambda: _nrows(fts_ops.fts_federated_search(SF_DIR))),
            ("fts_upsert_lifecycle", lambda: _nrows(fts_ops.fts_upsert_lifecycle(SF_DIR))),
            ("fts_compact_lifecycle", lambda: _nrows(fts_ops.fts_compact_lifecycle(SF_DIR))),
        ]:
            # median-of-3, matching the query entries' methodology: the
            # first rep of each op pays pipeline compile + worker ramp,
            # and a lone min-of-2 systematically reported best-case
            # numbers that weren't comparable to older one-shot rows
            out[name], _ = _timed(fn, reps=3, stat="median")
        # the lifecycle ops cache monolithic readers (actor pools);
        # release their reserved CPUs before shutdown
        fts_ops.close_readers()
        return out
    finally:
        ray.shutdown()


def run_latency(num_cpus: int, rows: int, reps: int = 100) -> dict:
    """BASELINE.md measurement plan: p50/p99 over >=reps repetitions of
    every index-path reference query against a warm reader."""
    import ray

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        ignore_reinit_error=True, log_to_driver=False,
    )
    try:
        from probe_ray.index.build import IndexConfig, build_index
        from probe_ray.ops.fts import REFERENCE_QUERIES
        from probe_ray.query.bm25 import create_query_plan
        from probe_ray.search.searcher import IndexReader

        corpus = _corpus(rows, 1)
        idx = os.path.join(BENCH_ROOT, f"index_{rows}_lat")
        # resume-aware: a complete up-to-date index is a fast no-op, a
        # stale or partial one is rebuilt
        build_index(
            [corpus], idx,
            IndexConfig(num_waves=2, subshards=max(4, num_cpus // 4)),
        )
        rd = IndexReader(idx)
        rd.search("setTools", k=10)
        qs = {
            n: q for n, q in REFERENCE_QUERIES.items()
            if not create_query_plan(q).special_terms
        }
        samples: list[float] = []
        for _ in range(reps):
            for q in qs.values():
                t0 = time.time()
                rd.search(q, k=10)
                samples.append(time.time() - t0)
        rd.close()
        samples.sort()
        n = len(samples)
        return {
            "queries": len(qs), "reps": reps, "n_samples": n,
            "p50_ms": round(samples[n // 2] * 1000, 2),
            "p99_ms": round(samples[int(n * 0.99)] * 1000, 2),
            "max_ms": round(samples[-1] * 1000, 2),
        }
    finally:
        ray.shutdown()


def main():
    os.makedirs(BENCH_ROOT, exist_ok=True)
    sf = _sf()
    rows = max(2000, int(200_000 * sf))

    if "--latency" in sys.argv:
        out = run_latency(NUM_CPUS, rows)
        print(json.dumps({
            "metric": "index-path query latency (warm reader)",
            "unit": "ms", "value": out["p50_ms"], "sf": sf,
            "num_cpus": NUM_CPUS, **out,
        }))
        return

    if "--scaling" in sys.argv:
        # Scaling is measured on a compute-dominated corpus (~1.7 GB of
        # content: 200k docs x ~8 KB): at the tiny per-round sizes, serial
        # session/stage setup dominates and the ratio measures Ray's fixed
        # costs, not the engine. Same input + same partitioning (subshards
        # fixed at 32, the hi-level CPU count) at both levels — the sandbox
        # stand-in for the same job on N- and 4N-node clusters.
        import ray

        # 1.5M docs x ~6.5 KB ≈ 10 GB of content. Two waves: wave w's
        # finalize tasks overlap wave w+1's tokenize Dataset job, hiding
        # most of the finalize tail (measured at 12 CPUs on this corpus:
        # 1 wave 125.7 s, 2 waves 95.9 s, 3 waves 107.8 s, 4 waves
        # 140.8 s — more waves trade overlap for per-wave job fixed
        # costs). Memory per finalize group stays tiny either way
        # (~150-300 MB = wave_bytes / 32 subshards).
        s_rows = int(os.environ.get("GRAFT_SCALING_ROWS", "1500000"))
        s_scale = int(os.environ.get("GRAFT_SCALING_STMTS", "8"))
        ray.init(address="local", include_dashboard=False, log_to_driver=False)
        _corpus(s_rows, s_scale)  # generate once with all cores
        ray.shutdown()

        # N vs 4N CPU levels; override when the host is delivering fewer
        # effective CPUs than the default hi level (see
        # _effective_parallelism) — a 3-vs-12 run inside the host's real
        # capacity is honest, a 8-vs-32 run against a 13-CPU cap is not.
        lo_cpus = int(os.environ.get("GRAFT_SCALING_LO", "8"))
        hi_cpus = int(os.environ.get("GRAFT_SCALING_HI", str(4 * lo_cpus)))
        lo = run_headline(
            lo_cpus, s_rows, f"c{lo_cpus}", stmt_scale=s_scale,
            subshards=32, run_queries=False, num_waves=2,
        )
        hi = run_headline(
            hi_cpus, s_rows, f"c{hi_cpus}", stmt_scale=s_scale,
            subshards=32, run_queries=False, num_waves=2,
        )
        eff = (hi["docs_per_sec"] / (4.0 * lo["docs_per_sec"]))
        print(
            json.dumps(
                {
                    "metric": f"index-build scaling efficiency ({lo_cpus} -> {hi_cpus} cpus)",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "rows": s_rows,
                    "stmt_scale": s_scale,
                    "low": {"num_cpus": lo_cpus, **lo},
                    "high": {"num_cpus": hi_cpus, **hi},
                }
            )
        )
        return

    head = run_headline(NUM_CPUS, rows, f"c{NUM_CPUS}")
    ops = run_sf_ops(NUM_CPUS)
    queries = dict(head["query_seconds"])
    queries.update(ops)
    total = head["build_seconds"] + sum(ops.values()) + sum(
        head["query_seconds"].values()
    )
    full = {
        "metric": "index build + reference query set + doc ops wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "build_seconds": head["build_seconds"],
        "build_docs_per_sec": head["docs_per_sec"],
        "build_mb_per_sec": head["mb_per_sec"],
        "query_p50": head["query_p50"],
        "corpus_rows": head["rows"],
        # host-capacity probe at run time: requested num_cpus vs
        # the parallelism the sandbox actually delivered — the
        # validity context for every number above (the hypervisor
        # intermittently caps this VM; see BASELINE.md)
        "effective_parallelism": head.get("effective_parallelism"),
    }
    # Full per-op map goes to a sidecar file (80+ rows make the JSON
    # line several KB — round-3/4 driver captures truncated it and
    # recorded parsed:null). Humans and history read the sidecar.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_ops.json"), "w",
        ) as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: stdout below still carries everything
    print(json.dumps(full))
    # The FINAL stdout line is a short headline the driver can always
    # parse, even from a truncating tail window. Must stay < 1 KB
    # (tests/test_bench_headline.py pins this).
    print(json.dumps(headline_line(full)))


def headline_line(full: dict) -> dict:
    """Compact driver-parseable summary of a full bench payload.

    Keeps the spec shape (metric/value/unit/queries/sf/num_cpus) but
    bounds "queries" to the slowest HEADLINE_MAX_QUERIES ops so the
    serialized line stays well under 1 KB regardless of how many op
    rows the full map grows to.
    """
    qs = full.get("queries") or {}
    top = dict(
        sorted(qs.items(), key=lambda kv: -kv[1])[:HEADLINE_MAX_QUERIES]
    )
    return {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "queries": top,
        "sf": full["sf"],
        "num_cpus": full["num_cpus"],
        "build_seconds": full["build_seconds"],
        "build_docs_per_sec": full["build_docs_per_sec"],
        "query_p50": full["query_p50"],
        "n_ops": len(qs),
        "ops_file": "bench_ops.json",
        "effective_parallelism": full.get("effective_parallelism"),
    }


HEADLINE_MAX_QUERIES = 8


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
