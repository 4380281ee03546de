"""Driver contract for the graft builder (Ray Data target).

entry()      — flagship: build the inverted index over the sf0.001
               documents corpus (mapped to the canonical code-table shape)
               and run the reference query set; returns the concatenated
               top-k results.
queries()    — one entry per implemented operator/pipeline (SURVEY.md SS2/SS3
               + the training-data ops); each takes sf_dir.
oracle_sql() — DuckDB-equivalent SQL for the SQL-expressible subset; the
               fulltext/sketch operators (tokenizer-dependent or
               approximate) are rows-only by design.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import pyarrow as pa

    from probe_ray.ops.fts import fts_search_all

    results = fts_search_all("/root/testdata/sf0.001", k=10)
    parts = []
    for name, t in results.items():
        parts.append(
            t.append_column("query", pa.array([name] * t.num_rows, pa.string()))
        )
    return pa.concat_tables(parts)


def queries() -> dict[str, Callable[[str], Any]]:
    from probe_ray.ops import (
        ann,
        dedup,
        embed,
        export,
        fts,
        io,
        multimodal,
        relational,
        text,
    )

    q: dict[str, Callable[[str], Any]] = {
        # --- relational Dataset surface (partial agg, broadcast join,
        # sort+limit, temporal bucketing) ---------------------------------
        "rel_q1_pricing_summary": relational.q1_pricing_summary,
        "rel_top_customers_by_revenue": relational.top_customers_by_revenue,
        "rel_events_hourly_counts": relational.events_hourly_counts,
        "rel_customers_per_region": relational.customers_per_region,
        "rel_sessionize_events": relational.sessionize_events,
        "rel_q6_revenue_filter": relational.q6_revenue_filter,
        "rel_events_sliding_window": relational.events_sliding_window_counts,
        "rel_top_event_per_user": relational.top_event_per_user,
        "rel_order_priority_semijoin": relational.order_priority_semijoin,
        "rel_top_brands_by_revenue": relational.top_brands_by_revenue,
        "rel_asof_last_click": relational.events_asof_last_click,
        "rel_band_join_counts": relational.events_band_join_counts,
        "rel_asof_last_click_salted": lambda sf: (
            relational.events_asof_last_click_salted(sf, bucket_hours=24)
        ),
        "rel_band_join_counts_salted": lambda sf: (
            relational.events_band_join_counts_salted(
                sf, window_hours=24, bucket_hours=24
            )
        ),
        "rel_q3_shipping_priority": relational.q3_shipping_priority,
        "rel_q5_local_supplier_volume": relational.local_supplier_volume,
        "rel_q10_returned_items": relational.returned_item_revenue,
        "rel_q14_promo_revenue": relational.promo_revenue,
        "rel_q18_large_orders": relational.large_order_customers,
        "rel_q19_bracket_revenue": relational.discounted_bracket_revenue,
        "rel_q22_rich_inactive": relational.rich_inactive_customers,
        "rel_q17_small_qty_revenue": relational.small_quantity_revenue,
        "rel_q21_sole_late_supplier": relational.sole_late_supplier_counts,
        "rel_q15_top_supplier": relational.top_supplier_revenue,
        "rel_q7_volume_shipping": relational.volume_shipping_regions,
        "rel_q11_important_parts": relational.important_parts_by_region,
        "rel_q8_market_share": relational.nation_market_share,
        "rel_q9_nation_revenue": relational.nation_keyword_revenue,
        "rel_running_order_spend": relational.running_order_spend,
        "rel_customer_rfm": relational.customer_rfm,
        "rel_top_parts_per_brand": relational.top_parts_per_brand,
        "rel_customer_order_gaps": relational.customer_order_gaps,
        "rel_event_funnel": relational.event_funnel,
        "rel_retention_cohorts": relational.retention_cohorts,
        "rel_event_transitions": relational.event_transition_counts,
        "rel_conversion_latency": relational.conversion_latency_stats,
        "rel_rolling_active_users": relational.rolling_active_users,
        "rel_customers_without_orders": relational.customers_without_orders,
        "rel_order_count_distribution": relational.order_count_distribution,
        "rel_distinct_users_per_type": relational.distinct_users_per_type,
        "rel_events_daily_type_pivot": relational.events_daily_type_pivot,
        "rel_rollup_revenue": relational.rollup_revenue,
        "rel_value_quantiles": relational.column_quantiles_disc,
        "rel_value_quantiles_by_type": relational.column_quantiles_by_group,
        "text_heavy_hitters": text.heavy_hitters,
        # --- fulltext index + BM25 search (core engine; rows-only checks) --
        "fts_corpus_sha256": fts.corpus_sha256,
        "fts_index_doc_stats": fts.index_doc_stats,
        "fts_term_df_topk": fts.term_df_topk,
        "fts_extract": fts.fts_extract,
        "fts_extract_docs": fts.fts_extract_docs,
        "fts_pattern_query": fts.fts_pattern_query,
        "fts_hybrid_rrf": fts.hybrid_rrf_search,
        # --- text analysis ------------------------------------------------
        "text_token_count": text.token_count,
        "text_token_count_bpeish": text.token_count_bpeish,
        "text_normalize_stopwords": text.normalize_stopwords,
        "text_stats": text.text_stats,
        "text_quality_score": text.quality_score,
        "text_lang_id": text.lang_id,
        "text_lang_id_ngram": text.lang_id_ngram,
        "text_lang_id_confusion": text.lang_id_confusion,
        # doc-length distribution per language: the SAME exact grouped
        # histogram-quantile operator applied to the documents table —
        # the curation view of length balance across the mixture
        "text_doclen_quantiles_by_lang": lambda sf: (
            relational.column_quantiles_by_group(
                sf, table="documents", column="n_chars", group="lang"
            )
        ),
        "text_fingerprint": text.fingerprint,
        "text_curation_pipeline": text.curation_pipeline,
        "text_train_val_split": text.train_val_split,
        "text_decontaminate": text.decontaminate,
        "text_ngram_topk": text.ngram_topk,
        "text_repetition_stats": text.repetition_stats,
        "text_stratified_sample": text.stratified_sample,
        "text_mixture_sample": text.mixture_sample,
        "text_shared_ngram_counts": text.shared_ngram_counts,
        "text_pii_scrub": text.pii_scrub,
        "text_group_sample": text.group_sample,
        "text_distinctive_terms": text.distinctive_terms,
        "text_unigram_surprisal": text.unigram_surprisal,
        "text_hll_distinct": text.hll_distinct_tokens,
        "text_dedup_spans": text.dedup_spans,
        "text_quality_percentile_filter": text.quality_percentile_filter,
        "text_quality_percentile_by_lang": text.quality_percentile_filter_by_lang,
        "text_dsir_weights": text.dsir_importance_weights,
        "export_pack_sequences": export.pack_sequences,
        "export_curated_pack": export.curated_pack,
        "export_tar_shards": export.write_tar_shards,
        "export_seq_stats": export.seq_stats,
        "export_pack_by_lang": export.pack_sequences_by_lang,
        "export_shuffle_order": export.shuffle_export,
        "export_budget_select": export.budget_select,
        "rel_events_json_kpis": relational.events_json_kpis,
        # --- dedup --------------------------------------------------------
        "dedup_exact_groups": dedup.exact_dedup_groups,
        "dedup_exact_keep_first": dedup.exact_dedup_keep_first,
        "dedup_minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "dedup_minhash_verified_pairs": dedup.minhash_verified_pairs,
        "dedup_simhash": dedup.simhash,
        "dedup_simhash_neardup_pairs": dedup.simhash_neardup_pairs,
        "dedup_ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "dedup_neardup_clusters": dedup.neardup_clusters,
        # --- similarity search -------------------------------------------
        "ann_brute_topk": ann.ann_brute_topk,
        "ann_range_search": ann.ann_range_search,
        "ann_int8_quantize": ann.ann_int8_quantize,
        "ann_lsh_topk": ann.ann_lsh_topk,
        "ann_ivf_topk": ann.ann_ivf_topk,
        "ann_ivf_recall": ann.ann_recall,
        "ann_lsh_buckets": ann.ann_lsh_buckets,
        "ann_kmeans": ann.ann_kmeans,
        "ann_ivf_persisted": ann.ann_ivf_persisted,
        "embedding_neardup_pairs": ann.embedding_neardup_pairs,
        "embedding_semantic_dedup": ann.semantic_dedup,
        "ann_knn_classify": ann.ann_knn_classify,
        "ann_knn_classify_ivf": ann.ann_knn_classify_ivf,
        "embedding_prototype_filter": ann.prototype_filter,
        "text_embed_neardup_pairs": embed.text_embed_neardup_pairs,
        # --- multimodal plumbing -----------------------------------------
        "io_jsonl_roundtrip": io.jsonl_roundtrip,
        "io_csv_roundtrip": io.csv_roundtrip,
        "io_hive_roundtrip": io.hive_partitioned_roundtrip,
        # --- multimodal plumbing -----------------------------------------
        "multimodal_payload_sizes": multimodal.payload_sizes,
        "multimodal_features": multimodal.multimodal_features,
        "multimodal_frame_features": multimodal.frame_features,
        "multimodal_resize_features": multimodal.resize_features,
    }
    # one entry per fulltext search of the reference query set (rows-only)
    for name in list(fts.REFERENCE_QUERIES) + list(fts.DOC_QUERIES):
        q[f"fts_search_{name}"] = (
            lambda sf_dir, _n=name: fts.fts_search(sf_dir, _n)
        )
    # block-granularity search (line-heuristic windows + node-type boost)
    for name in fts.BLOCK_QUERIES:
        q[f"fts_search_{name}"] = (
            lambda sf_dir, _n=name: fts.fts_search_blocks(sf_dir, _n)
        )
    q["fts_search_blocks_reranked"] = fts.fts_search_blocks_reranked
    q["fts_search_blocks_balanced"] = fts.fts_search_blocks_balanced
    q["fts_search_blocks_merged"] = fts.fts_search_blocks_merged
    # index-lifecycle pipelines (rows-only): sharded federation pinned
    # bit-identical to the monolithic index, and the document-update
    # (upsert) flow with member-scoped tombstones
    q["fts_federated_search"] = fts.fts_federated_search
    q["fts_upsert_lifecycle"] = fts.fts_upsert_lifecycle
    q["fts_compact_lifecycle"] = fts.fts_compact_lifecycle

    # The driver verifies only the FIRST 50 entries (dict order). Pin that
    # window to an explicit, all-oracle-bearing slice covering every
    # operator family (rel/text/fts/dedup/ann/embedding/export/io/
    # multimodal); the remaining oracle rows come next (they stay checked
    # by tests/test_ops_oracle.py), rows-only entries last.
    ordered = {k: q[k] for k in DRIVER_WINDOW}
    oracle_keys = set(oracle_sql().keys())
    ordered.update(
        {k: v for k, v in q.items() if k not in ordered and k in oracle_keys}
    )
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered


# The driver-checked window: exactly 50 names, every one of them present in
# oracle_sql(), at least one per operator family. tests/test_driver_gate.py
# asserts these invariants so a future insertion can't silently evict a
# family from external verification again (round-3 lesson).
DRIVER_WINDOW = [
    # relational (17)
    "rel_q1_pricing_summary",
    "rel_top_customers_by_revenue",
    "rel_sessionize_events",
    "rel_top_event_per_user",
    "rel_asof_last_click",
    "rel_band_join_counts",
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier_volume",
    "rel_q10_returned_items",
    "rel_q18_large_orders",
    "rel_q22_rich_inactive",
    "rel_event_funnel",
    "rel_event_transitions",
    "rel_retention_cohorts",
    "rel_value_quantiles",
    "rel_value_quantiles_by_type",
    "rel_events_json_kpis",
    # text (14)
    "text_doclen_quantiles_by_lang",
    "text_heavy_hitters",
    "text_token_count",
    "text_stats",
    "text_quality_score",
    "text_lang_id_confusion",
    "text_curation_pipeline",
    "text_decontaminate",
    "text_distinctive_terms",
    "text_unigram_surprisal",
    "text_quality_percentile_by_lang",
    "text_stratified_sample",
    "text_pii_scrub",
    "text_repetition_stats",
    # fulltext engine (3)
    "fts_corpus_sha256",
    "fts_index_doc_stats",
    "fts_extract_docs",
    # dedup (4)
    "dedup_exact_groups",
    "dedup_exact_keep_first",
    "dedup_ngram_jaccard_pairs",
    "dedup_neardup_clusters",
    # ANN / embeddings (3)
    "ann_brute_topk",
    "ann_knn_classify",
    "embedding_neardup_pairs",
    # export / packing (6)
    "export_pack_sequences",
    "export_curated_pack",
    "export_seq_stats",
    "export_pack_by_lang",
    "export_shuffle_order",
    "export_budget_select",
    # io (2)
    "io_jsonl_roundtrip",
    "io_csv_roundtrip",
    # multimodal (1)
    "multimodal_payload_sizes",
]


_WS_TOKENS = "string_split_regex(trim(text), '\\s+')"
_N_TOKENS = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_WS_TOKENS}) END"


_MILLI = "CAST(floor({x} * 1000 + 0.5) AS BIGINT)"


def _mixture_sql() -> str:
    """Source-mixture oracle rendered from the SAME weight table the
    Ray operator uses (probe_ray.ops.text.MIXTURE_WEIGHTS) — the two
    engines cannot drift."""
    import math

    from probe_ray.ops.text import MIXTURE_DEFAULT_WEIGHT, MIXTURE_WEIGHTS

    def cases(f) -> str:
        body = " ".join(
            f"WHEN '{s}' THEN {f(w)}" for s, w in MIXTURE_WEIGHTS.items()
        )
        return (
            f"CASE source {body} ELSE {f(MIXTURE_DEFAULT_WEIGHT)} END"
        )

    base = cases(lambda w: int(math.floor(w)))
    frac = cases(lambda w: int((w - math.floor(w)) * 2**32))
    return (
        "WITH d AS (SELECT doc_id, lang, source, "
        f"({base}) + CASE WHEN (doc_id * 2654435761) % 4294967296 < "
        f"({frac}) THEN 1 ELSE 0 END AS n FROM documents) "
        "SELECT doc_id, lang, source, "
        "CAST(unnest(range(n)) AS BIGINT) AS copy_idx "
        "FROM d WHERE n > 0 ORDER BY doc_id, copy_idx"
    )


def oracle_sql() -> dict[str, str]:
    return {
        # NOTE: DuckDB sum(BIGINT) yields HUGEINT, which pandas renders as
        # float ("42.0") and breaks string-based value hashing — every SUM
        # is cast back to BIGINT.
        "rel_q1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "count(*) AS count_order, "
            f"CAST(sum({_MILLI.format(x='l_quantity')}) AS BIGINT) AS sum_qty_milli, "
            f"CAST(sum({_MILLI.format(x='l_extendedprice')}) AS BIGINT) AS sum_price_milli, "
            f"CAST(sum({_MILLI.format(x='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) "
            "AS sum_disc_price_milli "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "rel_top_customers_by_revenue": (
            "SELECT o_custkey AS custkey, any_value(c.c_name) AS c_name, "
            f"CAST(sum({_MILLI.format(x='o_totalprice')}) AS BIGINT) AS revenue_milli "
            "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
            "GROUP BY o_custkey "
            "ORDER BY revenue_milli DESC, custkey LIMIT 20"
        ),
        "rel_events_hourly_counts": (
            "SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id, "
            "count(*) AS n_events, "
            f"CAST(sum({_MILLI.format(x='value')}) AS BIGINT) AS value_sum_milli "
            "FROM events GROUP BY event_type, hour_id "
            "ORDER BY event_type, hour_id"
        ),
        "rel_customers_per_region": (
            "SELECT r.r_name, count(*) AS n_customers "
            "FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "JOIN region r ON r.r_regionkey = n.n_regionkey "
            "GROUP BY r.r_name ORDER BY r.r_name"
        ),
        "rel_sessionize_events": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, "
            "CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 "
            "OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS brk "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts) ), "
            "s AS (SELECT user_id, ts_us, "
            "sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us "
            "ROWS UNBOUNDED PRECEDING) - 1 AS session_idx FROM e) "
            "SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, "
            "count(*) AS n_events, min(ts_us) AS start_us, max(ts_us) AS end_us "
            "FROM s GROUP BY user_id, session_idx "
            "ORDER BY user_id, session_idx"
        ),
        "rel_asof_last_click": (
            "SELECT p.event_id, p.user_id, "
            "CAST(coalesce(date_diff('microsecond', v.ts, p.ts), -1) "
            "AS BIGINT) AS gap_us "
            "FROM (SELECT * FROM events WHERE event_type='purchase') p "
            "ASOF LEFT JOIN "
            "(SELECT * FROM events WHERE event_type='click') v "
            "ON p.user_id = v.user_id AND p.ts > v.ts ORDER BY p.event_id"
        ),
        "rel_band_join_counts": (
            "SELECT p.event_id, p.user_id, count(c.ts) AS n_prior "
            "FROM (SELECT * FROM events WHERE event_type='purchase') p "
            "LEFT JOIN (SELECT * FROM events WHERE event_type='click') c "
            "ON p.user_id = c.user_id "
            "AND c.ts >= p.ts - INTERVAL 24 HOUR AND c.ts < p.ts "
            "GROUP BY 1, 2 ORDER BY 1"
        ),
        # salted variants compute the SAME result as their plain forms
        # (the salt only changes the exchange), so they share the oracle
        "rel_asof_last_click_salted": (
            "SELECT p.event_id, p.user_id, "
            "CAST(coalesce(date_diff('microsecond', v.ts, p.ts), -1) "
            "AS BIGINT) AS gap_us "
            "FROM (SELECT * FROM events WHERE event_type='purchase') p "
            "ASOF LEFT JOIN "
            "(SELECT * FROM events WHERE event_type='click') v "
            "ON p.user_id = v.user_id AND p.ts > v.ts ORDER BY p.event_id"
        ),
        "rel_band_join_counts_salted": (
            "SELECT p.event_id, p.user_id, count(c.ts) AS n_prior "
            "FROM (SELECT * FROM events WHERE event_type='purchase') p "
            "LEFT JOIN (SELECT * FROM events WHERE event_type='click') c "
            "ON p.user_id = c.user_id "
            "AND c.ts >= p.ts - INTERVAL 24 HOUR AND c.ts < p.ts "
            "GROUP BY 1, 2 ORDER BY 1"
        ),
        "rel_value_quantiles_by_type": (
            "SELECT * FROM ("
            "SELECT event_type, CAST(0.5 AS DOUBLE) AS q, "
            "quantile_disc(value, 0.5) AS value FROM events "
            "GROUP BY event_type UNION ALL "
            "SELECT event_type, CAST(0.9 AS DOUBLE), "
            "quantile_disc(value, 0.9) FROM events GROUP BY event_type"
            ") ORDER BY event_type, q"
        ),
        "text_heavy_hitters": (
            "WITH tok AS (SELECT unnest(string_split_regex(trim(text), "
            "'\\s+')) AS token FROM documents WHERE trim(text) <> ''), "
            "tot AS (SELECT count(*) AS n FROM tok) "
            "SELECT token, count(*) AS cnt FROM tok, tot "
            "GROUP BY token, tot.n "
            "HAVING count(*) >= CAST(ceil(0.001 * n) AS BIGINT) "
            "ORDER BY cnt DESC, token"
        ),
        "rel_value_quantiles": (
            "SELECT * FROM (SELECT CAST(0.25 AS DOUBLE) AS q, "
            "quantile_disc(value, 0.25) AS value FROM events UNION ALL "
            "SELECT CAST(0.5 AS DOUBLE), quantile_disc(value, 0.5) "
            "FROM events UNION ALL "
            "SELECT CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9) "
            "FROM events UNION ALL "
            "SELECT CAST(0.99 AS DOUBLE), quantile_disc(value, 0.99) "
            "FROM events) ORDER BY q"
        ),
        "rel_q6_revenue_filter": (
            "SELECT CAST(sum("
            f"{_MILLI.format(x='l_extendedprice * l_discount')}"
            ") AS BIGINT) AS revenue_milli, count(*) AS n_rows "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            f"AND {_MILLI.format(x='l_discount')} BETWEEN 20 AND 70 "
            f"AND {_MILLI.format(x='l_quantity')} < 24000"
        ),
        "rel_events_sliding_window": (
            "WITH h AS (SELECT event_type, "
            "unnest([epoch_us(ts) // 3600000000, "
            "epoch_us(ts) // 3600000000 + 1]) AS window_end_hour "
            "FROM events) "
            "SELECT event_type, window_end_hour, count(*) AS n_events "
            "FROM h GROUP BY event_type, window_end_hour "
            "ORDER BY event_type, window_end_hour"
        ),
        "rel_top_event_per_user": (
            "WITH r AS (SELECT user_id, event_id, "
            f"{_MILLI.format(x='value')} AS value_milli, "
            "row_number() OVER (PARTITION BY user_id ORDER BY "
            f"{_MILLI.format(x='value')} DESC, epoch_us(ts), event_id) AS rn "
            "FROM events) "
            "SELECT user_id, event_id, value_milli FROM r WHERE rn = 1 "
            "ORDER BY user_id"
        ),
        "rel_order_priority_semijoin": (
            "SELECT o_orderpriority, count(*) AS n_orders FROM orders o "
            "WHERE EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            f"AND {_MILLI.format(x='l.l_discount')} >= 80) "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "rel_q3_shipping_priority": (
            "SELECT l.l_orderkey AS o_orderkey, CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            ") AS BIGINT) AS revenue_milli, "
            "any_value(epoch_us(o.o_orderdate)) AS orderdate_us, "
            "any_value(o.o_orderpriority) AS o_orderpriority "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE c.c_mktsegment = 'BUILDING' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
            "AND l.l_shipdate > TIMESTAMP '1998-01-01' "
            "GROUP BY l.l_orderkey "
            "ORDER BY revenue_milli DESC, o_orderkey LIMIT 10"
        ),
        "rel_q5_local_supplier_volume": (
            "SELECT n.n_name, CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            ") AS BIGINT) AS revenue_milli "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "JOIN region r ON r.r_regionkey = n.n_regionkey "
            "WHERE c.c_nationkey = s.s_nationkey AND r.r_name = 'ASIA' "
            "AND o.o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY n.n_name ORDER BY revenue_milli DESC, n_name"
        ),
        "rel_q10_returned_items": (
            "SELECT o.o_custkey AS custkey, any_value(c.c_name) AS c_name, "
            "CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            ") AS BIGINT) AS revenue_milli "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_returnflag = 'R' "
            "AND o.o_orderdate >= TIMESTAMP '1997-07-01' "
            "AND o.o_orderdate < TIMESTAMP '1997-10-01' "
            "GROUP BY o.o_custkey "
            "ORDER BY revenue_milli DESC, custkey LIMIT 20"
        ),
        "rel_q14_promo_revenue": (
            "SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN "
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            " ELSE 0 END) AS BIGINT) AS promo_revenue_milli, "
            "CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            ") AS BIGINT) AS total_revenue_milli "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' "
            "AND l.l_shipdate < TIMESTAMP '1997-10-01'"
        ),
        "rel_q18_large_orders": (
            "SELECT o.o_orderkey, any_value(o.o_custkey) AS custkey, "
            f"any_value({_MILLI.format(x='o.o_totalprice')}) AS totalprice_milli, "
            "any_value(epoch_us(o.o_orderdate)) AS orderdate_us, "
            f"CAST(sum({_MILLI.format(x='l.l_quantity')}) AS BIGINT) "
            "AS total_qty_milli "
            "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "GROUP BY o.o_orderkey "
            f"HAVING sum({_MILLI.format(x='l.l_quantity')}) > 280000 "
            "ORDER BY totalprice_milli DESC, o_orderkey LIMIT 20"
        ),
        "rel_q19_bracket_revenue": (
            "SELECT CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            ") AS BIGINT) AS revenue_milli "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10 "
            "AND l.l_quantity BETWEEN 1 AND 20) "
            "OR (p.p_brand = 'Brand#2' AND p.p_size <= 20 "
            "AND l.l_quantity BETWEEN 5 AND 30)"
        ),
        "rel_q22_rich_inactive": (
            "WITH t AS (SELECT CAST(count(*) FILTER ("
            f"{_MILLI.format(x='c_acctbal')} > 0) AS BIGINT) AS n_pos, "
            f"CAST(sum(CASE WHEN {_MILLI.format(x='c_acctbal')} > 0 THEN "
            f"{_MILLI.format(x='c_acctbal')} ELSE 0 END) AS BIGINT) AS s_pos "
            "FROM customer) "
            "SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey, "
            "CAST(count(*) AS BIGINT) AS n_customers, "
            f"CAST(sum({_MILLI.format(x='c.c_acctbal')}) AS BIGINT) "
            "AS total_acctbal_milli "
            "FROM customer c, t "
            f"WHERE {_MILLI.format(x='c.c_acctbal')} * t.n_pos > t.s_pos "
            "AND NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderdate >= TIMESTAMP '1998-06-01') "
            "GROUP BY c.c_nationkey ORDER BY nationkey"
        ),
        # TPC-H Q17 shape: revenue of small-quantity lineitems (< 20% of
        # the part's average quantity) for one brand; milli-integer
        # arithmetic (quantities are milli-exact in this corpus)
        "rel_q17_small_qty_revenue": (
            "WITH li AS (SELECT l_partkey, "
            "CAST(round(l_quantity * 1000) AS BIGINT) AS qm, "
            "CAST(round(l_extendedprice * 1000) AS BIGINT) AS pm "
            "FROM lineitem), "
            "bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'), "
            "st AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(sum(qm) AS BIGINT) AS sq FROM li "
            "JOIN bp ON l_partkey = p_partkey GROUP BY l_partkey) "
            "SELECT CAST(coalesce(sum(li.pm), 0) AS BIGINT) AS revenue_milli, "
            "CAST(count(*) AS BIGINT) AS n_items "
            "FROM li JOIN st USING (l_partkey) "
            "WHERE 5 * li.qm * st.cnt < st.sq"
        ),
        # TPC-H Q21 shape: sole-late-supplier credit on multi-supplier
        # finished orders; late = max ship date > order date + 30 days
        "rel_q21_sole_late_supplier": (
            "WITH ls AS (SELECT l_orderkey AS okey, l_suppkey AS sk, "
            "max(epoch_us(l_shipdate)) AS ms FROM lineitem GROUP BY 1, 2), "
            "o AS (SELECT o_orderkey AS okey, epoch_us(o_orderdate) AS od "
            "FROM orders WHERE o_orderstatus = 'F'), "
            "j AS (SELECT ls.okey, ls.sk, "
            "(ls.ms > o.od + 30 * 86400000000) AS late "
            "FROM ls JOIN o USING (okey)), "
            "po AS (SELECT okey, CAST(count(*) AS BIGINT) AS ns, "
            "CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS nl "
            "FROM j GROUP BY okey), "
            "w AS (SELECT j.sk FROM j JOIN po USING (okey) "
            "WHERE j.late AND po.nl = 1 AND po.ns >= 2), "
            "cnts AS (SELECT sk, CAST(count(*) AS BIGINT) AS numwait "
            "FROM w GROUP BY sk) "
            "SELECT s.s_name, CAST(c.sk AS BIGINT) AS suppkey, c.numwait "
            "FROM cnts c JOIN supplier s ON s.s_suppkey = c.sk "
            "ORDER BY numwait DESC, suppkey ASC LIMIT 10"
        ),
        # TPC-H Q15 shape: supplier(s) achieving the max windowed revenue
        # (view-max keeps ties); revenue in exact milli integers
        "rel_q15_top_supplier": (
            "WITH r AS (SELECT l_suppkey AS suppkey, CAST(sum("
            f"{_MILLI.format(x='l_extendedprice * (1.0 - l_discount)')}"
            ") AS BIGINT) AS total_revenue_milli FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY 1) "
            "SELECT CAST(r.suppkey AS BIGINT) AS suppkey, s.s_name, "
            "r.total_revenue_milli FROM r "
            "JOIN supplier s ON s.s_suppkey = r.suppkey "
            "WHERE r.total_revenue_milli = "
            "(SELECT max(total_revenue_milli) FROM r) ORDER BY suppkey"
        ),
        # TPC-H Q7 shape over region pairs (supplier nations are too
        # sparse per nation at small SF for the classic pair): revenue
        # between ASIA-supplied and EUROPE-ordered lineitems (and the
        # reverse), by nation pair and ship year, exact milli integers
        "rel_q7_volume_shipping": (
            "WITH n AS (SELECT n_nationkey, n_name, r_name FROM nation "
            "JOIN region ON r_regionkey = n_regionkey) "
            "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, "
            "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            ") AS BIGINT) AS revenue_milli "
            "FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN n ns ON ns.n_nationkey = s.s_nationkey "
            "JOIN n nc ON nc.n_nationkey = c.c_nationkey "
            "WHERE ((ns.r_name = 'ASIA' AND nc.r_name = 'EUROPE') "
            "OR (ns.r_name = 'EUROPE' AND nc.r_name = 'ASIA')) "
            "AND l.l_shipdate >= TIMESTAMP '1995-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1997-01-01' "
            "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
        ),
        # TPC-H Q11 shape (no partsupp in this corpus: value = summed
        # milli extendedprice x quantity from the region's suppliers);
        # mean-relative global threshold (the classic 0.0001/SF fraction
        # is scale-dependent) in exact integer math
        "rel_q11_important_parts": (
            "WITH v AS (SELECT l.l_partkey AS p_partkey, CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * l.l_quantity')}"
            ") AS BIGINT) AS value_milli "
            "FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "JOIN region r ON r.r_regionkey = n.n_regionkey "
            "WHERE r.r_name = 'ASIA' GROUP BY 1) "
            "SELECT * FROM v WHERE value_milli * "
            "(SELECT count(*) FROM v) * 10 > "
            "(SELECT sum(value_milli) * 12 FROM v) "
            "ORDER BY value_milli DESC, p_partkey"
        ),
        # TPC-H Q8 shape: per order-year revenue of PROMO-part lineitems
        # ordered by ASIA customers, split into the target supplier
        # nation's revenue vs total — integer millis, the share ratio is
        # the reader's division (Q14 idiom)
        "rel_q8_market_share": (
            "SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
            "CAST(sum(CASE WHEN n2.n_name = 'NATION_8' THEN "
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            " ELSE 0 END) AS BIGINT) AS nation_rev_milli, CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            ") AS BIGINT) AS total_rev_milli "
            "FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO' "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN nation n2 ON n2.n_nationkey = s.s_nationkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "AND o.o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1997-01-01' "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n1 ON n1.n_nationkey = c.c_nationkey "
            "JOIN region r ON r.r_regionkey = n1.n_regionkey "
            "AND r.r_name = 'ASIA' "
            "GROUP BY 1 ORDER BY 1"
        ),
        # TPC-H Q9 shape (no partsupp/supplycost in this corpus: profit
        # = discounted revenue) for parts named like the keyword, by
        # supplier nation and order year
        "rel_q9_nation_revenue": (
            "SELECT n.n_name AS supp_nation, "
            "CAST(year(o.o_orderdate) AS BIGINT) AS o_year, CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            ") AS BIGINT) AS revenue_milli "
            "FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "AND p.p_name LIKE '%widget%' "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # per-customer running spend BEFORE each order (strictly-earlier
        # window, ordered by date then orderkey) — integer millis
        "rel_running_order_spend": (
            "SELECT o_orderkey, o_custkey, CAST(coalesce(sum("
            f"{_MILLI.format(x='o_totalprice')}"
            ") OVER (PARTITION BY o_custkey ORDER BY o_orderdate, "
            "o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
            "PRECEDING), 0) AS BIGINT) AS cum_spend_milli "
            "FROM orders ORDER BY o_orderkey"
        ),
        # recency (whole days to a fixed anchor) / frequency / monetary
        # per ordering customer, all integers
        "rel_customer_rfm": (
            "SELECT o_custkey AS c_custkey, "
            "CAST(date_diff('day', max(o_orderdate), "
            "TIMESTAMP '2002-01-01') AS BIGINT) AS recency_days, "
            "count(*) AS frequency, CAST(sum("
            f"{_MILLI.format(x='o_totalprice')}"
            ") AS BIGINT) AS monetary_milli "
            "FROM orders GROUP BY 1 ORDER BY 1"
        ),
        # top-n parts per brand with RANK() tie semantics (ties share a
        # rank, so a brand may emit more than n rows)
        "rel_top_parts_per_brand": (
            "WITH v AS (SELECT p.p_brand, l.l_partkey AS p_partkey, "
            "CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            ") AS BIGINT) AS revenue_milli "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "GROUP BY 1, 2) "
            "SELECT p_brand, p_partkey, revenue_milli, "
            "CAST(rank() OVER (PARTITION BY p_brand "
            "ORDER BY revenue_milli DESC) AS BIGINT) AS rnk "
            "FROM v QUALIFY rnk <= 3 ORDER BY p_brand, rnk, p_partkey"
        ),
        # inter-order gap statistics per repeat customer (LAG window)
        "rel_customer_order_gaps": (
            "WITH g AS (SELECT o_custkey, date_diff('day', "
            "lag(o_orderdate) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey), o_orderdate) AS gap "
            "FROM orders) "
            "SELECT o_custkey AS c_custkey, "
            "CAST(count(gap) AS BIGINT) AS n_gaps, "
            "CAST(sum(gap) AS BIGINT) AS sum_gap_days, "
            "CAST(min(gap) AS BIGINT) AS min_gap_days, "
            "CAST(max(gap) AS BIGINT) AS max_gap_days "
            "FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1"
        ),
        "rel_event_funnel": (
            "WITH ev AS (SELECT * FROM events "
            "WHERE ts < TIMESTAMP '2024-01-03'), "
            "s1 AS (SELECT user_id, min(ts) AS t FROM ev "
            "WHERE event_type = 'signup' GROUP BY user_id), "
            "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e "
            "JOIN s1 USING (user_id) WHERE e.event_type = 'click' "
            "AND e.ts > s1.t GROUP BY e.user_id), "
            "s3 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e "
            "JOIN s2 USING (user_id) WHERE e.event_type = 'purchase' "
            "AND e.ts > s2.t GROUP BY e.user_id) "
            "SELECT * FROM (SELECT 1 AS step, 'signup' AS event_type, "
            "CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users "
            "UNION ALL SELECT 2, 'click', "
            "CAST((SELECT count(*) FROM s2) AS BIGINT) "
            "UNION ALL SELECT 3, 'purchase', "
            "CAST((SELECT count(*) FROM s3) AS BIGINT)) ORDER BY step"
        ),
        "rel_retention_cohorts": (
            "WITH u AS (SELECT user_id, min(epoch_us(ts)) AS first_us "
            "FROM events GROUP BY user_id) "
            "SELECT (first_us // 86400000000) * 86400000000 AS cohort_day_us, "
            "CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(count(*) FILTER (EXISTS (SELECT 1 FROM events e "
            "WHERE e.user_id = u.user_id "
            "AND epoch_us(e.ts) >= u.first_us + 21 * 86400000000 "
            "AND epoch_us(e.ts) < u.first_us + 22 * 86400000000)) "
            "AS BIGINT) AS n_retained "
            "FROM u GROUP BY cohort_day_us ORDER BY cohort_day_us"
        ),
        "rel_event_transitions": (
            "WITH seq AS (SELECT user_id, event_type AS from_type, "
            "lead(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS to_type FROM events) "
            "SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n "
            "FROM seq WHERE to_type IS NOT NULL "
            "GROUP BY from_type, to_type "
            "ORDER BY n DESC, from_type, to_type LIMIT 15"
        ),
        "rel_conversion_latency": (
            "WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events "
            "WHERE event_type = 'signup' GROUP BY user_id), "
            "p AS (SELECT e.user_id, min(epoch_us(e.ts)) - any_value(s1.t) "
            "AS lat FROM events e JOIN s1 USING (user_id) "
            "WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t "
            "GROUP BY e.user_id) "
            "SELECT CAST(count(*) AS BIGINT) AS n_converted, "
            "CAST(sum(lat) AS BIGINT) AS sum_latency_us, "
            "CAST(min(lat) AS BIGINT) AS min_latency_us, "
            "CAST(max(lat) AS BIGINT) AS max_latency_us FROM p"
        ),
        "rel_rolling_active_users": (
            "WITH bounds AS (SELECT min(epoch_us(ts)) // 86400000000 AS d0, "
            "max(epoch_us(ts)) // 86400000000 AS d1 FROM events), "
            "days AS (SELECT unnest(generate_series(d0, d1)) AS day "
            "FROM bounds), "
            "ud AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events) "
            "SELECT CAST(days.day * 86400000000 AS BIGINT) AS day_us, "
            "CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_active "
            "FROM days LEFT JOIN ud ON ud.day BETWEEN days.day - 6 "
            "AND days.day GROUP BY days.day ORDER BY day_us"
        ),
        "rel_customers_without_orders": (
            "SELECT c_mktsegment, count(*) AS n_customers FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderdate >= TIMESTAMP '2001-01-01') "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "rel_order_count_distribution": (
            "SELECT c_count, count(*) AS n_customers FROM ("
            "SELECT c.c_custkey, count(o.o_orderkey) AS c_count "
            "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_custkey) GROUP BY c_count ORDER BY c_count"
        ),
        "rel_distinct_users_per_type": (
            "SELECT event_type, count(DISTINCT user_id) AS n_users, "
            "count(DISTINCT (user_id, epoch_us(ts) // 86400000000)) "
            "AS n_user_days "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "rel_events_daily_type_pivot": (
            "SELECT epoch_us(ts) // 86400000000 AS day_id, "
            "count(*) FILTER (event_type = 'click') AS n_click, "
            "count(*) FILTER (event_type = 'error') AS n_error, "
            "count(*) FILTER (event_type = 'purchase') AS n_purchase, "
            "count(*) FILTER (event_type = 'signup') AS n_signup, "
            "count(*) FILTER (event_type = 'view') AS n_view, "
            "count(*) FILTER (event_type NOT IN "
            "('click','error','purchase','signup','view')) AS n_other, "
            "count(*) AS n_total "
            "FROM events GROUP BY day_id ORDER BY day_id"
        ),
        "rel_rollup_revenue": (
            "SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag, "
            "coalesce(l_linestatus, 'ALL') AS l_linestatus, "
            "count(*) AS n_rows, CAST(sum("
            f"{_MILLI.format(x='l_extendedprice * (1.0 - l_discount)')}"
            ") AS BIGINT) AS revenue_milli "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "rel_top_brands_by_revenue": (
            "SELECT p.p_brand, CAST(sum("
            f"{_MILLI.format(x='l.l_extendedprice * (1.0 - l.l_discount)')}"
            ") AS BIGINT) AS revenue_milli "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "GROUP BY p.p_brand "
            "ORDER BY revenue_milli DESC, p_brand LIMIT 10"
        ),
        "text_quality_score": (
            "WITH s AS (SELECT doc_id, "
            f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_WS_TOKENS}) END AS n, "
            "CASE WHEN trim(text) = '' THEN 0 ELSE "
            f"len(list_distinct({_WS_TOKENS})) END AS uniq, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha, "
            "length(text) AS nchars FROM documents) "
            "SELECT doc_id, CAST(floor(1000 * ("
            "0.4 * (CASE WHEN n = 0 THEN 0.0 ELSE CAST(uniq AS DOUBLE) / n END) + "
            "0.4 * (CASE WHEN nchars = 0 THEN 0.0 ELSE CAST(alpha AS DOUBLE) / nchars END) + "
            "0.2 * (CASE WHEN n >= 20 THEN 1.0 ELSE CAST(n AS DOUBLE) / 20.0 END)"
            ") + 0.5) AS BIGINT) AS quality_milli FROM s"
        ),
        "io_jsonl_roundtrip": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(doc_id) AS BIGINT) AS sum_doc_id, "
            "CAST(sum(length(text)) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        "io_csv_roundtrip": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(doc_id) AS BIGINT) AS sum_doc_id, "
            "CAST(sum(length(text)) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        # hive-partitioned parquet sink + partition-schema read-back:
        # same lossless-roundtrip rollup as the jsonl/csv oracles
        "io_hive_roundtrip": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(doc_id) AS BIGINT) AS sum_doc_id, "
            "CAST(sum(length(text)) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        "text_lang_id_confusion": (
            "WITH s AS (SELECT doc_id, lang, list_transform(list_slice("
            f"{_WS_TOKENS}, 1, 200), x -> lower(x)) AS toks FROM documents), "
            "h AS (SELECT doc_id, lang, "
            "len(list_distinct(list_filter(toks, x -> x IN "
            "('the','a','and','of','to','in','is','for','on','with')))) AS e, "
            "len(list_distinct(list_filter(toks, x -> x IN "
            "('der','die','das','und','ist','nicht','ein','zu','mit')))) AS d, "
            "len(list_distinct(list_filter(toks, x -> x IN "
            "('le','la','les','et','est','pas','un','une','dans')))) AS f, "
            "len(list_distinct(list_filter(toks, x -> x IN "
            "('el','la','los','y','es','no','un','una','en','que')))) AS s2 "
            "FROM s), "
            "g AS (SELECT lang, CASE "
            "WHEN e > 0 AND e >= d AND e >= f AND e >= s2 THEN 'en' "
            "WHEN d > 0 AND d > e AND d >= f AND d >= s2 THEN 'de' "
            "WHEN f > 0 AND f > e AND f > d AND f >= s2 THEN 'fr' "
            "WHEN s2 > 0 AND s2 > e AND s2 > d AND s2 > f THEN 'es' "
            "ELSE 'unknown' END AS lang_guess FROM h) "
            "SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n "
            "FROM g GROUP BY lang, lang_guess ORDER BY lang, lang_guess"
        ),
        "text_doclen_quantiles_by_lang": (
            "SELECT * FROM (SELECT lang, CAST(0.5 AS DOUBLE) AS q, "
            "quantile_disc(n_chars, 0.5) AS value FROM documents "
            "GROUP BY lang UNION ALL SELECT lang, CAST(0.9 AS DOUBLE), "
            "quantile_disc(n_chars, 0.9) FROM documents GROUP BY lang) "
            "ORDER BY lang, q"
        ),
        "text_quality_percentile_by_lang": (
            "WITH s AS (SELECT doc_id, lang, "
            f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_WS_TOKENS}) END AS n, "
            "CASE WHEN trim(text) = '' THEN 0 ELSE "
            f"len(list_distinct({_WS_TOKENS})) END AS uniq, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha, "
            "length(text) AS nchars FROM documents), "
            "q AS (SELECT doc_id, lang, CAST(floor(1000 * ("
            "0.4 * (CASE WHEN n = 0 THEN 0.0 ELSE CAST(uniq AS DOUBLE) / n END) + "
            "0.4 * (CASE WHEN nchars = 0 THEN 0.0 ELSE CAST(alpha AS DOUBLE) / nchars END) + "
            "0.2 * (CASE WHEN n >= 20 THEN 1.0 ELSE CAST(n AS DOUBLE) / 20.0 END)"
            ") + 0.5) AS BIGINT) AS quality_milli FROM s), "
            "t AS (SELECT lang, quantile_disc(quality_milli, 0.5) AS thr "
            "FROM q GROUP BY lang) "
            "SELECT q.doc_id, q.lang, q.quality_milli FROM q JOIN t USING (lang) "
            "WHERE q.quality_milli >= t.thr ORDER BY doc_id"
        ),
        "text_quality_percentile_filter": (
            "WITH s AS (SELECT doc_id, "
            f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_WS_TOKENS}) END AS n, "
            "CASE WHEN trim(text) = '' THEN 0 ELSE "
            f"len(list_distinct({_WS_TOKENS})) END AS uniq, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha, "
            "length(text) AS nchars FROM documents), "
            "q AS (SELECT doc_id, CAST(floor(1000 * ("
            "0.4 * (CASE WHEN n = 0 THEN 0.0 ELSE CAST(uniq AS DOUBLE) / n END) + "
            "0.4 * (CASE WHEN nchars = 0 THEN 0.0 ELSE CAST(alpha AS DOUBLE) / nchars END) + "
            "0.2 * (CASE WHEN n >= 20 THEN 1.0 ELSE CAST(n AS DOUBLE) / 20.0 END)"
            ") + 0.5) AS BIGINT) AS quality_milli FROM s), "
            "t AS (SELECT quantile_disc(quality_milli, 0.5) AS thr FROM q) "
            "SELECT q.doc_id, q.quality_milli FROM q, t "
            "WHERE q.quality_milli >= t.thr ORDER BY doc_id"
        ),
        "text_curation_pipeline": (
            "WITH s AS (SELECT doc_id, lang, text, "
            f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_WS_TOKENS}) END AS n, "
            "CASE WHEN trim(text) = '' THEN 0 ELSE "
            f"len(list_distinct({_WS_TOKENS})) END AS uniq, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha, "
            "length(text) AS nchars FROM documents), "
            "q AS (SELECT doc_id, text, CAST(floor(1000 * ("
            "0.4 * (CASE WHEN n = 0 THEN 0.0 ELSE CAST(uniq AS DOUBLE) / n END) + "
            "0.4 * (CASE WHEN nchars = 0 THEN 0.0 ELSE CAST(alpha AS DOUBLE) / nchars END) + "
            "0.2 * (CASE WHEN n >= 20 THEN 1.0 ELSE CAST(n AS DOUBLE) / 20.0 END)"
            ") + 0.5) AS BIGINT) AS qm FROM s WHERE lang = 'en') "
            "SELECT min(doc_id) AS doc_id FROM q WHERE qm >= 600 "
            "GROUP BY sha256(text) ORDER BY doc_id"
        ),
        "text_lang_id": (
            "WITH s AS (SELECT doc_id, list_transform(list_slice("
            f"{_WS_TOKENS}, 1, 200), x -> lower(x)) AS toks FROM documents), "
            "h AS (SELECT doc_id, "
            "len(list_distinct(list_filter(toks, x -> x IN "
            "('the','a','and','of','to','in','is','for','on','with')))) AS e, "
            "len(list_distinct(list_filter(toks, x -> x IN "
            "('der','die','das','und','ist','nicht','ein','zu','mit')))) AS d, "
            "len(list_distinct(list_filter(toks, x -> x IN "
            "('le','la','les','et','est','pas','un','une','dans')))) AS f, "
            "len(list_distinct(list_filter(toks, x -> x IN "
            "('el','la','los','y','es','no','un','una','en','que')))) AS s2 "
            "FROM s) "
            "SELECT doc_id, CASE "
            "WHEN e > 0 AND e >= d AND e >= f AND e >= s2 THEN 'en' "
            "WHEN d > 0 AND d > e AND d >= f AND d >= s2 THEN 'de' "
            "WHEN f > 0 AND f > e AND f > d AND f >= s2 THEN 'fr' "
            "WHEN s2 > 0 AND s2 > e AND s2 > d AND s2 > f THEN 'es' "
            "ELSE 'unknown' END AS lang_guess FROM h"
        ),
        "embedding_neardup_pairs": (
            "SELECT a.vec_id AS a_id, b.vec_id AS b_id "
            "FROM embeddings a JOIN embeddings b "
            "ON a.vec_id < b.vec_id "
            "WHERE a.vec_id < 500 AND b.vec_id < 500 AND "
            "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.42 "
            "ORDER BY a_id, b_id"
        ),
        "fts_corpus_sha256": (
            "SELECT printf('%s/doc_%08d.txt', source, doc_id) AS path, "
            "sha256(text) AS sha256 FROM documents ORDER BY path"
        ),
        # extract semantics over the single-line documents corpus:
        # whole-file, line-1 context, and #symbol text-search specs
        "fts_extract_docs": (
            "WITH c AS (SELECT printf('%s/doc_%08d.txt', source, doc_id) "
            "AS path, source AS repo, text FROM documents), "
            "ranked AS (SELECT *, row_number() OVER (ORDER BY path) AS rn FROM c), "
            "dup AS (SELECT min(path) AS path FROM c WHERE text LIKE '%dup%') "
            "SELECT path AS spec, repo, path, 1 AS start_line, 1 AS end_line, "
            "'file' AS node_type, text AS code FROM ranked WHERE rn = 1 "
            "UNION ALL SELECT path || ':1', repo, path, 1, 1, 'context', text "
            "FROM ranked WHERE rn = 2 "
            "UNION ALL SELECT c.path || '#dup', c.repo, c.path, 1, 1, "
            "'text_search', c.text FROM c JOIN dup ON c.path = dup.path"
        ),
        "fts_index_doc_stats": (
            "SELECT count(*) AS n_docs, "
            "count(DISTINCT sha256(text)) AS n_distinct_sha FROM documents"
        ),
        "text_token_count": (
            f"SELECT doc_id, {_N_TOKENS} AS n_tokens FROM documents"
        ),
        # same RE2 engine on both sides (Arrow replace_substring_regex /
        # DuckDB regexp_replace) — parity exact by construction
        "text_normalize_stopwords": (
            "WITH n AS (SELECT doc_id, trim(regexp_replace(regexp_replace("
            "text, '\\b(a|the|and|of|to)\\b', '', 'g'), '\\s+', ' ', 'g')) "
            "AS norm_text FROM documents) "
            "SELECT doc_id, norm_text, CASE WHEN norm_text = '' THEN 0 ELSE "
            "CAST(length(norm_text) - length(replace(norm_text, ' ', '')) + 1 "
            "AS BIGINT) END AS n_words FROM n"
        ),
        "text_token_count_bpeish": (
            "SELECT doc_id, len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_pieces FROM documents"
        ),
        "text_stats": (
            "SELECT doc_id, length(text) AS n_chars_actual, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars, "
            "length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_chars, "
            f"{_N_TOKENS} AS n_tokens, "
            f"CASE WHEN trim(text) = '' THEN 0 ELSE len(list_distinct({_WS_TOKENS})) END"
            " AS uniq_tokens FROM documents"
        ),
        # deterministic content-hash split: membership = md5 prefix,
        # identical across engines ('e6' => ~10.2% val)
        "text_train_val_split": (
            "SELECT doc_id, CASE WHEN substr(md5(text), 1, 2) >= 'e6' "
            "THEN 'val' ELSE 'train' END AS split FROM documents"
        ),
        # benchmark 8-gram decontamination (benchmark = doc_id < 32)
        "text_decontaminate": (
            "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w "
            "FROM documents), "
            "ng AS (SELECT doc_id, unnest(list_transform(range(len(w) - 7), "
            "i -> array_to_string(list_slice(w, i + 1, i + 8), ' '))) AS g "
            "FROM tok WHERE len(w) >= 8), "
            "bench AS (SELECT DISTINCT g FROM ng WHERE doc_id < 32), "
            "contam AS (SELECT DISTINCT ng.doc_id FROM ng "
            "JOIN bench USING (g) WHERE ng.doc_id >= 32) "
            "SELECT d.doc_id, CAST(CASE WHEN c.doc_id IS NOT NULL "
            "THEN 1 ELSE 0 END AS INTEGER) AS contaminated "
            "FROM documents d LEFT JOIN contam c USING (doc_id) "
            "WHERE d.doc_id >= 32"
        ),
        # corpus-wide bigram top-20 (cnt desc, ngram asc tie-break)
        "text_ngram_topk": (
            "WITH tok AS (SELECT string_split(text, ' ') AS w FROM documents), "
            "ng AS (SELECT unnest(list_transform(range(len(w) - 1), "
            "i -> array_to_string(list_slice(w, i + 1, i + 2), ' '))) AS ngram "
            "FROM tok WHERE len(w) >= 2) "
            "SELECT ngram, CAST(count(*) AS BIGINT) AS cnt FROM ng "
            "GROUP BY ngram ORDER BY cnt DESC, ngram ASC LIMIT 20"
        ),
        # Gopher-style within-doc repetition counts (raw ints so the hash
        # is exact; ratios are derived downstream)
        "text_repetition_stats": (
            "WITH w AS (SELECT doc_id, "
            "string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws FROM documents), "
            "tok AS (SELECT doc_id, unnest(ws) AS word, "
            "generate_subscripts(ws, 1) AS pos FROM w), "
            "uniq AS (SELECT doc_id, count(DISTINCT word) AS n_uniq "
            "FROM tok GROUP BY doc_id), "
            "bg AS (SELECT a.doc_id, a.word AS w1, b.word AS w2 FROM tok a "
            "JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1), "
            "bgc AS (SELECT doc_id, w1, w2, count(*) AS c "
            "FROM bg GROUP BY doc_id, w1, w2), "
            "top AS (SELECT doc_id, max(c) AS top_bigram_n "
            "FROM bgc GROUP BY doc_id) "
            "SELECT w.doc_id, len(ws) AS n_words, u.n_uniq AS n_uniq_words, "
            "greatest(len(ws) - 1, 0) AS n_bigrams, "
            "CAST(coalesce(t.top_bigram_n, 0) AS BIGINT) AS top_bigram_n "
            "FROM w JOIN uniq u USING (doc_id) LEFT JOIN top t USING (doc_id) "
            "ORDER BY doc_id"
        ),
        # deterministic per-language stratified sampling: Fibonacci-hash
        # LCG on doc_id, identical expression on both engines
        "text_stratified_sample": (
            "SELECT doc_id, lang, source FROM documents "
            "WHERE (doc_id * 2654435761) % 4294967296 < "
            "CASE lang WHEN 'en' THEN 2147483648 WHEN 'de' THEN 1073741824 "
            "WHEN 'fr' THEN 1073741824 WHEN 'es' THEN 1073741824 "
            "WHEN 'zh' THEN 429496729 ELSE 0 END ORDER BY doc_id"
        ),
        # deterministic source-mixture sampling (epochs per source:
        # floor(w) copies + a hash-gated fractional copy)
        "text_mixture_sample": _mixture_sql(),
        # per-doc count of word-4-gram occurrences shared with >= 2 docs
        "text_shared_ngram_counts": (
            "WITH w AS (SELECT doc_id, "
            "string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws FROM documents), "
            "g AS (SELECT doc_id, unnest(list_transform(range(len(ws) - 3), "
            "i -> array_to_string(list_slice(ws, i + 1, i + 4), ' '))) AS gram "
            "FROM w WHERE len(ws) >= 4), "
            "occ AS (SELECT doc_id, gram, count(*) AS occ "
            "FROM g GROUP BY doc_id, gram), "
            "shared AS (SELECT gram FROM occ GROUP BY gram "
            "HAVING count(DISTINCT doc_id) >= 2), "
            "sh AS (SELECT doc_id, sum(occ) AS n_shared FROM occ "
            "JOIN shared USING (gram) GROUP BY doc_id) "
            "SELECT w.doc_id, greatest(len(ws) - 3, CAST(0 AS BIGINT)) "
            "AS n_grams, CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared "
            "FROM w LEFT JOIN sh USING (doc_id) ORDER BY doc_id"
        ),
        # per-doc top-5 distinctive terms: integer TF-IDF analog ranked by
        # (tf desc, df asc, term asc) — no float division, exact hash
        "text_distinctive_terms": (
            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
            "FROM tok WHERE term <> '' GROUP BY doc_id, term), "
            "df AS (SELECT term, CAST(count(*) AS BIGINT) AS df "
            "FROM tf GROUP BY term), "
            "ranked AS (SELECT tf.doc_id, tf.term, tf.tf, df.df, "
            "row_number() OVER (PARTITION BY tf.doc_id "
            "ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rk "
            "FROM tf JOIN df USING (term)) "
            "SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df "
            "FROM ranked WHERE rk <= 5 ORDER BY doc_id, rk"
        ),
        # unigram-LM surprisal, exact integers: surprisal(token) =
        # bit_length(T // c) = length(bin(T // c)); docs with zero tokens
        # have no LM score and are omitted
        "text_unigram_surprisal": (
            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
            "FROM tok WHERE term <> '' GROUP BY doc_id, term), "
            "c AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c "
            "FROM tf GROUP BY term), "
            "t AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM tf) "
            "SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens, "
            "CAST(sum(tf.tf * length(bin(t.total // c.c))) AS BIGINT) "
            "AS surprisal_bits "
            "FROM tf JOIN c USING (term) CROSS JOIN t "
            "GROUP BY tf.doc_id ORDER BY doc_id"
        ),
        # DSIR-style importance weights (arXiv:2302.03169 analog): target
        # = lang='en' slice, raw = whole corpus, per-doc bigram weight in
        # exact integer bits (same bit_length = length(bin(...)) identity
        # as unigram_surprisal); absent-from-target grams clamp to c_t=1
        "text_dsir_weights": (
            "WITH w AS (SELECT doc_id, lang, string_split_regex("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
            "FROM documents), "
            "g AS (SELECT doc_id, lang, unnest(list_transform("
            "range(len(ws) - 1), i -> array_to_string("
            "list_slice(ws, i + 1, i + 2), ' '))) AS gram "
            "FROM w WHERE len(ws) >= 2), "
            "tf AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS tf, "
            "bool_or(lang = 'en') AS is_t FROM g GROUP BY doc_id, gram), "
            "c AS (SELECT gram, CAST(sum(tf) AS BIGINT) AS c_raw, "
            "CAST(coalesce(sum(CASE WHEN is_t THEN tf END), 0) AS BIGINT) "
            "AS c_t FROM tf GROUP BY gram), "
            "t AS (SELECT CAST(sum(tf) AS BIGINT) AS t_raw, "
            "CAST(coalesce(sum(CASE WHEN is_t THEN tf END), 0) AS BIGINT) "
            "AS t_t FROM tf) "
            "SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_grams, "
            "CAST(sum(tf.tf * (length(bin(greatest(t.t_raw, 1) // "
            "greatest(c.c_raw, 1))) - length(bin(greatest(t.t_t, 1) // "
            "greatest(c.c_t, 1))))) AS BIGINT) AS weight_bits "
            "FROM tf JOIN c USING (gram) CROSS JOIN t "
            "GROUP BY tf.doc_id ORDER BY doc_id"
        ),
        # GPT-style sequence packing: concat all docs' whitespace tokens in
        # doc_id order, cut every 64; one row per (doc, sequence) overlap.
        # Window cumsum = the oracle for the distributed range-offset scan
        "export_pack_sequences": (
            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS term "
            "FROM documents), "
            "n AS (SELECT doc_id, CAST(count(*) FILTER (term <> '') "
            "AS BIGINT) AS n FROM tok GROUP BY doc_id), "
            "c AS (SELECT doc_id, n, CAST(coalesce(sum(n) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS BIGINT) AS s FROM n), "
            "x AS (SELECT doc_id, n, s, unnest(generate_series("
            "s // 64, (s + n - 1) // 64)) AS seq_id FROM c WHERE n > 0) "
            "SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id, "
            "CAST(greatest(s, seq_id * 64) - seq_id * 64 AS BIGINT) "
            "AS seq_off, "
            "CAST(least((seq_id + 1) * 64, s + n) - greatest(s, seq_id * 64) "
            "AS BIGINT) AS n_toks "
            "FROM x ORDER BY doc_id, seq_id"
        ),
        # WebDataset-style tar shard manifest: the SQL-expressible slice
        # of the layout (member assignment + payload byte totals)
        "export_tar_shards": (
            "SELECT CAST(doc_id % 8 AS BIGINT) AS shard, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(octet_length(encode(text))) AS BIGINT) AS n_bytes "
            "FROM documents GROUP BY 1 ORDER BY 1"
        ),
        # seeded deterministic shuffle: hv = 32-bit-safe affine mix (every
        # product fits HUGEINT/uint64 exactly), shard = hv % 16, pos = rank
        # of (hv, doc_id) within the shard — matches ops/export._mix_hash
        "export_curated_pack": (
            "WITH s AS (SELECT doc_id, lang, text, "
            f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_WS_TOKENS}) END AS n, "
            "CASE WHEN trim(text) = '' THEN 0 ELSE "
            f"len(list_distinct({_WS_TOKENS})) END AS uniq, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha, "
            "length(text) AS nchars FROM documents), "
            "q AS (SELECT doc_id, text, CAST(floor(1000 * ("
            "0.4 * (CASE WHEN n = 0 THEN 0.0 ELSE CAST(uniq AS DOUBLE) / n END) + "
            "0.4 * (CASE WHEN nchars = 0 THEN 0.0 ELSE CAST(alpha AS DOUBLE) / nchars END) + "
            "0.2 * (CASE WHEN n >= 20 THEN 1.0 ELSE CAST(n AS DOUBLE) / 20.0 END)"
            ") + 0.5) AS BIGINT) AS qm FROM s WHERE lang = 'en'), "
            "tok8 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
            "ng AS (SELECT doc_id, unnest(list_transform(range(len(w) - 7), "
            "i -> array_to_string(list_slice(w, i + 1, i + 8), ' '))) AS g "
            "FROM tok8 WHERE len(w) >= 8), "
            "bench AS (SELECT DISTINCT g FROM ng WHERE doc_id < 32), "
            "contam AS (SELECT DISTINCT ng.doc_id FROM ng JOIN bench USING (g) "
            "WHERE ng.doc_id >= 32), "
            "surv AS (SELECT min(doc_id) AS doc_id FROM q "
            "WHERE qm >= 600 AND doc_id >= 32 "
            "AND doc_id NOT IN (SELECT doc_id FROM contam) "
            "GROUP BY sha256(text)), "
            "tok AS (SELECT d.doc_id, unnest(string_split_regex("
            "regexp_replace(d.text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS term "
            "FROM documents d JOIN surv USING (doc_id)), "
            "n AS (SELECT doc_id, CAST(count(*) FILTER (term <> '') AS BIGINT) "
            "AS n FROM tok GROUP BY doc_id), "
            "c AS (SELECT doc_id, n, CAST(coalesce(sum(n) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s "
            "FROM n), "
            "x AS (SELECT doc_id, n, s, unnest(generate_series(s // 64, "
            "(s + n - 1) // 64)) AS seq_id FROM c WHERE n > 0) "
            "SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id, "
            "CAST(greatest(s, seq_id * 64) - seq_id * 64 AS BIGINT) AS seq_off, "
            "CAST(least((seq_id + 1) * 64, s + n) - greatest(s, seq_id * 64) "
            "AS BIGINT) AS n_toks FROM x ORDER BY doc_id, seq_id"
        ),
        "export_seq_stats": (
            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS term "
            "FROM documents), "
            "n AS (SELECT doc_id, CAST(count(*) FILTER (term <> '') AS BIGINT) "
            "AS n FROM tok GROUP BY doc_id), "
            "c AS (SELECT doc_id, n, CAST(coalesce(sum(n) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s "
            "FROM n), "
            "x AS (SELECT doc_id, n, s, unnest(generate_series(s // 64, "
            "(s + n - 1) // 64)) AS seq_id FROM c WHERE n > 0) "
            "SELECT CAST(seq_id AS BIGINT) AS seq_id, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(least((seq_id + 1) * 64, s + n) - "
            "greatest(s, seq_id * 64)) AS BIGINT) AS n_toks "
            "FROM x GROUP BY seq_id ORDER BY seq_id"
        ),
        "export_pack_by_lang": (
            "WITH tok AS (SELECT doc_id, lang, unnest(string_split_regex("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS term "
            "FROM documents), "
            "n AS (SELECT doc_id, any_value(lang) AS lang, "
            "CAST(count(*) FILTER (term <> '') AS BIGINT) AS n FROM tok "
            "GROUP BY doc_id), "
            "c AS (SELECT doc_id, lang, n, CAST(coalesce(sum(n) OVER ("
            "PARTITION BY lang ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
            "AS s FROM n), "
            "x AS (SELECT doc_id, lang, n, s, unnest(generate_series(s // 64, "
            "(s + n - 1) // 64)) AS seq_id FROM c WHERE n > 0) "
            "SELECT lang, doc_id, CAST(seq_id AS BIGINT) AS seq_id, "
            "CAST(greatest(s, seq_id * 64) - seq_id * 64 AS BIGINT) AS seq_off, "
            "CAST(least((seq_id + 1) * 64, s + n) - greatest(s, seq_id * 64) "
            "AS BIGINT) AS n_toks FROM x ORDER BY lang, doc_id, seq_id"
        ),
        "export_shuffle_order": (
            "WITH h AS (SELECT doc_id, CAST(("
            "(CAST(2654435761 AS HUGEINT) * (doc_id & 4294967295)) "
            "% 4294967291 + "
            "(CAST(40503 AS HUGEINT) * (doc_id >> 32)) % 4294967291 + 177"
            ") % 4294967291 AS BIGINT) AS hv FROM documents) "
            "SELECT doc_id, CAST(hv % 16 AS BIGINT) AS shard, "
            "CAST(row_number() OVER (PARTITION BY hv % 16 "
            "ORDER BY hv, doc_id) - 1 AS BIGINT) AS pos "
            "FROM h ORDER BY shard, pos"
        ),
        # per-source budgeted selection: greedy prefix of the
        # (n_chars DESC, doc_id ASC) order while the exclusive running
        # char total stays under the 4000-char budget — the window-cumsum
        # oracle for the distributed histogram-threshold selection
        "export_budget_select": (
            "WITH r AS (SELECT source, doc_id, n_chars, "
            "coalesce(sum(n_chars) OVER (PARTITION BY source "
            "ORDER BY n_chars DESC, doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS prior FROM documents) "
            "SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars "
            "FROM r WHERE prior < 4000 ORDER BY source, doc_id"
        ),
        # PII scrub: DuckDB regexp_* and pyarrow.compute regex kernels are
        # both RE2, so counts and replacements match exactly; patterns and
        # application order mirror probe_ray.ops.text.PII_PATTERNS
        "text_pii_scrub": (
            "WITH s0 AS (SELECT doc_id, text AS t FROM documents), "
            "s1 AS (SELECT doc_id, "
            "len(regexp_extract_all(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email, "
            "regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g') AS t FROM s0), "
            "s2 AS (SELECT doc_id, n_email, "
            "len(regexp_extract_all(t, "
            "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n_ipv4, "
            "regexp_replace(t, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', "
            "'<IP>', 'g') AS t FROM s1) "
            "SELECT doc_id, CAST(n_email AS BIGINT) AS n_email, "
            "CAST(n_ipv4 AS BIGINT) AS n_ipv4, "
            "CAST(len(regexp_extract_all(t, "
            "'\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS BIGINT) AS n_phone, "
            "regexp_replace(t, '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g') "
            "AS clean_text FROM s2 ORDER BY doc_id"
        ),
        # deterministic k-per-source sample: same Fibonacci-hash LCG rank
        # expression as text_stratified_sample
        "text_group_sample": (
            "SELECT doc_id, source, CAST(rn AS BIGINT) AS sample_rank FROM ("
            "SELECT doc_id, source, row_number() OVER (PARTITION BY source "
            "ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn "
            "FROM documents) WHERE rn <= 5 ORDER BY source, sample_rank"
        ),
        "rel_events_json_kpis": (
            "SELECT event_type, count(*) AS n_events, "
            "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
            "AS BIGINT) AS sum_k, "
            "CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
            "AS BIGINT) AS max_k "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "dedup_exact_groups": (
            "SELECT sha256(text) AS sha, min(doc_id) AS keeper_id, "
            "count(*) AS group_size FROM documents GROUP BY sha256(text)"
        ),
        "dedup_exact_keep_first": (
            "SELECT min(doc_id) AS doc_id FROM documents "
            "GROUP BY sha256(text) ORDER BY doc_id"
        ),
        "dedup_ngram_jaccard_pairs": (
            "WITH s AS (SELECT DISTINCT doc_id, unnest("
            + _WS_TOKENS
            + ") AS tok FROM documents WHERE doc_id < 50 AND trim(text) <> ''), "
            "sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id) "
            "SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter_count, "
            "any_value(za.n) AS a_size, any_value(zb.n) AS b_size "
            "FROM s a JOIN s b ON a.tok = b.tok AND a.doc_id < b.doc_id "
            "JOIN sz za ON za.doc_id = a.doc_id JOIN sz zb ON zb.doc_id = b.doc_id "
            "GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 5 "
            "ORDER BY a_id, b_id"
        ),
        # connected components over the jaccard-pair graph: cluster_id =
        # min reachable doc_id (recursive transitive closure)
        "dedup_neardup_clusters": (
            "WITH RECURSIVE "
            "s AS (SELECT DISTINCT doc_id, unnest("
            + _WS_TOKENS
            + ") AS tok FROM documents WHERE doc_id < 50 AND trim(text) <> ''), "
            "pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id "
            "FROM s a JOIN s b ON a.tok = b.tok AND a.doc_id < b.doc_id "
            "GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 5), "
            "e AS (SELECT a_id AS a, b_id AS b FROM pairs "
            "UNION ALL SELECT b_id, a_id FROM pairs), "
            "nodes AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 50), "
            "reach(n, m) AS (SELECT doc_id, doc_id FROM nodes "
            "UNION SELECT r.n, e.b FROM reach r JOIN e ON e.a = r.m) "
            "SELECT n AS doc_id, min(m) AS cluster_id FROM reach "
            "GROUP BY n ORDER BY doc_id"
        ),
        "ann_knn_classify": (
            "WITH scored AS (SELECT a.vec_id AS vid, a.label AS lab, "
            "b.vec_id AS nid, b.label AS nlab, "
            "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) AS sim "
            "FROM embeddings a JOIN embeddings b "
            "ON b.vec_id < 500 AND b.vec_id <> a.vec_id), "
            "ranked AS (SELECT vid, lab, nlab, row_number() OVER "
            "(PARTITION BY vid ORDER BY sim DESC, nid) AS rk FROM scored), "
            "votes AS (SELECT vid, any_value(lab) AS lab, nlab, count(*) AS c "
            "FROM ranked WHERE rk <= 5 GROUP BY vid, nlab), "
            "best AS (SELECT vid, lab, nlab, row_number() OVER "
            "(PARTITION BY vid ORDER BY c DESC, nlab) AS vr FROM votes) "
            "SELECT vid AS vec_id, CAST(lab AS BIGINT) AS label, "
            "CAST(nlab AS BIGINT) AS pred_label FROM best WHERE vr = 1 "
            "ORDER BY vec_id"
        ),
        "ann_brute_topk": (
            "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings ORDER BY vec_id LIMIT 4), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim "
            "FROM embeddings e CROSS JOIN q), "
            "ranked AS (SELECT query_id, vec_id, "
            "row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank "
            "FROM scored) "
            "SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 5 "
            "ORDER BY query_id, rank"
        ),
        # cosine range search: all pairs reaching the threshold; tau is
        # chosen away from any actual similarity (margin asserted in the
        # suite) so f64-rounding differences between engines can't flip
        # a boundary pair
        "ann_range_search": (
            "WITH q AS (SELECT vec_id AS query_id, "
            "CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings ORDER BY vec_id LIMIT 4) "
            "SELECT q.query_id, e.vec_id FROM embeddings e CROSS JOIN q "
            "WHERE list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "q.qv) >= 0.3 ORDER BY query_id, vec_id"
        ),
        # global-min/max int8 scalar quantization per dimension (the
        # suite asserts every scaled value sits off the rounding grid)
        "ann_int8_quantize": (
            "WITH u AS (SELECT vec_id, "
            "unnest(CAST(embedding AS DOUBLE[])) AS val, "
            "unnest(range(len(embedding))) AS d FROM embeddings), "
            "st AS (SELECT d, min(val) AS lo, max(val) AS hi "
            "FROM u GROUP BY d) "
            "SELECT u.vec_id, u.d AS dim, CAST(floor((u.val - st.lo) / "
            "(CASE WHEN st.hi > st.lo THEN st.hi - st.lo ELSE 1 END) "
            "* 255 + 0.5) AS BIGINT) AS q "
            "FROM u JOIN st ON st.d = u.d ORDER BY vec_id, dim"
        ),
        "multimodal_payload_sizes": (
            "SELECT doc_id, strlen(text) AS payload_bytes FROM documents"
        ),
    }
