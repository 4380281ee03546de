"""Local mirror of the driver's Ray-vs-DuckDB correctness gate for the
SQL-expressible operators (sf0.001; the driver runs sf0.01).

Compare rule mirrors the driver: sort columns by name, sort rows by all
columns, compare STRING-RENDERED values — the driver hashes rendered
values, so a numerically-equal-but-differently-typed result (294 vs
294.0, the round-3 text_doclen_quantiles_by_lang failure) must fail here
too, not only at the driver. Coverage = every oracle_sql() key (the
parametrization asserts the lists stay in sync)."""

from __future__ import annotations

import glob
import os

import duckdb
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

CASES = [
    "ann_brute_topk",
    "dedup_exact_keep_first",
    "fts_corpus_sha256",
    "fts_index_doc_stats",
    "multimodal_payload_sizes",
    "rel_asof_last_click_salted",
    "rel_band_join_counts_salted",
    "rel_value_quantiles",
    "rel_value_quantiles_by_type",
    "text_heavy_hitters",
    "text_token_count_bpeish",
    "rel_q1_pricing_summary",
    "rel_top_customers_by_revenue",
    "rel_events_hourly_counts",
    "rel_customers_per_region",
    "rel_sessionize_events",
    "rel_q6_revenue_filter",
    "rel_events_sliding_window",
    "rel_top_event_per_user",
    "rel_order_priority_semijoin",
    "rel_top_brands_by_revenue",
    "rel_asof_last_click",
    "rel_band_join_counts",
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier_volume",
    "rel_q10_returned_items",
    "rel_q14_promo_revenue",
    "rel_q18_large_orders",
    "rel_q19_bracket_revenue",
    "rel_q22_rich_inactive",
    "rel_q17_small_qty_revenue",
    "rel_q21_sole_late_supplier",
    "rel_q15_top_supplier",
    "rel_q7_volume_shipping",
    "rel_q11_important_parts",
    "rel_q8_market_share",
    "rel_q9_nation_revenue",
    "rel_running_order_spend",
    "rel_customer_rfm",
    "rel_top_parts_per_brand",
    "rel_customer_order_gaps",
    "ann_range_search",
    "ann_int8_quantize",
    "rel_event_funnel",
    "rel_retention_cohorts",
    "rel_event_transitions",
    "rel_conversion_latency",
    "rel_rolling_active_users",
    "rel_customers_without_orders",
    "rel_order_count_distribution",
    "rel_distinct_users_per_type",
    "rel_events_daily_type_pivot",
    "rel_rollup_revenue",
    "text_quality_score",
    "text_quality_percentile_filter",
    "text_quality_percentile_by_lang",
    "text_curation_pipeline",
    "text_lang_id",
    "text_lang_id_confusion",
    "text_doclen_quantiles_by_lang",
    "text_token_count",
    "text_normalize_stopwords",
    "text_stats",
    "text_train_val_split",
    "text_decontaminate",
    "text_ngram_topk",
    "text_repetition_stats",
    "text_stratified_sample",
    "text_mixture_sample",
    "text_shared_ngram_counts",
    "text_pii_scrub",
    "text_group_sample",
    "text_distinctive_terms",
    "text_unigram_surprisal",
    "text_dsir_weights",
    "export_pack_sequences",
    "export_curated_pack",
    "export_seq_stats",
    "export_pack_by_lang",
    "export_shuffle_order",
    "export_budget_select",
    "rel_events_json_kpis",
    "dedup_exact_groups",
    "dedup_ngram_jaccard_pairs",
    "dedup_neardup_clusters",
    "embedding_neardup_pairs",
    "fts_extract_docs",
    "ann_knn_classify",
    "io_jsonl_roundtrip",
    "io_csv_roundtrip",
    "io_hive_roundtrip",
    "export_tar_shards",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _to_table(result) -> pa.Table:
    if isinstance(result, pa.Table):
        return result
    # ray Dataset
    import ray.data

    if isinstance(result, ray.data.Dataset):
        batches = list(result.iter_batches(batch_format="pyarrow"))
        if not batches:
            return pa.table({})
        return pa.concat_tables([pa.table(b) for b in batches])
    return pa.table(result)


def _render(v) -> str:
    """Driver-style value rendering: the external gate hashes rendered
    values, so the canonical form here must distinguish 294 from 294.0."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(_render(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(f"{k}:{_render(x)}" for k, x in sorted(v.items()))
            + "}"
        )
    return str(v)


def _canon(t: pa.Table) -> list[tuple]:
    cols = sorted(t.column_names)
    t = t.select(cols)
    rows = sorted(
        tuple(_render(r[c]) for c in cols) for r in t.to_pylist()
    )
    return rows


def test_cases_cover_every_oracle_key():
    """This suite IS the local mirror of the driver gate: every
    oracle_sql() key must be parametrized above, and nothing stale."""
    import __ray_entry__ as entrymod

    assert sorted(CASES) == sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(ray_session, duck, name):
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    ours = _canon(_to_table(q(SF_DIR)))
    theirs = _canon(duck.execute(sql).arrow())
    assert len(ours) == len(theirs), (
        f"{name}: row count {len(ours)} != oracle {len(theirs)}"
    )
    assert ours == theirs, f"{name}: value mismatch vs oracle"


def test_multimodal_frame_plumbing(ray_session):
    """Frame sampling fans one doc out to n_frames rows, deterministically;
    resize pools features to the target dim."""
    from probe_ray.ops import multimodal

    t1 = _to_table(multimodal.frame_features(SF_DIR, n_frames=3))
    t2 = _to_table(multimodal.frame_features(SF_DIR, n_frames=3))
    assert _canon(t1) == _canon(t2)
    by_doc: dict[int, set] = {}
    for r in t1.to_pylist():
        by_doc.setdefault(r["doc_id"], set()).add(r["frame_idx"])
    assert all(frames == {0, 1, 2} for frames in by_doc.values())

    rz = _to_table(multimodal.resize_features(SF_DIR, out_dim=2))
    assert all(len(r["feature"]) == 2 for r in rz.to_pylist()[:20])


def test_minhash_verify_distributed_equals_driver(ray_session, monkeypatch):
    """The two-shuffle distributed exact-Jaccard verify (candidate sets
    above VERIFY_DRIVER_PAIRS) must produce exactly the driver verify
    table — the dedup crossover-identity guarantee."""
    from probe_ray.ops import dedup

    fast = _canon(_to_table(dedup.minhash_verified_pairs(SF_DIR)))
    monkeypatch.setattr(dedup, "VERIFY_DRIVER_PAIRS", -1)
    dist = _canon(_to_table(dedup.minhash_verified_pairs(SF_DIR)))
    assert fast == dist
    assert len(fast) > 0


def test_relational_join_crossover_identity(ray_session, monkeypatch):
    """The size-aware dimension-join crossover: forcing the distributed
    bounded-partition repartition-join branch (DICT_DRIVER_MAX_ROWS = -1)
    must produce exactly the broadcast-dict result."""
    from probe_ray.ops import relational

    brands = _canon(_to_table(relational.top_brands_by_revenue(SF_DIR)))
    regions = _canon(_to_table(relational.customers_per_region(SF_DIR)))
    assert len(brands) > 0 and len(regions) > 0
    monkeypatch.setattr(relational, "DICT_DRIVER_MAX_ROWS", -1)
    assert _canon(_to_table(relational.top_brands_by_revenue(SF_DIR))) == brands
    assert _canon(_to_table(relational.customers_per_region(SF_DIR))) == regions


def test_top_customers_exchange_crossover_identity(ray_session, monkeypatch):
    """top_customers_by_revenue's single-merge vs hash-partitioned
    sum+top-k exchange: forcing the partitioned branch
    (TOPK_SINGLE_MERGE_MAX_ROWS = -1) must produce exactly the
    single-merge result."""
    from probe_ray.ops import relational

    small = _canon(_to_table(relational.top_customers_by_revenue(SF_DIR)))
    assert len(small) == 20
    monkeypatch.setattr(relational, "TOPK_SINGLE_MERGE_MAX_ROWS", -1)
    assert (
        _canon(_to_table(relational.top_customers_by_revenue(SF_DIR))) == small
    )


def test_q10_single_merge_crossover_identity(ray_session, monkeypatch):
    """returned_item_revenue's custkey exchange: forcing the partitioned
    branch (TOPK_SINGLE_MERGE_MAX_ROWS = -1) must equal the single-merge
    result."""
    from probe_ray.ops import relational

    small = _canon(_to_table(relational.returned_item_revenue(SF_DIR)))
    assert len(small) > 0
    monkeypatch.setattr(relational, "TOPK_SINGLE_MERGE_MAX_ROWS", -1)
    assert (
        _canon(_to_table(relational.returned_item_revenue(SF_DIR))) == small
    )


def test_tpch_dim_join_crossover_identity(ray_session, monkeypatch):
    """Q5's supplier join and Q14's part join: forcing the distributed
    bounded-partition branch (DICT_DRIVER_MAX_ROWS = -1) must produce
    exactly the broadcast searchsorted-array result."""
    from probe_ray.ops import relational

    q5 = _canon(_to_table(relational.local_supplier_volume(SF_DIR)))
    q14 = _canon(_to_table(relational.promo_revenue(SF_DIR)))
    q19 = _canon(_to_table(relational.discounted_bracket_revenue(SF_DIR)))
    assert len(q5) > 0 and len(q14) == 1
    assert float(q19[0][0]) > 0  # non-vacuous bracket revenue (rendered)
    monkeypatch.setattr(relational, "DICT_DRIVER_MAX_ROWS", -1)
    assert _canon(_to_table(relational.local_supplier_volume(SF_DIR))) == q5
    assert _canon(_to_table(relational.promo_revenue(SF_DIR))) == q14
    assert (
        _canon(_to_table(relational.discounted_bracket_revenue(SF_DIR)))
        == q19
    )


def test_text_term_broadcast_crossover_identity(ray_session, monkeypatch):
    """distinctive_terms / unigram_surprisal size-aware crossover: the
    broadcast-vocab local path (vocab <= TERM_BROADCAST_MAX_TERMS) and
    the (doc,term) exchange path must be output-identical."""
    from probe_ray.ops import text

    dist_bc = _canon(_to_table(text.distinctive_terms(SF_DIR)))
    surp_bc = _canon(_to_table(text.unigram_surprisal(SF_DIR)))
    assert len(dist_bc) > 0 and len(surp_bc) > 0
    monkeypatch.setattr(text, "TERM_BROADCAST_MAX_TERMS", -1)
    assert _canon(_to_table(text.distinctive_terms(SF_DIR))) == dist_bc
    assert _canon(_to_table(text.unigram_surprisal(SF_DIR))) == surp_bc


def test_text_broadcast_doc_straddle_identity(ray_session):
    """The broadcast branches must NOT assume a doc's (doc,term,tf) rows
    land in one batch: Ray's BlockOutputBuffer slices map output at
    arbitrary row boundaries once a block exceeds target_max_block_size.
    Shrink the target so docs straddle blocks and assert the per-batch
    partial+fold paths still produce the exact answer (the round-3
    advisory: partial sums / duplicate ranks under straddling)."""
    import ray.data

    from probe_ray.ops import text

    base_dist = _canon(_to_table(text.distinctive_terms(SF_DIR)))
    base_surp = _canon(_to_table(text.unigram_surprisal(SF_DIR)))
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        # corpus tf rows are ~100s of KB; 16 KiB blocks guarantee many
        # docs straddle a block boundary
        ctx.target_max_block_size = 16 * 1024
        assert _canon(_to_table(text.distinctive_terms(SF_DIR))) == base_dist
        assert _canon(_to_table(text.unigram_surprisal(SF_DIR))) == base_surp
    finally:
        ctx.target_max_block_size = old


def test_ngram_jaccard_hot_token_df_cap(ray_session, tmp_path):
    """A token shared by every doc used to emit df^2/2 pairs in a Python
    double loop; df_cap skips such runs. Both the uncapped and the capped
    result must equal a brute-force intersection count with the same
    df-filter applied."""
    from collections import Counter

    import pyarrow.parquet as pq

    from probe_ray.ops import dedup

    n = 120
    texts = [f"common u{i}a u{i}b u{i}c shared{i % 4} x{i}" for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    sets = [set(t.split()) for t in texts]
    df = Counter(tok for s in sets for tok in s)

    def brute(cap):
        out = {}
        for i in range(n):
            for j in range(i + 1, n):
                inter = sum(1 for tok in sets[i] & sets[j] if df[tok] <= cap)
                if inter >= 1:
                    out[(i, j)] = inter
        return out

    def run(**kw):
        t = _to_table(
            dedup.ngram_jaccard_pairs(str(tmp_path), max_doc_id=n, min_inter=1, **kw)
        )
        return {
            (r["a_id"], r["b_id"]): r["inter_count"] for r in t.to_pylist()
        }

    assert run() == brute(dedup.NGRAM_DF_CAP)  # hot token within default cap
    assert run(df_cap=20) == brute(20)  # hot + shared tokens skipped


def test_neardup_clusters_distributed_equals_driver(ray_session, monkeypatch):
    """The distributed min-label-propagation solve (edge sets above
    DRIVER_CC_MAX_EDGES) must produce exactly the driver union-find
    table — same crossover-identity guarantee as the dictionary build."""
    from probe_ray.ops import dedup

    fast = _canon(_to_table(dedup.neardup_clusters(SF_DIR)))
    monkeypatch.setattr(dedup, "DRIVER_CC_MAX_EDGES", -1)
    dist = _canon(_to_table(dedup.neardup_clusters(SF_DIR)))
    assert fast == dist
    assert len(fast) > 0


def test_kmeans_crossover_identity(ray_session, monkeypatch):
    """The k-means driver branch (KMEANS_DRIVER_MAX_ROWS) and the
    distributed partial-sum branch must produce identical rounded
    outputs: prototype_filter (proto_milli + kept) and semantic_dedup
    rows pin both Lloyd paths output-equal. The branches differ only in
    f64 summation order; this test is the guard that the difference
    never reaches the integer outputs."""
    import pyarrow as pa

    from probe_ray.ops import ann

    def tab(x):
        return x if isinstance(x, pa.Table) else pa.table(x.to_pandas())

    fast = tab(ann.prototype_filter(SF_DIR))
    monkeypatch.setattr(ann, "KMEANS_DRIVER_MAX_ROWS", -1)
    slow = tab(ann.prototype_filter(SF_DIR))
    assert fast.equals(slow)
    assert fast.num_rows > 0


def test_q7_q11_supplier_crossover_identity(ray_session, monkeypatch):
    """Q7 and Q11's supplier-nation join: forcing the distributed
    bounded-partition branch (DICT_DRIVER_MAX_ROWS = -1) must produce
    exactly the broadcast searchsorted-array result."""
    from probe_ray.ops import relational

    q7 = _canon(_to_table(relational.volume_shipping_regions(SF_DIR)))
    q11 = _canon(_to_table(relational.important_parts_by_region(SF_DIR)))
    assert len(q7) > 0 and len(q11) > 0
    monkeypatch.setattr(relational, "DICT_DRIVER_MAX_ROWS", -1)
    assert _canon(_to_table(relational.volume_shipping_regions(SF_DIR))) == q7
    assert (
        _canon(_to_table(relational.important_parts_by_region(SF_DIR))) == q11
    )


def test_q8_q9_chained_dim_crossover_identity(ray_session, monkeypatch):
    """Q8 and Q9 chain TWO dimension lookups (part, then supplier) on
    the line side; the forced distributed branch (two
    bounded-partition joins) must reproduce the broadcast
    searchsorted result exactly."""
    from probe_ray.ops import relational

    q8 = _canon(_to_table(relational.nation_market_share(SF_DIR)))
    q9 = _canon(_to_table(relational.nation_keyword_revenue(SF_DIR)))
    assert len(q8) > 0 and len(q9) > 0
    monkeypatch.setattr(relational, "DICT_DRIVER_MAX_ROWS", -1)
    assert _canon(_to_table(relational.nation_market_share(SF_DIR))) == q8
    assert _canon(_to_table(relational.nation_keyword_revenue(SF_DIR))) == q9


def test_range_search_tau_margin():
    """ann_range_search's cross-engine hash is only stable if no actual
    similarity sits within float-rounding distance of tau: numpy and
    DuckDB both compute in f64 but with different summation orders, so a
    pair at |sim - tau| ~ 1e-15 could flip. Assert a wide margin on both
    test scale factors."""
    import numpy as np
    import pyarrow.parquet as pq

    from probe_ray.ops.ann import _list_matrix

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).sort_by([("vec_id", "ascending")])
        m = _list_matrix(t.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn[:4] @ mn.T
        assert np.abs(sims - 0.3).min() > 1e-6, sf_dir
        # the threshold must also capture real (non-self) neighbors,
        # or the range-search oracle is vacuous
        assert int((sims >= 0.3).sum()) > 4, sf_dir


def test_top_parts_brand_crossover_identity(ray_session, monkeypatch):
    """top_parts_per_brand's brand attach: the forced distributed
    bounded-partition branch must reproduce the broadcast searchsorted
    result exactly, including RANK() ties."""
    from probe_ray.ops import relational

    fast = _canon(_to_table(relational.top_parts_per_brand(SF_DIR)))
    assert len(fast) > 0
    monkeypatch.setattr(relational, "DICT_DRIVER_MAX_ROWS", -1)
    assert _canon(_to_table(relational.top_parts_per_brand(SF_DIR))) == fast


def test_quantize_grid_margin():
    """ann_int8_quantize is cross-engine exact only if no scaled value
    sits at float-rounding distance from the x.5 rounding grid (numpy
    and DuckDB order their f64 ops differently). Assert the margin on
    both test SFs."""
    import numpy as np
    import pyarrow.parquet as pq

    from probe_ray.ops.ann import _list_matrix

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["embedding"]
        )
        m = _list_matrix(t.column("embedding"))
        lo, hi = m.min(axis=0), m.max(axis=0)
        scaled = (m - lo) / (hi - lo) * 255 + 0.5
        assert np.abs(scaled - np.round(scaled)).min() > 1e-6, sf_dir


def test_quantize_constant_dim_guard(ray_session, tmp_path):
    """A dimension constant across the corpus (hi == lo) must quantize
    to q = 0 everywhere — not NaN/inf cast to garbage (ADVICE r4). The
    oracle SQL carries the same CASE guard."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from probe_ray.ops.ann import ann_int8_quantize

    rng = np.random.default_rng(7)
    n, ndim = 40, 6
    m = rng.normal(size=(n, ndim))
    m[:, 2] = 1.25  # constant dim
    m[:, 5] = 0.0   # constant-at-zero dim
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(m), pa.list_(pa.float64())),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    out = ann_int8_quantize(str(tmp_path)).to_arrow_refs()
    import ray

    t = pa.concat_tables([ray.get(r) for r in out])
    q = t.column("q").to_numpy()
    d = t.column("dim").to_numpy()
    assert t.num_rows == n * ndim
    assert (q[d == 2] == 0).all() and (q[d == 5] == 0).all()
    assert q.min() >= 0 and q.max() <= 255
