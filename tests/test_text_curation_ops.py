"""Round-3 curation ops (ops/text.py): Gopher repetition stats,
deterministic stratified sampling, cross-doc shared-n-gram counts.

Each op is checked two ways: the sf0.001 DuckDB oracle comparison lives in
test_ops_oracle.py; here a synthetic edge corpus (empty doc, whitespace-only
doc, single word, heavy within-doc repetition, a 4-gram shared verbatim by
three docs) is run through BOTH the Ray op and the op's own oracle SQL over
the same parquet, so the edge semantics are pinned engine-to-engine."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod
from probe_ray.ops.text import (
    repetition_stats,
    shared_ngram_counts,
    stratified_sample,
)

SHARED = "the quick brown fox jumps over the lazy dog"

DOCS = [
    (0, "", "en", "web"),
    (1, "   \t  ", "en", "web"),
    (2, "solo", "de", "web"),
    (3, "spam spam spam spam spam ham", "en", "web"),
    (4, f"intro {SHARED} outro", "fr", "books"),
    (5, f"{SHARED} and then {SHARED}", "es", "books"),
    (6, f"prefix words {SHARED}", "zh", "web"),
    (7, "totally unique sentence with no overlap here", "xx", "web"),
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("curation_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in DOCS], pa.int64()),
            "text": pa.array([r[1] for r in DOCS]),
            "lang": pa.array([r[2] for r in DOCS]),
            "source": pa.array([r[3] for r in DOCS]),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return str(d)


def oracle(corpus_dir: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{corpus_dir}/documents.parquet')"
    )
    return con.execute(entrymod.oracle_sql()[name]).df()


def compare(got_ds, want: pd.DataFrame):
    got = got_ds.to_pandas()
    got = got[sorted(got.columns)].sort_values(sorted(got.columns))
    want = want[sorted(want.columns)].sort_values(sorted(want.columns))
    assert list(got.columns) == list(want.columns)
    assert got.reset_index(drop=True).astype(str).equals(
        want.reset_index(drop=True).astype(str)
    ), f"\ngot:\n{got}\nwant:\n{want}"


def test_repetition_stats_edges(ray_session, corpus_dir):
    compare(
        repetition_stats(corpus_dir),
        oracle(corpus_dir, "text_repetition_stats"),
    )


def test_repetition_stats_values(ray_session, corpus_dir):
    rows = {r["doc_id"]: r for r in repetition_stats(corpus_dir).take_all()}
    # empty / whitespace docs split to [''] in both engines
    assert rows[0] == {
        "doc_id": 0, "n_words": 1, "n_uniq_words": 1,
        "n_bigrams": 0, "top_bigram_n": 0,
    }
    assert rows[3]["n_words"] == 6
    assert rows[3]["n_uniq_words"] == 2
    assert rows[3]["top_bigram_n"] == 4  # "spam spam" x4
    assert rows[5]["top_bigram_n"] == 2  # every SHARED bigram twice


def test_stratified_sample_edges(ray_session, corpus_dir):
    compare(
        stratified_sample(corpus_dir),
        oracle(corpus_dir, "text_stratified_sample"),
    )


def test_stratified_sample_deterministic_and_rate(ray_session):
    sf = "/root/testdata/sf0.001"
    a = (
        stratified_sample(sf).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)  # block arrival order is not stable
    )
    b = (
        stratified_sample(sf).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # unknown langs are dropped entirely
    assert set(a["lang"]) <= {"en", "de", "fr", "es", "zh"}


def test_shared_ngram_counts_edges(ray_session, corpus_dir):
    compare(
        shared_ngram_counts(corpus_dir),
        oracle(corpus_dir, "text_shared_ngram_counts"),
    )


def test_shared_ngram_counts_values(ray_session, corpus_dir):
    rows = {
        r["doc_id"]: r for r in shared_ngram_counts(corpus_dir).take_all()
    }
    assert len(rows) == len(DOCS)  # every doc present, even gram-less ones
    assert rows[0]["n_grams"] == 0 and rows[0]["n_shared"] == 0
    assert rows[7]["n_shared"] == 0  # unique doc shares nothing
    # doc 4: 11 words -> 8 grams; the 6 grams fully inside SHARED are
    # shared with docs 5 and 6
    assert rows[4]["n_grams"] == 8
    assert rows[4]["n_shared"] == 6
    # doc 5 contains SHARED twice -> each shared gram counted per occurrence
    assert rows[5]["n_shared"] >= 12


PII_DOCS = [
    (0, "contact me at alice.smith+work@example.co.uk or 10.0.0.1", "en", "web"),
    (1, "call 555-123-4567 x2 or mail bob@host.io; server 192.168.001.250 up", "en", "web"),
    (2, "no pii here at all", "en", "web"),
    (3, "a@b.cc a@b.cc 1.2.3.4 999-999-9999", "en", "web"),
    (4, "", "en", "web"),
]


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pii_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in PII_DOCS], pa.int64()),
            "text": pa.array([r[1] for r in PII_DOCS]),
            "lang": pa.array([r[2] for r in PII_DOCS]),
            "source": pa.array([r[3] for r in PII_DOCS]),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return str(d)


def test_pii_scrub_oracle_parity(ray_session, pii_dir):
    from probe_ray.ops.text import pii_scrub

    compare(pii_scrub(pii_dir), oracle(pii_dir, "text_pii_scrub"))


def test_pii_scrub_values(ray_session, pii_dir):
    from probe_ray.ops.text import pii_scrub

    rows = {r["doc_id"]: r for r in pii_scrub(pii_dir).take_all()}
    assert rows[0]["n_email"] == 1 and rows[0]["n_ipv4"] == 1
    assert rows[1]["n_phone"] == 1 and rows[1]["n_email"] == 1
    assert rows[1]["n_ipv4"] == 1
    assert rows[2] == {
        "doc_id": 2, "n_email": 0, "n_ipv4": 0, "n_phone": 0,
        "clean_text": "no pii here at all",
    }
    assert rows[3]["n_email"] == 2 and rows[3]["n_phone"] == 1
    assert "<EMAIL>" in rows[0]["clean_text"]
    assert "alice" not in rows[0]["clean_text"]
    assert "<IP>" in rows[0]["clean_text"]
    assert "<PHONE>" in rows[1]["clean_text"]


def test_group_sample_oracle_parity(ray_session, corpus_dir):
    from probe_ray.ops.text import group_sample

    compare(group_sample(corpus_dir), oracle(corpus_dir, "text_group_sample"))


def test_group_sample_k_bound(ray_session):
    from probe_ray.ops.text import group_sample

    sf = "/root/testdata/sf0.001"
    df = group_sample(sf, k=3).to_pandas()
    assert (df.groupby("source").size() <= 3).all()
    assert set(df["sample_rank"]) <= {1, 2, 3}
    again = group_sample(sf, k=3).to_pandas()
    assert df.reset_index(drop=True).equals(again.reset_index(drop=True))


def test_events_json_kpis_fallback(ray_session, tmp_path):
    """props that DON'T match the fast regex (extra keys, spacing) must go
    through the json.loads fallback and still aggregate correctly."""
    from probe_ray.ops.relational import events_json_kpis

    props = ['{"k": 5}', '{ "k" : 7 }', '{"other": 1, "k": -2}', '{"k": 0}']
    tbl = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array([0] * 4, pa.timestamp("us")),
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_type": pa.array(["a", "a", "b", "b"]),
            "value": pa.array([0.0] * 4),
            "props": pa.array(props),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    rows = {
        r["event_type"]: r
        for r in events_json_kpis(str(tmp_path)).take_all()
    }
    assert rows["a"] == {"event_type": "a", "n_events": 2, "sum_k": 12, "max_k": 7}
    assert rows["b"] == {"event_type": "b", "n_events": 2, "sum_k": -2, "max_k": 0}


def test_dedup_spans_matches_scalar_reference(ray_session):
    """Duplicate-span removal: distributed result (broadcast path) must
    exactly equal a scalar corpus-wide reference of the same rule (a
    word is cut iff covered by an n-gram present in >= 2 docs), and the
    forced exchange path must be identical to the broadcast path."""
    import hashlib
    from collections import defaultdict

    import numpy as np

    from probe_ray.ops import text as textmod

    SF = "/root/testdata/sf0.001"

    def coll(ds):
        return pa.concat_tables(
            pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
        )

    t = coll(textmod.dedup_spans(SF))

    N = textmod.DEDUP_SPAN_N
    prime = 1099511628211
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    def words_of(s):
        s2 = s.strip()
        return s2.split() if s2 else [""]

    def wh(w):
        return int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
        )

    gram_docs: dict[int, set] = defaultdict(set)
    W = {}
    for did, tx in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        ws = words_of(tx)
        W[did] = ws
        hs = [wh(w) for w in ws]
        for i in range(len(ws) - N + 1):
            g = 0
            for k in range(N):
                g = (g * prime + hs[i + k]) % (1 << 64)
            gram_docs[g & ((1 << 63) - 1)].add(did)
    shared = {g for g, ds_ in gram_docs.items() if len(ds_) >= 2}
    rows = []
    for did in sorted(W):
        ws = W[did]
        hs = [wh(w) for w in ws]
        cov = [False] * len(ws)
        for i in range(len(ws) - N + 1):
            g = 0
            for k in range(N):
                g = (g * prime + hs[i + k]) % (1 << 64)
            if (g & ((1 << 63) - 1)) in shared:
                for j in range(i, i + N):
                    cov[j] = True
        kept = [w for w, c in zip(ws, cov) if not c]
        spans = sum(
            1 for i, c in enumerate(cov) if c and (i == 0 or not cov[i - 1])
        )
        rows.append((did, len(ws), sum(cov), spans, " ".join(kept)))
    ref = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "n_words": pa.array([r[1] for r in rows], pa.int64()),
            "n_dup_words": pa.array([r[2] for r in rows], pa.int64()),
            "n_spans": pa.array([r[3] for r in rows], pa.int64()),
            "clean_text": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    assert t.cast(ref.schema).equals(ref)
    assert int(np.asarray(t.column("n_dup_words")).sum()) > 0  # non-vacuous

    orig = textmod.SPAN_BROADCAST_MAX_GRAMS
    try:
        textmod.SPAN_BROADCAST_MAX_GRAMS = -1
        t2 = coll(textmod.dedup_spans(SF))
    finally:
        textmod.SPAN_BROADCAST_MAX_GRAMS = orig
    assert t.equals(t2)


def test_dsir_weights_edges_and_absent_target(ray_session, tmp_path):
    """DSIR importance weights: empty/one-word docs are omitted (no
    bigrams); an absent target language clamps every gram to c_t=1 /
    T_t=1 so weight_bits = sum tf * (s_raw - 1); engine-to-oracle pin on
    the synthetic edge corpus."""
    from probe_ray.ops.text import dsir_importance_weights

    docs = [
        (0, "", "en", "web"),
        (1, "solo", "en", "web"),
        (2, "a b a b a b", "en", "web"),
        (3, "a b c d", "de", "web"),
        (4, "x y x y", "de", "web"),
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array([r[2] for r in docs], pa.string()),
                "source": pa.array([r[3] for r in docs], pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in docs], pa.int64()
                ),
            }
        ),
        f"{d}/documents.parquet",
    )
    t = dsir_importance_weights(d)
    t = t if isinstance(t, pa.Table) else pa.table(t.to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    ref = con.execute(entrymod.oracle_sql()["text_dsir_weights"]).arrow()
    assert t.cast(ref.schema).equals(ref)
    # docs 0 (empty) and 1 (one word) have no bigrams -> omitted
    assert t.column("doc_id").to_pylist() == [2, 3, 4]
    # target slice = en: doc 2's grams are all in-target, weights skew
    # positive vs the out-of-target docs
    w = dict(
        zip(t.column("doc_id").to_pylist(), t.column("weight_bits").to_pylist())
    )
    assert w[2] > w[3]

    # absent target language: every gram clamps to c_t = 1, T_t = 1
    t2 = dsir_importance_weights(d, target_lang="zz")
    t2 = t2 if isinstance(t2, pa.Table) else pa.table(t2.to_pandas())
    import numpy as np

    # scalar recompute of the clamp form
    import re as _re
    from collections import Counter

    craw = Counter()
    per_doc = {}
    for did, tx, lang, _ in docs:
        ws = _re.split(r"\s+", tx.strip()) if tx.strip() else [""]
        tf = Counter(
            ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)
        )
        if tf:
            per_doc[did] = tf
            for g, c in tf.items():
                craw[g] += c
    T = sum(craw.values())
    exp = {
        did: sum(
            c * ((T // craw[g]).bit_length() - 1) for g, c in tf.items()
        )
        for did, tf in per_doc.items()
    }
    got = dict(
        zip(
            t2.column("doc_id").to_pylist(),
            t2.column("weight_bits").to_pylist(),
        )
    )
    assert got == exp
