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
    a = stratified_sample(sf).to_pandas().sort_values("doc_id")
    b = stratified_sample(sf).to_pandas().sort_values("doc_id")
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
