"""make_documents (curation-rehearsal corpus) contract tests."""

import pyarrow as pa

from probe_ray.data.synth import DOC_BENCH_PHRASE, make_documents


def test_position_deterministic_under_any_split():
    whole = make_documents(0, 400)
    parts = pa.concat_tables(
        [make_documents(0, 150), make_documents(150, 100),
         make_documents(250, 150)]
    )
    assert whole.equals(parts)


def test_planted_duplicates_and_benchmark_phrase():
    t = make_documents(0, 500)
    texts = t.column("text").to_pylist()
    # every 97th doc repeats the text of the doc 48 earlier
    for i in (97, 194, 291, 388, 485):
        assert texts[i] == texts[i - 48]
    # benchmark prefix docs all carry the planted 8-gram; every 211th
    # doc is contaminated with it
    phrase = " ".join(DOC_BENCH_PHRASE)
    assert all(phrase in texts[i] for i in range(32))
    assert phrase in texts[211] and phrase in texts[422]
    # and a typical doc is NOT contaminated
    assert sum(phrase in s for s in texts[32:]) < 30


def test_schema_matches_driver_documents_table():
    t = make_documents(10, 5)
    assert t.schema.names == ["doc_id", "text", "lang", "source", "n_chars"]
    assert t.column("doc_id").to_pylist() == [10, 11, 12, 13, 14]
    assert all(
        n == len(s)
        for n, s in zip(
            t.column("n_chars").to_pylist(), t.column("text").to_pylist()
        )
    )
