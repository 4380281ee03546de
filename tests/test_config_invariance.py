"""Partitioning-config invariance: the index is a distributed layout
detail — search results (docs, order, f64 scores) must be bit-identical
whatever wave/subshard decomposition built it. This is the determinism
guarantee that makes resume/append and cluster-size changes safe."""

import pytest

QUERIES = [
    "error AND handling",
    "login OR authentication OR auth",
    "+api +process load",
    "setTools",
    '"whitelist"',
    "database -sqlite",
]


@pytest.fixture(scope="module")
def alt_index(ray_session, small_corpus, tmp_path_factory):
    """Same corpus as the shared built_index (2 waves x 2 subshards) but
    decomposed 1 wave x 5 subshards."""
    from probe_ray.index.build import IndexConfig, build_index

    d = str(tmp_path_factory.mktemp("index_alt"))
    build_index([small_corpus], d, IndexConfig(num_waves=1, subshards=5))
    return d


@pytest.mark.parametrize("q", QUERIES)
def test_results_invariant_under_partitioning(q, built_index, alt_index):
    from probe_ray.search.searcher import IndexReader

    a = IndexReader(built_index[0]).search(q, k=10)
    b = IndexReader(alt_index).search(q, k=10)
    cols = ["rank", "score", "repo", "path"]
    assert a.select(cols).equals(b.select(cols)), q


def test_stats_invariant_under_partitioning(built_index, alt_index):
    """Corpus-global BM25 inputs (doc count, total tokens => avgdl) must
    not depend on the decomposition."""
    import json
    import os

    ma = json.load(open(os.path.join(built_index[0], "manifest.json")))
    mb = json.load(open(os.path.join(alt_index, "manifest.json")))
    assert ma["n_docs"] == mb["n_docs"]
    assert ma["n_tokens"] == mb["n_tokens"]
    assert ma["avgdl"] == mb["avgdl"]
