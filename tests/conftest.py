import os
import shutil

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic 300-row synthetic code table, 4 parquet fragments."""
    from probe_ray.data.synth import write_corpus

    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, 300, num_files=4)
    return d


@pytest.fixture(scope="session")
def built_index(ray_session, small_corpus, tmp_path_factory):
    from probe_ray.index.build import IndexConfig, build_index

    d = str(tmp_path_factory.mktemp("index"))
    shutil.rmtree(d, ignore_errors=True)
    manifest = build_index(
        [small_corpus], d, IndexConfig(num_waves=2, subshards=2)
    )
    return d, manifest


@pytest.fixture(scope="session")
def corpus_rows(small_corpus):
    """Corpus in oracle order: sorted by (repo, path)."""
    import pyarrow.dataset as pads

    t = (
        pads.dataset(small_corpus)
        .to_table()
        .sort_by([("repo", "ascending"), ("path", "ascending")])
    )
    return t


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
