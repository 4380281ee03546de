"""Hot-term skew: the north rule calls out terms like 'return'/'fn' that
appear in nearly every document. The build shuffles on doc-hash subshard,
never on term, so a corpus-wide term spreads across every partition
instead of melting one reducer; queries on it must still be
rank-identical to the scalar oracle."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

N_DOCS = 120
SUBSHARDS = 4
HOT = "megacommon"


@pytest.fixture(scope="module")
def skew_index(ray_session, tmp_path_factory):
    from probe_ray.index.build import IndexConfig, build_index

    cdir = tmp_path_factory.mktemp("skewcorpus")
    docs = []
    for i in range(N_DOCS):
        # every doc contains the hot term; a rarer term in 1/6 of docs
        rare = f"rareterm{i % 6}" if i % 6 == 0 else "filler"
        docs.append(
            (
                f"r{i % 3}",
                f"src/f{i:04d}.py",
                f"def handler_{i}(): {HOT} {rare} value_{i}",
            )
        )
    t = pa.table(
        {
            "repo": pa.array([d[0] for d in docs]),
            "path": pa.array([d[1] for d in docs]),
            "commit": pa.array(["c"] * N_DOCS),
            "lang": pa.array(["py"] * N_DOCS),
            "content": pa.array([d[2] for d in docs]),
        }
    )
    pq.write_table(t, str(cdir / "part-0.parquet"))
    idir = str(tmp_path_factory.mktemp("skewindex"))
    build_index(
        [str(cdir)], idir, IndexConfig(num_waves=1, subshards=SUBSHARDS)
    )
    return idir, docs


def test_hot_term_spread_across_subshards(skew_index):
    """The hot term's postings live in EVERY subshard, each bounded by
    that subshard's doc count — no single-reducer hot spot."""
    idir, docs = skew_index
    from probe_ray.index.build import doc_hash64

    expected_per_sub = {}
    for repo, path, _ in docs:
        s = (doc_hash64(repo, path) >> 32) % SUBSHARDS
        expected_per_sub[s] = expected_per_sub.get(s, 0) + 1
    seen = {}
    for f in glob.glob(os.path.join(idir, "waves", "*", "postings", "*.parquet")):
        t = pq.read_table(f, columns=["subshard", "term", "df"])
        for sub, term, df in zip(
            t.column("subshard").to_pylist(),
            t.column("term").to_pylist(),
            t.column("df").to_pylist(),
        ):
            if term == HOT:
                seen[sub] = seen.get(sub, 0) + df
    # present in every subshard, each equal to that subshard's doc count
    assert seen == expected_per_sub
    assert len(seen) == SUBSHARDS


def test_hot_term_query_rank_identity(skew_index):
    from probe_ray.query.bm25 import rank_files
    from probe_ray.search.searcher import IndexReader

    idir, docs = skew_index
    sdocs = sorted(docs, key=lambda d: (d[0], d[1]))
    rows = [(d[1], d[2]) for d in sdocs]
    keys = [(d[0], d[1]) for d in sdocs]
    for q in (HOT, f"{HOT} AND rareterm0", f"rareterm0 -{HOT}"):
        oracle = [
            (keys[d][0], keys[d][1], s) for d, s in rank_files(rows, q)[:10]
        ]
        got = IndexReader(idir).search(q, k=10)
        g = list(
            zip(
                got.column("repo").to_pylist(),
                got.column("path").to_pylist(),
                got.column("score").to_pylist(),
            )
        )
        assert g == oracle, q
