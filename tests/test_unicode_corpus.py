"""Non-ASCII corpus end-to-end: the tokenizer's ASCII fast path
(tokenizer.py:_raw_tokens) must hand unicode text to the regex fallback
with identical downstream semantics — rank identity vs the scalar oracle,
sha256 invariant, and determinism over a corpus mixing accented words,
CJK, and emoji-separated tokens."""

import hashlib
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from probe_ray.query.bm25 import rank_files
from probe_ray.tokenize.tokenizer import _raw_tokens

DOCS = [
    ("r0", "src/café.py", "def café_händler(): return naïve_café or résumé"),
    ("r0", "src/ascii.py", "def cafe_handler(): return naive_cafe"),
    ("r0", "docs/überblick.md", "Überblick über die Größe: café größer résumé"),
    ("r1", "src/中文.rs", "fn 处理错误() { handle_error(); café }"),
    ("r1", "src/emoji.go", "func main() { x := café🎉résumé; naïve }"),
    ("r1", "src/mixed.ts", "const caféClient = new CaféHandler(); // naïve"),
    ("r1", "src/plain.ts", "const client = new Handler(); // plain ascii"),
]

QUERIES = ["café", "résumé AND naïve", "handler café", "处理错误", "café -résumé"]


@pytest.fixture(scope="module")
def unicode_index(ray_session, tmp_path_factory):
    from probe_ray.index.build import IndexConfig, build_index

    cdir = tmp_path_factory.mktemp("ucorpus")
    t = pa.table(
        {
            "repo": pa.array([d[0] for d in DOCS]),
            "path": pa.array([d[1] for d in DOCS]),
            "commit": pa.array(["c0"] * len(DOCS)),
            "lang": pa.array(["xx"] * len(DOCS)),
            "content": pa.array([d[2] for d in DOCS]),
        }
    )
    pq.write_table(t, str(cdir / "part-0.parquet"))
    idir = str(tmp_path_factory.mktemp("uindex"))
    build_index([str(cdir)], idir, IndexConfig(num_waves=1, subshards=2))
    return idir


def test_raw_tokens_unicode_fallback_matches_regex():
    ref = re.compile(r"[^\W_]+", re.UNICODE)
    for _, path, content in DOCS:
        for s in (content, path, content + " -naïve x", "-café plain"):
            toks, _ = _raw_tokens(s)
            assert toks == ref.findall(s), s


@pytest.mark.parametrize("q", QUERIES)
def test_unicode_rank_identity(q, unicode_index):
    from probe_ray.search.searcher import IndexReader

    # oracle convention (conftest.corpus_rows): rows sorted by (repo, path)
    # so the scalar ranker's stable score-tie order matches the engine's
    # (score desc, repo, path) merge
    docs = sorted(DOCS, key=lambda d: (d[0], d[1]))
    rows = [(d[1], d[2]) for d in docs]
    keys = [(d[0], d[1]) for d in docs]
    oracle = [(keys[d][0], keys[d][1], s) for d, s in rank_files(rows, q)[:10]]
    rd = IndexReader(unicode_index)
    got = rd.search(q, k=10)
    g = list(
        zip(
            got.column("repo").to_pylist(),
            got.column("path").to_pylist(),
            got.column("score").to_pylist(),
        )
    )
    assert g == oracle, (q, g, oracle)


def test_unicode_sha256_invariant(unicode_index):
    import glob
    import os

    expected = {
        (d[0], d[1]): hashlib.sha256(d[2].encode()).hexdigest() for d in DOCS
    }
    seen = 0
    for f in glob.glob(
        os.path.join(unicode_index, "waves", "*", "docstats", "*.parquet")
    ):
        t = pq.read_table(f)
        for repo, path, sha in zip(
            t.column("repo").to_pylist(),
            t.column("path").to_pylist(),
            t.column("sha256").to_pylist(),
        ):
            assert expected[(repo, path)] == sha
            seen += 1
    assert seen == len(DOCS)
