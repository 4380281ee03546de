"""DuckDB-free oracle for term_df_topk (VERDICT r1 item 3): the
dictionary-driven top-k must equal a brute-force df count from
tokenize() over the same corpus — same terms, same dfs, same
(df desc, term asc) tie order — and be deterministic across calls."""

from collections import Counter

from probe_ray.ops.fts import term_df_topk_from_index
from probe_ray.tokenize.tokenizer import preprocess_text_with_filename

K = 25


def _brute_force_topk(corpus_rows, k):
    df: Counter = Counter()
    for path, content in zip(
        corpus_rows.column("path").to_pylist(),
        corpus_rows.column("content").to_pylist(),
    ):
        # tokenize() output is deduplicated, so one count per doc per term
        df.update(set(preprocess_text_with_filename(content, path)))
    return sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_term_df_topk_matches_brute_force(built_index, corpus_rows):
    got = term_df_topk_from_index(built_index[0], k=K)
    expected = _brute_force_topk(corpus_rows, K)
    pairs = list(
        zip(got.column("term").to_pylist(), got.column("df").to_pylist())
    )
    assert pairs == expected


def test_term_df_topk_deterministic(built_index):
    a = term_df_topk_from_index(built_index[0], k=K)
    b = term_df_topk_from_index(built_index[0], k=K)
    assert a.equals(b)
