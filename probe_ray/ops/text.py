"""Text-analysis operators over the ``documents`` table (training-data
pipeline components; all streaming map_batches, no driver-side loops).

Integer-valued outputs wherever an operator is oracle-checked via DuckDB
(float hashing across engines is not stable)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from probe_ray.ops.sizing import (
    disc_quantile_from_hist,
    shuffle_parts,
    table_rows,
)
from probe_ray.ops.topk import dataset_topk

_WS = re.compile(r"\s+")
_ALPHA = re.compile(r"[A-Za-z]")
_DIGIT = re.compile(r"[0-9]")
# BPE-ish token pieces: words, numbers, single punctuation
_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

# tiny per-language stopword profiles for the n-gram/stopword language
# heuristic (documents are synthetic English-ish; profile list kept small)
_LANG_PROFILES = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "for", "on", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "un", "una", "en", "que"},
}


def _read_documents(sf_dir: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_count(sf_dir: str):
    """Whitespace token count per document (doc_id, n_tokens). Vectorized:
    Arrow utf8_split_whitespace + list lengths (unicode-whitespace
    semantics identical to the Python re \\s splitter it replaced;
    empty/whitespace-only docs count 0)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch.column("text"))
        n = pc.if_else(
            pc.equal(trimmed, ""),
            pa.scalar(0, pa.int64()),
            pc.list_value_length(pc.utf8_split_whitespace(trimmed)).cast(
                pa.int64()
            ),
        )
        return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": n})

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def token_count_bpeish(sf_dir: str):
    """Sub-word-ish token count (regex BPE approximation): (doc_id,
    n_pieces). One vectorized RE2 count per batch — the pattern's three
    alternatives are disjoint character classes, so leftmost-match counts
    equal the Python findall it replaced."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            batch.column("text"), _BPEISH.pattern
        ).cast(pa.int64())
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_pieces": n}
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


STOPWORD_PATTERN = r"\b(a|the|and|of|to)\b"


def normalize_stopwords(sf_dir: str):
    """Pre-dedup text normalization: strip a tiny stop-word set, collapse
    whitespace, trim — (doc_id, norm_text, n_words). Fully vectorized:
    Arrow's replace_substring_regex is RE2, the same engine DuckDB uses,
    so the oracle parity is exact by construction."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        norm = pc.replace_substring_regex(t, STOPWORD_PATTERN, "")
        norm = pc.replace_substring_regex(norm, r"\s+", " ")
        norm = pc.utf8_trim_whitespace(norm)
        n = pc.if_else(
            pc.equal(norm, ""),
            pa.scalar(0, pa.int64()),
            pc.add(
                pc.cast(
                    pc.count_substring(norm, " "), pa.int64()
                ),
                1,
            ),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "norm_text": norm,
                "n_words": n,
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _stats_arrays(batch: pa.Table):
    """Vectorized per-doc counts shared by text_stats and quality_score:
    (n_chars, alpha, digit, n_tokens, uniq_tokens) as int64 numpy arrays.
    Char-class counts via RE2 kernels; distinct-token counts via one
    dictionary encode + lexsort run-length pass (no per-row set())."""
    import pyarrow.compute as pc

    text = batch.column("text").combine_chunks()
    n_chars = pc.utf8_length(text).to_numpy().astype(np.int64)
    alpha = (
        pc.count_substring_regex(text, "[A-Za-z]").to_numpy().astype(np.int64)
    )
    digit = (
        pc.count_substring_regex(text, "[0-9]").to_numpy().astype(np.int64)
    )
    n_docs, n_words, doc_idx, codes, _ = _split_words(batch)
    uniq = np.zeros(n_docs, np.int64)
    if codes.size:
        order = np.lexsort((codes, doc_idx))
        d, c = doc_idx[order], codes[order]
        new = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
        uniq = np.bincount(d[new], minlength=n_docs).astype(np.int64)
    # empty / whitespace-only docs split to [''] — report 0 tokens
    empty = pc.equal(
        pc.utf8_trim_whitespace(text), ""
    ).to_numpy(zero_copy_only=False)
    n_tokens = np.where(empty, 0, n_words)
    uniq = np.where(empty, 0, uniq)
    return n_chars, alpha, digit, n_tokens, uniq


def text_stats(sf_dir: str):
    """(doc_id, n_chars_actual, alpha_chars, digit_chars, n_tokens,
    uniq_tokens) — quality-scoring raw counts, all integers, fully
    vectorized (see _stats_arrays)."""

    def fn(batch: pa.Table) -> pa.Table:
        n_chars, alpha, digit, n_tokens, uniq = _stats_arrays(batch)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_actual": pa.array(n_chars),
                "alpha_chars": pa.array(alpha),
                "digit_chars": pa.array(digit),
                "n_tokens": pa.array(n_tokens),
                "uniq_tokens": pa.array(uniq),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def quality_score(sf_dir: str):
    """Heuristic quality score per doc (doc_id, score milli-units int):
    rewards unique-token ratio and alpha ratio, penalizes very short docs."""

    def fn(batch: pa.Table) -> pa.Table:
        n_chars, alpha, _, n, uniq = _stats_arrays(batch)
        # identical IEEE-double expression order to the SQL oracle;
        # floor(x+0.5), not round(): banker's rounding would diverge on .5
        ratio_u = np.divide(uniq, n, out=np.zeros(len(n)), where=n > 0)
        ratio_a = np.divide(
            alpha, n_chars, out=np.zeros(len(n)), where=n_chars > 0
        )
        length_ok = np.where(n >= 20, 1.0, n / 20.0)
        score = 1000 * (0.4 * ratio_u + 0.4 * ratio_a + 0.2 * length_ok)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "quality_milli": pa.array(
                    np.floor(score + 0.5).astype(np.int64)
                ),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def lang_id(sf_dir: str):
    """Stop-word-profile language guess (doc_id, lang_guess). Vectorized:
    profile membership is resolved once per batch-distinct word (the
    dictionary), then per-doc distinct hits come from one (doc, code)
    dedup + bincount per profile — no per-doc Python set work. Only the
    first 200 words of each doc vote, like the scalar loop it replaced."""
    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _lang_id_batch, batch_format="pyarrow"
    )


def _lang_id_batch(batch: pa.Table) -> pa.Table:
    n_docs, _, doc_idx, codes, words = _split_words(batch)
    langs = list(_LANG_PROFILES)
    hits = np.zeros((len(langs), n_docs), np.int64)
    if codes.size:
        # position of each word within its doc; only the first 200 vote
        starts = np.flatnonzero(
            np.r_[True, doc_idx[1:] != doc_idx[:-1]]
        )
        pos = np.arange(codes.size, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, codes.size])
        )
        # fold case BEFORE deduplication ("The" and "the" are one
        # distinct token, as in the scalar set() it replaced)
        lower = np.array(
            [w.lower() for w in words.to_pylist()], dtype=object
        )
        uniq_lower, lowcode_of = np.unique(lower, return_inverse=True)
        sel = pos < 200
        d, c = doc_idx[sel], lowcode_of[codes[sel]]
        order = np.lexsort((c, d))
        d, c = d[order], c[order]
        first = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
        d, c = d[first], c[first]
        for li, lang in enumerate(langs):
            prof = _LANG_PROFILES[lang]
            member = np.fromiter(
                (w in prof for w in uniq_lower),
                dtype=bool,
                count=len(uniq_lower),
            )
            hits[li] = np.bincount(
                d, weights=member[c], minlength=n_docs
            ).astype(np.int64)
    best_i = np.argmax(hits, axis=0)  # first max wins, like the loop
    best_n = hits[best_i, np.arange(n_docs)]
    names = np.array(langs + ["unknown"])
    out = names[np.where(best_n > 0, best_i, len(langs))]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_guess": pa.array(out.tolist(), pa.string()),
        }
    )

# character-trigram profiles (top trigrams of each language's common
# function words) for the n-gram language heuristic
_NGRAM_PROFILES = {
    "en": ["the", "ing", "and", " th", "he ", "ion", " of", "of ", "nd ", "ed "],
    "de": ["der", "ein", "ich", "sch", "die", "und", "en ", "er ", "ch ", "nd "],
    "fr": ["les", "ent", "de ", "es ", " de", "ion", "que", " le", "la ", "et "],
    "es": ["de ", " de", "los", "ión", "ent", "es ", "la ", " la", "el ", " el"],
}


def lang_id_ngram(sf_dir: str):
    """Character-trigram language heuristic (the classic n-gram profile
    method, cf. Cavnar & Trenkle 1994): score = count of profile trigrams
    present, weighted by rank; ties broken by profile order.
    (doc_id, lang_guess). Deterministic; rows-only driver check."""
    profiles = [
        (lang, {g: len(grams) - i for i, g in enumerate(grams)})
        for lang, grams in _NGRAM_PROFILES.items()
    ]

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        low = pc.utf8_slice_codeunits(
            pc.utf8_lower(batch.column("text").combine_chunks()), 0, 2000
        )
        n = len(low)
        # presence of each profile trigram = one vectorized substring
        # count per gram (40 kernels/batch replaces the per-doc Python
        # trigram-set build)
        scores = np.zeros((len(profiles), n), np.int64)
        for li, (_, prof) in enumerate(profiles):
            for g, w in prof.items():
                present = (
                    pc.count_substring(low, g)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                scores[li] += w * (present > 0)
        best_i = np.argmax(scores, axis=0)  # first max wins, like the loop
        best_s = scores[best_i, np.arange(n)]
        names = np.array([lang for lang, _ in profiles] + ["unknown"])
        out = names[np.where(best_s > 0, best_i, len(profiles))]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_guess": pa.array(out.tolist(), pa.string()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def fingerprint(sf_dir: str):
    """64-bit rolling-hash document fingerprint (doc_id, fp)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = []
        mask = (1 << 64) - 1
        for t in texts:
            # FNV-1 over the first 4 KB; Python-int arithmetic (masked to
            # 64 bits) is ~8x faster than np.uint64 scalar ops and wraps
            # identically, so fingerprints are unchanged
            h = 1469598103934665603
            for b in t.encode()[:4096]:
                h = ((h ^ b) * 1099511628211) & mask
            fps.append(h & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp": pa.array(fps, pa.int64()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def train_val_split(sf_dir: str, val_threshold: str = "e6"):
    """Deterministic content-hash train/val split: (doc_id, split).

    Hash-based membership is the standard 100-TB-scale split: it depends
    only on the content bytes (md5), never on row order, partitioning or
    rerun timing, so reshards and resumed jobs assign every doc the same
    way. Docs whose md5(text) hex prefix >= ``val_threshold`` go to
    'val' ('e6' => 26/256 ~ 10.2%). Pure streaming map_batches, two
    columns read, no shuffle."""
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        split = [
            "val"
            if hashlib.md5(t.encode("utf-8")).hexdigest()[:2] >= val_threshold
            else "train"
            for t in texts
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pa.array(split, pa.string()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _word_hash_dict(words) -> np.ndarray:
    """blake2b-8 hash per DISTINCT word (uint64) — the word identity all
    gram ops share."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
            )
            for w in words.to_pylist()
        ),
        dtype=np.uint64,
        count=len(words),
    )


def _rolling_gram_hashes(
    doc_idx: np.ndarray, wh: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """63-bit gram identity per n-word window that stays within one doc:
    (window_doc_idx, gh, window_start_word_index). THE single definition of the gram hash (FNV
    prime polynomial over word hashes, masked to 63 bits) — every gram
    op (decontaminate / curated_pack / shared_ngram_counts / dedup_spans
    pair emission AND rewrite) must agree bit-for-bit on it for their
    cross-op membership guarantees to hold."""
    m = wh.size - n + 1
    if m <= 0:
        z = np.array([], np.int64)
        return z, z, z
    valid = doc_idx[:m] == doc_idx[n - 1 :]
    gh = np.zeros(m, np.uint64)
    prime = np.uint64(1099511628211)
    for k in range(n):
        gh = gh * prime + wh[k : m + k]
    starts = np.flatnonzero(valid)
    return (
        doc_idx[starts],
        (gh[valid] & np.uint64((1 << 63) - 1)).astype(np.int64),
        starts,
    )


def _space_gram_hashes(texts, n: int):
    """Per-window 63-bit gram identities for space-split word n-grams
    (str.split(' ') semantics, including empty words from runs of
    spaces): (doc_idx_per_window, gh_per_window). Gram identity is a
    polynomial over per-distinct-word blake2b hashes — consistent across
    callers, so set membership matches exact string-gram membership up
    to a ~windows^2/2^63 collision probability (the repo's standard
    hashed-gram identity budget). Fully vectorized: one split, one
    dictionary encode, blake2b only over DISTINCT words, one rolling
    combine."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(texts, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy()
    n_words = np.diff(offsets).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_words)
    enc = pc.dictionary_encode(lists.flatten())
    codes = enc.indices.to_numpy().astype(np.int64)
    if codes.size < n:
        return np.array([], np.int64), np.array([], np.int64)
    wh = _word_hash_dict(enc.dictionary)[codes]
    widx, gh, _ = _rolling_gram_hashes(doc_idx, wh, n)
    return widx, gh


def decontaminate(sf_dir: str, bench_max_id: int = 32, n: int = 8):
    """Benchmark n-gram decontamination: flag corpus docs that share any
    whitespace word ``n``-gram with the benchmark set (docs with
    doc_id < ``bench_max_id`` stand in for an eval set). Output
    (doc_id, contaminated) for every non-benchmark doc.

    Scale shape: the benchmark side is small by definition (eval sets
    are KBs-MBs; the corpus is the 100-TB side), so its n-gram set is
    built from one pushdown-filtered read, unioned on the driver, and
    broadcast ONCE via ray.put; the corpus pass is a streaming
    map_batches membership check. No shuffle anywhere."""
    import pyarrow.dataset as pads
    import ray
    import ray.data

    bench_col = (
        pads.dataset(f"{sf_dir}/documents.parquet")
        .to_table(columns=["text"], filter=pads.field("doc_id") < bench_max_id)
        .column("text")
    )
    _, bgh = _space_gram_hashes(bench_col, n)
    bench_ref = ray.put(np.unique(bgh))

    def fn(batch: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)
        widx, gh = _space_gram_hashes(batch.column("text"), n)
        flags = np.zeros(batch.num_rows, dtype=np.int32)
        if gh.size and b.size:
            hit = np.isin(gh, b, kind="sort")
            flags[np.unique(widx[hit])] = 1
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "contaminated": pa.array(flags, pa.int32()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") >= bench_max_id,
    )
    return ds.map_batches(fn, batch_format="pyarrow")


def _batch_ngram_counts(batch: pa.Table, n: int) -> tuple:
    """Vectorized per-batch n-gram counting: (ngram strings, counts),
    one row per distinct n-gram in the batch.

    Split on single spaces (parity with the scalar ``t.split(" ")``
    semantics), dictionary-encode the flattened word stream, form
    within-doc sliding windows over the int codes, and pair-encode the
    window columns into one dense int64 key per n-gram — np.unique on
    ints replaces the Python Counter over ~50 joined strings per doc.
    N-gram strings are rebuilt only for the batch-distinct survivors."""
    import pyarrow.compute as pc

    lists = pc.split_pattern(batch.column("text"), " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    words = lists.flatten()
    offs = lists.offsets.to_numpy().astype(np.int64)
    enc = words.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    m = codes.size - n + 1
    if m <= 0:
        return pa.array([], pa.string()), np.array([], np.int64)
    # window start i is valid iff i+n-1 stays inside i's document:
    # invalidate the n-1 starts preceding each doc boundary
    valid = np.ones(m, dtype=bool)
    for b in offs[1:-1]:
        valid[max(b - n + 1, 0) : min(b, m)] = False
    starts = np.flatnonzero(valid)
    # iterative pair-encoding keeps keys dense (no V**n overflow)
    key = codes[starts]
    cols = [codes[starts]]
    for j in range(1, n):
        nxt = codes[starts + j]
        cols.append(nxt)
        uniq, key = np.unique(key * (codes.max() + 1) + nxt, return_inverse=True)
    uk, first, cnt = np.unique(key, return_index=True, return_counts=True)
    d = enc.dictionary
    parts = [d.take(pa.array(c[first])) for c in cols]
    gram = parts[0]
    for p in parts[1:]:
        gram = pc.binary_join_element_wise(gram, p, " ")
    return gram, cnt.astype(np.int64)


def ngram_topk(sf_dir: str, n: int = 2, k: int = 20):
    """Top-k most frequent whitespace word n-grams corpus-wide:
    (ngram, cnt), cnt desc then ngram asc.

    Map-side partial aggregation (vectorized distinct-count per batch,
    see _batch_ngram_counts) runs before the single exchange. The
    exchange key is crc32(ngram) mod parts — an int64, so the shuffle
    never sorts n-gram strings, and hash-routing puts every occurrence
    of an n-gram in one group. Each group fully aggregates (dictionary
    codes + bincount; crc collisions only share a group, never merge
    counts) and emits ONLY its local (cnt desc, ngram asc) top-k, which
    is globally sufficient — the driver merge sees parts*k rows total.
    2M-doc rehearsal: 160 s -> see BASELINE.md (Counter loop + string
    groupby replaced)."""
    import zlib

    n_parts = shuffle_parts(table_rows(sf_dir, "documents") * 512)

    def partial(batch: pa.Table) -> pa.Table:
        gram, cnt = _batch_ngram_counts(batch, n)
        h = np.fromiter(
            (zlib.crc32(g) for g in gram.cast(pa.binary()).to_pylist()),
            dtype=np.int64,
            count=len(gram),
        )
        return pa.table(
            {
                "ngram": gram,
                "cnt": pa.array(cnt),
                "part": pa.array(h % n_parts),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        g = group.column("ngram")
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        tot = np.bincount(
            codes, weights=group.column("cnt").to_numpy()
        ).astype(np.int64)
        grams = enc.dictionary
        if len(tot) > k:
            # exact local top-k under (cnt desc, ngram asc): candidates =
            # every code whose cnt >= k-th largest, tie-broken lexically
            kth = np.partition(tot, len(tot) - k)[len(tot) - k]
            cand = np.flatnonzero(tot >= kth)
            import pyarrow.compute as pc

            order = pc.sort_indices(
                pa.table(
                    {"c": pa.array(-tot[cand]), "g": grams.take(pa.array(cand))}
                ),
                sort_keys=[("c", "ascending"), ("g", "ascending")],
            ).to_numpy()[:k]
            cand = cand[order]
        else:
            cand = np.arange(len(tot))
        return pa.table(
            {
                "ngram": grams.take(pa.array(cand)),
                "cnt": pa.array(tot[cand]),
            }
        )

    agg = (
        _read_documents(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(n_parts)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )
    return dataset_topk(
        agg, [("cnt", "descending"), ("ngram", "ascending")], k
    )


def curation_pipeline(
    sf_dir: str, min_quality_milli: int = 600, lang: str = "en"
):
    """Composite CURATION chain as ONE streaming pipeline — the shape a
    training-data run takes: per-batch quality scoring + language filter
    + content hashing fused into a single map_batches pass (one read,
    narrow intermediate rows), then exact-dedup keep-first via a single
    groupby(sha). Returns surviving (doc_id,) sorted ascending."""
    import hashlib

    from ray.data.aggregate import Min

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_chars, alpha, _, n, uniq = _stats_arrays(batch)
        ratio_u = np.divide(uniq, n, out=np.zeros(len(n)), where=n > 0)
        ratio_a = np.divide(
            alpha, n_chars, out=np.zeros(len(n)), where=n_chars > 0
        )
        length_ok = np.where(n >= 20, 1.0, n / 20.0)
        q = np.floor(
            1000 * (0.4 * ratio_u + 0.4 * ratio_a + 0.2 * length_ok) + 0.5
        )
        keep = (q >= min_quality_milli) & pc.equal(
            batch.column("lang"), lang
        ).to_numpy(zero_copy_only=False)
        kept = batch.filter(pa.array(keep))
        # sha256 only over the survivors (no Arrow kernel exists for it)
        shas = [
            hashlib.sha256(t.encode()).hexdigest()
            for t in kept.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "sha": pa.array(shas, pa.string()),
            }
        )

    agg = (
        _read_documents(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(fn, batch_format="pyarrow")
        # surviving rows are 72 B each; coalesce before the dedup shuffle
        .repartition(shuffle_parts(table_rows(sf_dir, "documents") * 96))
        .groupby("sha")
        .aggregate(Min("doc_id"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("min(doc_id)")})

    return agg.map_batches(rename, batch_format="pyarrow").sort("doc_id")


# --------------------------------------------------------------------------
# Heavy hitters: Misra-Gries summaries per batch (mergeable-sketch family,
# Agarwal et al. 2012) screen candidates in one bounded shuffle, then an
# exact recount of only the candidate set makes the final counts EXACT —
# no full-vocabulary aggregation ever happens, so the wide state is
# O(batches x k) summary rows and the driver holds <= ~2/phi candidates.


def heavy_hitters(sf_dir: str, phi: float = 0.001):
    """Exact whitespace-token heavy hitters: every token whose corpus
    frequency is >= ceil(phi * total_tokens), as (token, cnt) sorted by
    (cnt desc, token asc). Three streaming passes:
      1. narrow token-count pass -> total n (no shuffle);
      2. per-batch Misra-Gries summaries (k = 4/phi counters; compressing
         by the (k+1)-th count keeps the summary error <= batch_n/(k+1))
         -> groupby(token).sum -> distributed screen at
         cut = threshold - n//(k+1), which cannot drop a true heavy
         hitter (sum of per-batch underestimates <= n/(k+1));
      3. exact recount of the candidate set (broadcast, zero shuffle).

    All three per-batch kernels are vectorized over _split_words'
    dictionary codes (one utf8_split_whitespace + dictionary_encode +
    np.bincount per batch — the ngram_topk idiom), not Python Counter
    loops. _split_words yields [''] for an empty/whitespace doc where
    str.split() yields [], so the zero-length dictionary entry is
    masked out of every count."""
    import math

    import pyarrow.compute as pc
    import ray.data  # noqa: F401

    k = max(64, int(4 / phi))
    docs = _read_documents(sf_dir, ["text"])

    def _batch_word_counts(batch: pa.Table):
        """(words, counts) for a batch: per-distinct-word totals over
        every doc, with the empty-doc '' artifact removed."""
        _, _, _, codes, words = _split_words(batch)
        cnt = np.bincount(codes, minlength=len(words)).astype(np.int64)
        keep = (
            pc.utf8_length(words).to_numpy(zero_copy_only=False) > 0
        )
        if not keep.all():
            sel = np.flatnonzero(keep)
            return words.take(pa.array(sel)), cnt[sel]
        return words, cnt

    def ntok(batch: pa.Table) -> pa.Table:
        _, cnt = _batch_word_counts(batch)
        return pa.table({"n": pa.array([int(cnt.sum())], pa.int64())})

    n = int(
        docs.map_batches(ntok, batch_format="pyarrow").sum("n") or 0
    )
    empty = pa.table(
        {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )
    if n == 0:
        return empty
    threshold = int(math.ceil(phi * n))
    cut = max(1, threshold - n // (k + 1))

    def mg(batch: pa.Table) -> pa.Table:
        words, cnt = _batch_word_counts(batch)
        if cnt.size > k:
            # (k+1)-th largest count; survivors = counts strictly above
            # it, decremented by it (ties at dec drop — same selection
            # the Counter.most_common version made, independent of tie
            # order)
            dec = np.partition(cnt, cnt.size - (k + 1))[cnt.size - (k + 1)]
            m = cnt > dec
            sel = np.flatnonzero(m)
            words, cnt = words.take(pa.array(sel)), cnt[sel] - dec
        return pa.table(
            {
                "token": words,
                "cnt": pa.array(cnt),
            }
        )

    def screen(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("sum(cnt)"), cut))

    cand_t = (
        docs.map_batches(mg, batch_format="pyarrow")
        .repartition(shuffle_parts(table_rows(sf_dir, "documents") * 64))
        .groupby("token")
        .sum("cnt")
        .map_batches(screen, batch_format="pyarrow")
        .take_all()
    )
    cand = sorted({r["token"] for r in cand_t})
    if not cand:
        return empty
    cand_arr = pa.array(cand, pa.string())  # <= ~2/phi strings

    def recount(batch: pa.Table) -> pa.Table:
        words, cnt = _batch_word_counts(batch)
        m = pc.is_in(words, value_set=cand_arr).to_numpy(
            zero_copy_only=False
        )
        sel = np.flatnonzero(m)
        return pa.table(
            {
                "token": words.take(pa.array(sel)),
                "cnt": pa.array(cnt[sel]),
            }
        )

    rows = (
        docs.map_batches(recount, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
        .take_all()
    )
    out = sorted(
        (
            (r["token"], int(r["sum(cnt)"]))
            for r in rows
            if int(r["sum(cnt)"]) >= threshold
        ),
        key=lambda x: (-x[1], x[0]),
    )
    return pa.table(
        {
            "token": pa.array([t for t, _ in out], pa.string()),
            "cnt": pa.array([c for _, c in out], pa.int64()),
        }
    )


def _split_words(batch: pa.Table):
    """Whitespace-split words for a batch, fully in Arrow: returns
    (n_docs, n_words:int64[doc], doc_idx:int64[word], codes:int64[word],
    words) where ``codes`` are per-batch dictionary codes (equal words =
    equal codes) and ``words`` is the batch's distinct-word dictionary
    (StringArray indexed by code). Matches DuckDB's
    string_split_regex(regex-trimmed text, '\\s+') exactly — including
    the [''] result for an empty or all-whitespace document."""
    import pyarrow.compute as pc

    lists = pc.utf8_split_whitespace(
        pc.utf8_trim_whitespace(batch.column("text").combine_chunks())
    )
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy()
    n_words = np.diff(offsets).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_words)
    flat = lists.flatten()
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy().astype(np.int64)
    return len(n_words), n_words, doc_idx, codes, enc.dictionary


def repetition_stats(sf_dir: str):
    """Gopher-style within-document repetition signals, all integers:
    (doc_id, n_words, n_uniq_words, n_bigrams, top_bigram_n) where
    top_bigram_n is the occurrence count of the document's most frequent
    word bigram (0 when the doc has < 2 words). Derived ratios
    (duplicate-word fraction = 1 - n_uniq/n_words, top-bigram fraction =
    top_bigram_n/n_bigrams) are the Gopher repetition-filter signals; the
    raw counts are emitted so the DuckDB oracle hash is exact.

    Fully vectorized: one dictionary-encode over the batch's words, then
    lexsort run-length math for per-doc distinct counts and bigram modes —
    no per-document Counter loops."""

    def fn(batch: pa.Table) -> pa.Table:
        n_docs, n_words, doc_idx, codes, _ = _split_words(batch)
        n_uniq = np.zeros(n_docs, np.int64)
        if codes.size:
            order = np.lexsort((codes, doc_idx))
            d, c = doc_idx[order], codes[order]
            new = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
            n_uniq = np.bincount(d[new], minlength=n_docs).astype(np.int64)
        top = np.zeros(n_docs, np.int64)
        n_bigrams = np.maximum(n_words - 1, 0)
        if codes.size > 1:
            same = doc_idx[1:] == doc_idx[:-1]
            bd, b1, b2 = doc_idx[:-1][same], codes[:-1][same], codes[1:][same]
            if bd.size:
                order = np.lexsort((b2, b1, bd))
                d, x, y = bd[order], b1[order], b2[order]
                new = np.r_[
                    True,
                    (d[1:] != d[:-1]) | (x[1:] != x[:-1]) | (y[1:] != y[:-1]),
                ]
                starts = np.flatnonzero(new)
                counts = np.diff(np.r_[starts, d.size])
                gd = d[starts]
                doc_starts = np.flatnonzero(np.r_[True, gd[1:] != gd[:-1]])
                top[gd[doc_starts]] = np.maximum.reduceat(counts, doc_starts)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words),
                "n_uniq_words": pa.array(n_uniq),
                "n_bigrams": pa.array(n_bigrams),
                "top_bigram_n": pa.array(top),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


# deterministic per-language sampling rates for the stratified sampler —
# Fibonacci-hash LCG on doc_id so the SAME expression is computable in
# ANSI SQL ((doc_id * 2654435761) % 2^32 < rate * 2^32; exact for
# doc_id < 2^32, which holds at every test scale; the numpy side wraps
# in uint64 and stays deterministic beyond that)
STRATA_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.10}
_FIB_MULT = 2654435761


def stratified_sample(sf_dir: str, rates: dict[str, float] | None = None):
    """Deterministic stratified downsampling of documents by language:
    keep a doc iff lcg(doc_id) < rate[lang] (unknown langs dropped).
    Output (doc_id, lang, source), the corpus-rebalancing primitive —
    no shuffle, no RNG state, resumable by construction (pure filter)."""
    import pyarrow.compute as pc

    rates = STRATA_RATES if rates is None else rates
    cuts = {k: np.int64(int(v * 2**32)) for k, v in rates.items()}

    def fn(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy()
        with np.errstate(over="ignore"):
            h = (did.astype(np.uint64) * np.uint64(_FIB_MULT)) % np.uint64(
                2**32
            )
        lang = batch.column("lang").to_pylist()
        cut = np.array([cuts.get(la, np.int64(0)) for la in lang], np.int64)
        keep = h.astype(np.int64) < cut
        return batch.filter(pa.array(keep))

    return _read_documents(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        fn, batch_format="pyarrow"
    )


SHARED_GRAM_PARTITIONS = 64


def shared_ngram_counts(sf_dir: str, n: int = 4):
    """Cross-document n-gram duplication (the signal behind exact-substring
    dedup a la "Deduplicating Training Data Makes LMs Better"): per doc,
    how many of its word n-gram OCCURRENCES use a gram that appears in at
    least 2 distinct documents. Output (doc_id, n_grams, n_shared).

    Scale shape: grams never leave their partition — stage 1 pre-aggregates
    (gram_hash, doc_id, occ) per batch and shuffles by gram_hash %
    SHARED_GRAM_PARTITIONS (bounded partition count); stage 2 finds >= 2
    distinct-doc grams with run-length math and emits per-doc partial sums
    (O(docs) rows); stage 3 is one more bounded shuffle keyed by doc to sum
    partials and join the per-doc totals. No all-pairs step, no driver
    materialization; gram identity is a 64-bit blake2b hash (collision
    probability ~ grams^2 / 2^64)."""
    import hashlib

    import ray.data

    def grams_stage(batch: pa.Table) -> pa.Table:
        """(part, gh, doc_id, occ): per-(doc, gram) occurrence counts.
        Vectorized: blake2b only over the batch's DISTINCT words, then a
        numpy polynomial rolling combine over the word-hash stream (gram
        identity = 63-bit hash; windows crossing a doc boundary masked
        out), then one lexsort for the per-(doc, gram) run-length counts.
        Each doc's words live in one batch, so each (gh, doc_id) pair is
        emitted exactly once globally — stage 2 relies on that."""
        _, _, doc_idx, codes, words = _split_words(batch)
        dids = batch.column("doc_id").to_numpy()
        empty = pa.table(
            {
                "part": pa.array([], pa.int64()),
                "gh": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "occ": pa.array([], pa.int64()),
            }
        )
        if codes.size < n:
            return empty
        dict_hashes = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
                )
                for w in words.to_pylist()
            ),
            dtype=np.uint64,
            count=len(words),
        )
        wh = dict_hashes[codes]
        m = wh.size - n + 1
        # window is a real gram only when it stays within one document
        valid = doc_idx[:m] == doc_idx[n - 1 :]
        gh = np.zeros(m, np.uint64)
        prime = np.uint64(1099511628211)
        for k in range(n):
            gh = gh * prime + wh[k : m + k]
        gd = doc_idx[:m][valid]
        gh = (gh[valid] & np.uint64((1 << 63) - 1)).astype(np.int64)
        if gd.size == 0:
            return empty
        order = np.lexsort((gh, gd))
        d, h = gd[order], gh[order]
        new = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
        starts = np.flatnonzero(new)
        occ = np.diff(np.r_[starts, d.size])
        out_gh = h[starts]
        return pa.table(
            {
                "part": pa.array(out_gh % SHARED_GRAM_PARTITIONS),
                "gh": pa.array(out_gh),
                "doc_id": pa.array(dids[d[starts]], pa.int64()),
                "occ": pa.array(occ.astype(np.int64)),
            }
        )

    def shared_partials(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = group.take(
            pc.sort_indices(
                group,
                sort_keys=[("gh", "ascending"), ("doc_id", "ascending")],
            )
        )
        gh = g.column("gh").to_numpy()
        doc = g.column("doc_id").to_numpy()
        occ = g.column("occ").to_numpy()
        new = np.r_[True, gh[1:] != gh[:-1]]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, gh.size])
        # each (gh, doc_id) pair is globally unique (one doc per stage-1
        # batch, per-doc dict dedup), so distinct docs per gram == run length
        shared_run = np.repeat(lens >= 2, lens)
        sel_doc, sel_occ = doc[shared_run], occ[shared_run]
        if sel_doc.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(sel_doc, kind="stable")
        sd, so = sel_doc[order], sel_occ[order]
        dstart = np.flatnonzero(np.r_[True, sd[1:] != sd[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(sd[dstart]),
                "n_shared": pa.array(np.add.reduceat(so, dstart)),
            }
        )

    def totals_stage(batch: pa.Table) -> pa.Table:
        _, n_words, _, _, _ = _split_words(batch)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(np.maximum(n_words - n + 1, 0)),
                "n_shared": pa.array(np.zeros(len(n_words), np.int64)),
            }
        )

    def with_docpart(zero_grams: bool):
        def f(batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy()
            t = batch.append_column(
                "docpart", pa.array((d % SHARED_GRAM_PARTITIONS).astype(np.int64))
            )
            if zero_grams:
                t = t.append_column(
                    "n_grams", pa.array(np.zeros(len(d), np.int64))
                )
            return t.select(["docpart", "doc_id", "n_grams", "n_shared"])

        return f

    def combine(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy()
        gr = group.column("n_grams").to_numpy()
        sh = group.column("n_shared").to_numpy()
        order = np.argsort(doc, kind="stable")
        d, g_, s = doc[order], gr[order], sh[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(d[starts]),
                "n_grams": pa.array(np.add.reduceat(g_, starts)),
                "n_shared": pa.array(np.add.reduceat(s, starts)),
            }
        )

    rows = table_rows(sf_dir, "documents")
    partials = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(grams_stage, batch_format="pyarrow")
        .repartition(shuffle_parts(rows * 140))
        .groupby("part")
        .map_groups(shared_partials, batch_format="pyarrow")
        .map_batches(with_docpart(True), batch_format="pyarrow")
    )
    totals = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(totals_stage, batch_format="pyarrow")
        .map_batches(with_docpart(False), batch_format="pyarrow")
    )
    return (
        totals.union(partials)
        .repartition(shuffle_parts(rows * 30))
        .groupby("docpart")
        .map_groups(combine, batch_format="pyarrow")
        .sort("doc_id")
    )


# PII patterns, RE2 syntax: pyarrow.compute's regex kernels and DuckDB's
# regexp_* functions are BOTH backed by RE2, so count/replace semantics
# (leftmost, non-overlapping) match engine-to-engine exactly. Applied in
# this order on both sides (email first: an address would otherwise leak
# its host part to later patterns).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_scrub(sf_dir: str):
    """Dolma/CCNet-style PII scrubbing pass: per document, count and
    redact emails / IPv4 addresses / phone numbers. Output (doc_id,
    n_email, n_ipv4, n_phone, clean_text). Fully vectorized — one
    pc.count_substring_regex + pc.replace_substring_regex per pattern,
    zero Python-per-row work; a pure map stage (no shuffle, resumable).

    The synthetic sf corpora contain no PII (all counts 0, clean_text ==
    text); tests/test_text_curation_ops.py pins the non-vacuous behavior
    on an injected-PII corpus against the same DuckDB oracle SQL."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text").combine_chunks()
        cols: dict[str, pa.Array] = {"doc_id": batch.column("doc_id")}
        clean = text
        for name, pat, repl in PII_PATTERNS:
            cols[f"n_{name}"] = pc.count_substring_regex(clean, pat).cast(
                pa.int64()
            )
            clean = pc.replace_substring_regex(clean, pat, repl)
        cols["clean_text"] = clean
        return pa.table(cols)

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def group_sample(sf_dir: str, k: int = 5):
    """Deterministic k-examples-per-group sampling (the "show me k docs
    per source" curation primitive): rank docs within each source by the
    Fibonacci-hash LCG on doc_id (an odd multiplier mod 2^32 is a
    bijection, so ranks are collision-free for doc_id < 2^32; doc_id
    breaks ties beyond that) and keep the k smallest. Output (doc_id,
    source, sample_rank).

    Distributive: each batch keeps at most k rows per source it sees
    (lexsort + run-length prune), so the shuffle moves O(k * sources *
    blocks) rows, never the corpus; one tiny groupby finishes."""

    def prune(batch: pa.Table, final: bool) -> pa.Table:
        did = batch.column("doc_id").to_numpy()
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        scode = src.dictionary_encode().indices.to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            h = (did.astype(np.uint64) * np.uint64(_FIB_MULT)) % np.uint64(
                2**32
            )
        h = h.astype(np.int64)
        order = np.lexsort((did, h, scode))
        g = scode[order]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        rank = np.arange(g.size, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, g.size])
        )
        keep = order[rank < k]
        out = batch.take(pa.array(keep))
        if not final:
            return out
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "source": out.column("source"),
                "sample_rank": pa.array(
                    (rank[rank < k] + 1).astype(np.int64)
                ),
            }
        )

    return (
        _read_documents(sf_dir, ["doc_id", "source"])
        .map_batches(
            lambda b: prune(b, final=False), batch_format="pyarrow"
        )
        .repartition(8)
        .groupby("source")
        .map_groups(lambda g: prune(g, final=True), batch_format="pyarrow")
        .sort(["source", "sample_rank"])
    )


TERM_PARTITIONS = 64
_HLL_P = 12  # 4096 registers, ~1.6% standard error


def _term_hash64(terms) -> np.ndarray:
    """Stable 64-bit blake2b hash per term (one call per DISTINCT term in
    the batch; callers pass a dictionary array, never the exploded token
    stream)."""
    import hashlib

    out = np.empty(len(terms), dtype=np.uint64)
    for i, t in enumerate(terms):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
        )
    return out


def _doc_term_tf_rows(batch: pa.Table) -> pa.Table:
    """Map-side per-(doc, term) term frequencies with a stable
    term-hash partition key: (part, doc_id, term, tf). The exploded
    token stream never leaves the map task — one lexsort + run-length
    count per batch; blake2b runs once per DISTINCT word. The
    empty-doc sentinel token '' (split parity with the oracle's
    string_split_regex) carries no signal and is dropped."""
    _, _, doc_idx, codes, words = _split_words(batch)
    did = batch.column("doc_id").to_numpy()
    if codes.size == 0:
        return pa.table(
            {
                "part": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
    order = np.lexsort((codes, doc_idx))
    d, c = doc_idx[order], codes[order]
    new = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
    starts = np.flatnonzero(new)
    tf = np.diff(np.r_[starts, d.size]).astype(np.int64)
    dsel, csel = d[starts], c[starts]
    wl = words.to_pylist()
    h = _term_hash64(wl)
    nonempty = np.array([bool(w) for w in wl], dtype=bool)
    keep = nonempty[csel]
    dsel, csel, tf = dsel[keep], csel[keep], tf[keep]
    return pa.table(
        {
            "part": pa.array(
                (h[csel] % np.uint64(TERM_PARTITIONS)).astype(np.int64)
            ),
            "doc_id": pa.array(did[dsel]),
            "term": pa.array(np.asarray(wl, dtype=object)[csel], pa.string()),
            "tf": pa.array(tf),
        }
    )


# vocabulary sizes up to this many distinct terms broadcast as a driver
# dict (~100 B/entry => <=200 MB, the DICT_DRIVER_MAX_ROWS ballpark);
# beyond it the (doc,term) exchange paths below take over. The 10M-doc
# rehearsal corpus (19.9M terms) exceeds it; the Zipf doc corpora (50k
# terms) are far under.
TERM_BROADCAST_MAX_TERMS = 2_000_000

# per-worker-process cache of deserialized broadcast objects: ray.get of
# a driver-put dict re-unpickles on EVERY call, so a per-batch ray.get
# inside map_batches pays the full deserialize per batch; one cache entry
# per ObjectRef makes it once per worker process instead.
_BCAST_CACHE: dict = {}


def _bcast_get(ref):
    import ray

    out = _BCAST_CACHE.get(ref)
    if out is None:
        if len(_BCAST_CACHE) >= 4:  # bound worker heap across op runs
            _BCAST_CACHE.clear()
        out = _BCAST_CACHE[ref] = ray.get(ref)
    return out


def _tf_rows(sf_dir: str):
    """MATERIALIZED (part, doc_id, term, tf) rows — the single tokenize
    pass every distinctive_terms / unigram_surprisal branch feeds from
    (blocks preserve batch boundaries, so a doc's rows stay contiguous
    within one block)."""
    return (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(_doc_term_tf_rows, batch_format="pyarrow")
        .materialize()
    )


def _vocab_estimate(tf_ds) -> int:
    """HLL distinct-term estimate over the materialized tf rows (~2%
    error at p=14) — O(rows) scan of in-memory blocks, no tokenize, no
    exchange. Used only to decide the broadcast crossover; the exact
    count re-checks before any broadcast happens."""
    p = 14
    m = 1 << p

    def regs(batch: pa.Table) -> pa.Table:
        term = batch.column("term")
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        reg = np.zeros(m, np.uint8)
        _hll_update(reg, _term_hash64(term.to_pylist()), p)
        return pa.table({"regs": pa.array([reg], pa.list_(pa.uint8(), m))})

    rows = tf_ds.map_batches(regs, batch_format="pyarrow").take_all()
    reg = np.zeros(m, np.uint8)
    for r in rows:
        reg = np.maximum(reg, np.asarray(r["regs"], dtype=np.uint8))
    return _hll_estimate(reg)[1]


def _stats_from_tf_rows(tf_ds, n_docs: int):
    """Exact global (term, cnt, df) folded FROM the materialized tf
    rows: a map-side per-block VOCAB partial (cnt = sum tf, df = row
    count — rows are distinct (doc, term)) shrinks the exchange to
    vocab-sized rows before the term-hash partition groupby. No
    re-tokenize, no (doc,term)-row shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        term = batch.column("term")
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        enc = term.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        tf = batch.column("tf").to_numpy()
        cnt = np.bincount(codes, weights=tf).astype(np.int64)
        df = np.bincount(codes).astype(np.int64)
        h = _term_hash64(enc.dictionary.to_pylist())
        return pa.table(
            {
                "part": pa.array(
                    (h % np.uint64(TERM_PARTITIONS)).astype(np.int64)
                ),
                "term": enc.dictionary,
                "cnt": pa.array(cnt),
                "df": pa.array(df),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        term = group.column("term")
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        enc = term.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        cnt = np.bincount(
            codes, weights=group.column("cnt").to_numpy()
        ).astype(np.int64)
        df = np.bincount(
            codes, weights=group.column("df").to_numpy()
        ).astype(np.int64)
        return pa.table(
            {
                "term": enc.dictionary,
                "cnt": pa.array(cnt),
                "df": pa.array(df),
            }
        )

    return (
        tf_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(shuffle_parts(n_docs * 64))
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )


def _broadcast_term_stats(sf_dir: str, tf_ds):
    """(stats_ref, total_tokens) when the corpus vocabulary fits the
    broadcast budget, else None. Crossover order: a cheap HLL estimate
    over the materialized tf rows gates the vocab-sized stats exchange
    (so an over-budget vocabulary never pays a discarded stats job),
    then the EXACT count re-checks before the driver dict is built.
    stats_ref is a ray.put of {term: (cnt, df)}."""
    import ray

    n_docs = table_rows(sf_dir, "documents")
    if _vocab_estimate(tf_ds) > 0.9 * TERM_BROADCAST_MAX_TERMS:
        return None
    stats = _stats_from_tf_rows(tf_ds, n_docs).materialize()
    if stats.count() > TERM_BROADCAST_MAX_TERMS:
        return None
    batches = list(stats.iter_batches(batch_format="pyarrow"))
    if not batches:
        return ray.put({}), 0
    t = pa.concat_tables(pa.table(b) for b in batches)
    terms = t.column("term").to_pylist()
    cnt = t.column("cnt").to_numpy()
    df = t.column("df").to_numpy()
    d = {w: (int(c), int(f)) for w, c, f in zip(terms, cnt, df)}
    return ray.put(d), int(cnt.sum())


def _empty_distinctive() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "rk": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
        }
    )


def _doc_topk_select(t: pa.Table, k: int) -> pa.Table:
    """(doc_id, rk, term, tf, df) top-k rows per doc_id of a
    (doc_id, term, tf, df) table under (tf desc, df asc, term asc) —
    one vectorized sort + rank-within-run prune, never a group per
    doc. Used by both distinctive_terms paths."""
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return _empty_distinctive()
    order = pc.sort_indices(
        t,
        sort_keys=[
            ("doc_id", "ascending"),
            ("tf", "descending"),
            ("df", "ascending"),
            ("term", "ascending"),
        ],
    )
    g = t.take(order)
    did = g.column("doc_id").to_numpy()
    starts = np.flatnonzero(np.r_[True, did[1:] != did[:-1]])
    rank = np.arange(did.size, dtype=np.int64) - np.repeat(
        starts, np.diff(np.r_[starts, did.size])
    )
    sel = g.take(pa.array(np.flatnonzero(rank < k)))
    return pa.table(
        {
            "doc_id": sel.column("doc_id"),
            "rk": pa.array(rank[rank < k] + 1),
            "term": sel.column("term"),
            "tf": sel.column("tf"),
            "df": sel.column("df"),
        }
    )


def distinctive_terms(sf_dir: str, k: int = 5):
    """Per-document top-k distinctive terms: for each doc, the k
    whitespace terms ranked by (tf desc, df asc, term asc) — high
    frequency in the doc, rare in the corpus (the integer-deterministic
    TF-IDF analog; no float division so the DuckDB oracle hash is
    exact). Output (doc_id, rk, term, tf, df), rk 1-based.

    Two bounded-partition shuffles, both vectorized:
      1. map-side per-(doc,term) tf via dictionary run-length math (the
         exploded token stream never leaves the map task), then shuffle
         keyed by blake2b(term) %% TERM_PARTITIONS — every row of a term
         lands in one group, so df is a local bincount there;
      2. rekey by doc_id, per-group top-k via one lexsort +
         rank-within-run prune (never a group per doc).
    At 100 TB both exchanges move O(distinct (doc,term)) rows, not the
    token stream; hot terms cost one group's bincount, not a join.

    Size-aware crossover (single tokenize for EVERY branch: the
    (part, doc_id, term, tf) rows are materialized once and each branch
    feeds from them): a cheap HLL vocab estimate over the materialized
    rows gates the crossover — under ~TERM_BROADCAST_MAX_TERMS the
    exact (term, cnt, df) stats fold through one vocab-sized exchange,
    broadcast once, and top-k candidates are a LOCAL pass over the rows.
    A doc's tf rows can straddle block/batch boundaries (Ray's
    BlockOutputBuffer slices a map task's output at arbitrary rows once
    it exceeds the target block size), so the local pass emits per-batch
    per-doc top-k CANDIDATES (any row in a doc's true top-k is in its
    own batch's top-k — selection is monotone under subsetting) and a
    doc-keyed groupby folds them exactly; that fold moves O(docs * k)
    rows, never the (doc,term) stream. Over the budget, the
    two-exchange path runs on the same rows with no discarded stats
    job. Both paths pinned output-identical in tests/test_ops_oracle.py.

    NOTE: the tf rows + crossover decision materialize at CALL time
    (eager, like dataset_topk); only the final stage stays lazy."""
    tf_ds = _tf_rows(sf_dir)
    bc = _broadcast_term_stats(sf_dir, tf_ds)
    if bc is not None:
        stats_ref, _ = bc

        def local_topk(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_distinctive().drop_columns(["rk"]).add_column(
                    0, "part", pa.array([], pa.int64())
                )
            stats = _bcast_get(stats_ref)
            term = batch.column("term")
            if isinstance(term, pa.ChunkedArray):
                term = term.combine_chunks()
            enc = term.dictionary_encode()
            codes = enc.indices.to_numpy().astype(np.int64)
            dfv = np.array(
                [stats.get(w, (0, 0))[1] for w in enc.dictionary.to_pylist()],
                dtype=np.int64,
            )
            t = pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "term": term,
                    "tf": batch.column("tf"),
                    "df": pa.array(dfv[codes]),
                }
            )
            cand = _doc_topk_select(t, k).drop_columns(["rk"])
            did = cand.column("doc_id").to_numpy()
            return cand.add_column(
                0,
                "part",
                pa.array((did % TERM_PARTITIONS).astype(np.int64)),
            )

        def fold_topk(group: pa.Table) -> pa.Table:
            return _doc_topk_select(
                group.select(["doc_id", "term", "tf", "df"]), k
            )

        return (
            tf_ds.map_batches(local_topk, batch_format="pyarrow")
            .groupby("part")
            .map_groups(fold_topk, batch_format="pyarrow")
            .sort(["doc_id", "rk"])
        )

    def attach_df(group: pa.Table) -> pa.Table:
        term = group.column("term")
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        enc = term.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        df = np.bincount(codes)[codes]  # rows are distinct (doc, term)
        did = group.column("doc_id").to_numpy()
        return pa.table(
            {
                "part2": pa.array((did % TERM_PARTITIONS).astype(np.int64)),
                "doc_id": group.column("doc_id"),
                "term": term,
                "tf": group.column("tf"),
                "df": pa.array(df.astype(np.int64)),
            }
        )

    def doc_topk(group: pa.Table) -> pa.Table:
        return _doc_topk_select(group.select(
            ["doc_id", "term", "tf", "df"]
        ), k)

    n_docs = table_rows(sf_dir, "documents")
    return (
        tf_ds.repartition(shuffle_parts(n_docs * 1024))
        .groupby("part")
        .map_groups(attach_df, batch_format="pyarrow")
        .repartition(shuffle_parts(n_docs * 256))
        .groupby("part2")
        .map_groups(doc_topk, batch_format="pyarrow")
        .sort(["doc_id", "rk"])
    )


def unigram_surprisal(sf_dir: str):
    """Per-document integer unigram-LM surprisal (the CCNet/KenLM
    perplexity-bucketing analog with an in-corpus unigram model and
    exact integer arithmetic): surprisal(token) = bit_length(T // c)
    where c is the token's corpus count and T the corpus total — an
    exact integer stand-in for -log2(c/T), identical in DuckDB
    (length(bin(T // c))), so the oracle hash is exact. Output
    (doc_id, n_tokens, surprisal_bits); rare-token-heavy docs score
    high, boilerplate scores low. Docs with zero tokens are omitted
    (they have no LM score), mirroring the oracle.

    Same two bounded-partition exchanges as distinctive_terms: the
    term-hash partition makes the corpus count a local bincount-sum
    (no join, hot tokens stay one group's problem), then a doc-keyed
    regroup sums each doc's tf-weighted surprisals. Shuffles move
    O(distinct (doc,term)) rows, never the token stream; the (doc,term)
    table is materialized ONCE so both the global total T and the
    exchanges come from a single tokenize pass (a second full tokenize
    of the corpus cost more at 2M docs than the whole remaining
    pipeline — measured 84 s -> 56 s).

    Size-aware crossover (same single-tokenize structure as
    distinctive_terms: every branch feeds from the once-materialized
    (doc, term, tf) rows; an HLL vocab estimate gates the stats fold so
    a too-large vocabulary never pays a discarded stats job): under the
    budget the corpus counts broadcast once and scoring is a LOCAL pass
    over the rows emitting per-batch per-doc PARTIAL sums — a doc's tf
    rows can straddle block/batch boundaries (BlockOutputBuffer slices
    map output at arbitrary rows), so the partials fold through a
    doc-keyed groupby that moves O(docs) rows, never the (doc,term)
    stream. Over the budget, the two-exchange path runs on the same
    rows. Both paths pinned identical.
    NOTE: rows + crossover decision materialize at CALL time (eager);
    scoring stays lazy."""
    tf_ds = _tf_rows(sf_dir)
    bc = _broadcast_term_stats(sf_dir, tf_ds)
    if bc is not None:
        stats_ref, total = bc
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "surprisal_bits": pa.array([], pa.int64()),
                }
            )

        def score(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "part": pa.array([], pa.int64()),
                        "doc_id": pa.array([], pa.int64()),
                        "n_tokens": pa.array([], pa.int64()),
                        "surprisal_bits": pa.array([], pa.int64()),
                    }
                )
            stats = _bcast_get(stats_ref)
            term = batch.column("term")
            if isinstance(term, pa.ChunkedArray):
                term = term.combine_chunks()
            enc = term.dictionary_encode()
            codes = enc.indices.to_numpy().astype(np.int64)
            c = np.array(
                [
                    stats.get(w, (0, 0))[0]
                    for w in enc.dictionary.to_pylist()
                ],
                dtype=np.int64,
            )
            bits_w = _bit_length64(
                (total // np.maximum(c, 1)).astype(np.uint64)
            )[codes]
            tf = batch.column("tf").to_numpy()
            did = batch.column("doc_id").to_numpy()
            enc_did, inv = np.unique(did, return_inverse=True)
            ntok = np.bincount(inv, weights=tf).astype(np.int64)
            sbits = np.bincount(inv, weights=tf * bits_w).astype(np.int64)
            return pa.table(
                {
                    "part": pa.array(
                        (enc_did % TERM_PARTITIONS).astype(np.int64)
                    ),
                    "doc_id": pa.array(enc_did),
                    "n_tokens": pa.array(ntok),
                    "surprisal_bits": pa.array(sbits),
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            did = group.column("doc_id").to_numpy()
            uniq, inv = np.unique(did, return_inverse=True)
            ntok = np.zeros(uniq.size, np.int64)
            sbits = np.zeros(uniq.size, np.int64)
            np.add.at(ntok, inv, group.column("n_tokens").to_numpy())
            np.add.at(
                sbits, inv, group.column("surprisal_bits").to_numpy()
            )
            return pa.table(
                {
                    "doc_id": pa.array(uniq),
                    "n_tokens": pa.array(ntok),
                    "surprisal_bits": pa.array(sbits),
                }
            )

        return (
            tf_ds.map_batches(score, batch_format="pyarrow")
            .groupby("part")
            .map_groups(fold, batch_format="pyarrow")
            .sort("doc_id")
        )

    n_docs = table_rows(sf_dir, "documents")
    total = int(tf_ds.sum("tf") or 0)
    if total == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "surprisal_bits": pa.array([], pa.int64()),
            }
        )

    def attach_bits(group: pa.Table) -> pa.Table:
        term = group.column("term")
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        codes = term.dictionary_encode().indices.to_numpy().astype(np.int64)
        tf = group.column("tf").to_numpy()
        c = np.bincount(codes, weights=tf).astype(np.int64)[codes]
        bits = _bit_length64((total // c).astype(np.uint64))
        did = group.column("doc_id").to_numpy()
        return pa.table(
            {
                "part2": pa.array((did % TERM_PARTITIONS).astype(np.int64)),
                "doc_id": group.column("doc_id"),
                "tf": group.column("tf"),
                "bits": pa.array(tf * bits),
            }
        )

    def per_doc(group: pa.Table) -> pa.Table:
        did = group.column("doc_id").to_numpy()
        enc_did, inv = np.unique(did, return_inverse=True)
        ntok = np.bincount(inv, weights=group.column("tf").to_numpy())
        sbits = np.bincount(inv, weights=group.column("bits").to_numpy())
        return pa.table(
            {
                "doc_id": pa.array(enc_did),
                "n_tokens": pa.array(ntok.astype(np.int64)),
                "surprisal_bits": pa.array(sbits.astype(np.int64)),
            }
        )

    return (
        tf_ds.repartition(shuffle_parts(n_docs * 1024))
        .groupby("part")
        .map_groups(attach_bits, batch_format="pyarrow")
        .repartition(shuffle_parts(n_docs * 128))
        .groupby("part2")
        .map_groups(per_doc, batch_format="pyarrow")
        .sort("doc_id")
    )


def _bit_length64(vals: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length for a uint64 array (0 -> 0), via a
    log2-free shift ladder — exact, no float rounding at power-of-two
    boundaries."""
    bl = np.zeros(vals.shape, dtype=np.int64)
    r = vals.astype(np.uint64, copy=True)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = r >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        r[mask] >>= np.uint64(shift)
    bl[vals > 0] += 1
    return bl


def _hll_update(reg: np.ndarray, hashes: np.ndarray, p: int) -> None:
    """Max-merge 64-bit hashes into 2^p HLL registers, vectorized:
    index = top p bits, rho = leading-zero count of the remaining
    (64-p)-bit suffix + 1 (suffix 0 -> 65-p, the all-zeros convention)."""
    if hashes.size == 0:
        return
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes & np.uint64((1 << (64 - p)) - 1)
    rho = ((64 - p) - _bit_length64(rest) + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rho)


def _hll_estimate(reg: np.ndarray) -> tuple[int, int]:
    """(nonzero_registers, rounded estimate) from HLL registers with the
    standard small-range linear-counting correction."""
    import math

    m = reg.size
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if raw <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    else:
        est = raw
    return m - zeros, int(round(est))


def hll_distinct_tokens(sf_dir: str, p: int = _HLL_P):
    """Approximate corpus-wide distinct whitespace-token count via a
    HyperLogLog sketch: one 2^p-register row per batch (registers over
    the batch's DISTINCT words only — max-merge makes per-batch dedup
    free accuracy), elementwise-max reduced on the driver (rows are
    #blocks x 4 KB, bounded), then the standard bias-corrected estimate.
    Registers are a max over per-word hashes, so the sketch — and the
    estimate — is invariant to batching/partitioning by construction.
    Output one row (precision, m, nonzero_registers, est_distinct); no
    SQL oracle (estimate), accuracy pinned vs the exact count in tests."""
    m = 1 << p

    def regs(batch: pa.Table) -> pa.Table:
        _, _, _, _, words = _split_words(batch)
        wl = [w for w in words.to_pylist() if w]
        reg = np.zeros(m, np.uint8)
        _hll_update(reg, _term_hash64(wl), p)
        return pa.table(
            {"regs": pa.array([reg], pa.list_(pa.uint8(), m))}
        )

    rows = (
        _read_documents(sf_dir, ["text"])
        .map_batches(regs, batch_format="pyarrow")
        .take_all()
    )
    reg = np.zeros(m, np.uint8)
    for r in rows:
        reg = np.maximum(reg, np.asarray(r["regs"], dtype=np.uint8))
    nonzero, est = _hll_estimate(reg)
    return pa.table(
        {
            "precision": pa.array([p], pa.int64()),
            "m": pa.array([m], pa.int64()),
            "nonzero_registers": pa.array([nonzero], pa.int64()),
            "est_distinct": pa.array([est], pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# Exact duplicate-SPAN removal (word-level ExactSubstr dedup a la Lee et
# al. 2022, "Deduplicating Training Data Makes Language Models Better",
# arXiv:2107.06499): a word position is duplicated iff some n-word window
# covering it has a gram that appears in >= 2 distinct documents; maximal
# covered runs are removed from the text. shared_ngram_counts reports the
# signal; this op performs the rewrite.

# duplicated-gram sets up to this many entries broadcast as one sorted
# int64 array (8 B/entry => <= 40 MB); beyond it the (doc_id, gh) pairs
# are exchanged back to their documents instead.
SPAN_BROADCAST_MAX_GRAMS = 5_000_000

DEDUP_SPAN_N = 8


def _gram_doc_rows(batch: pa.Table, n: int) -> pa.Table:
    """Distinct (part, gh, doc_id) per batch for n-word windows — the
    same 63-bit blake2b-word polynomial gram identity as
    shared_ngram_counts (documents never span batches, so each pair is
    globally unique)."""
    _, _, doc_idx, codes, words = _split_words(batch)
    dids = batch.column("doc_id").to_numpy()
    empty = pa.table(
        {
            "part": pa.array([], pa.int64()),
            "gh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
        }
    )
    if codes.size < n:
        return empty
    gd, gh, _ = _rolling_gram_hashes(
        doc_idx, _word_hash_dict(words)[codes], n
    )
    if gd.size == 0:
        return empty
    order = np.lexsort((gh, gd))
    d, h = gd[order], gh[order]
    new = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
    return pa.table(
        {
            "part": pa.array(h[new] % SHARED_GRAM_PARTITIONS),
            "gh": pa.array(h[new]),
            "doc_id": pa.array(dids[d[new]], pa.int64()),
        }
    )


def _mix2_64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """64-bit mix of two int64 streams (murmur-style finalizer) — pair
    identity for (doc_id, gram) membership tests. Collision probability
    within one partition ~ pairs^2 / 2^64, the same budget as the gram
    identity itself."""
    x = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ b.astype(
        np.uint64
    ) * np.uint64(0xC2B2AE3D27D4EB4F)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return x


def _strip_dup_windows(batch: pa.Table, n: int, is_dup_window) -> pa.Table:
    """Rewrite one batch of documents: recompute the n-word windows,
    ask ``is_dup_window(window_gh:uint63 int64, window_doc_id:int64)``
    for the duplicated mask, stamp the covered word intervals
    (diff+cumsum, vectorized), and rebuild clean_text by joining each
    doc's kept words (pc.binary_join — no Python per-row work). Output
    (doc_id, n_words, n_dup_words, n_spans, clean_text)."""
    import pyarrow.compute as pc

    n_docs, n_words, doc_idx, codes, words = _split_words(batch)
    dids = batch.column("doc_id").to_numpy()
    flat_words = words.take(pa.array(codes))
    nw = codes.size
    covered = np.zeros(nw, dtype=bool)
    if nw >= n:
        widx, gh, starts = _rolling_gram_hashes(
            doc_idx, _word_hash_dict(words)[codes], n
        )
        if starts.size:
            dup = is_dup_window(gh, dids[widx])
            dup_starts = starts[dup]
            diff = np.zeros(nw + 1, dtype=np.int64)
            np.add.at(diff, dup_starts, 1)
            np.add.at(diff, dup_starts + n, -1)
            covered = np.cumsum(diff[:-1]) > 0
    kept = ~covered
    counts_kept = np.bincount(doc_idx[kept], minlength=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts_kept, out=offsets[1:])
    kept_words = flat_words.filter(pa.array(kept))
    if isinstance(kept_words, pa.ChunkedArray):
        kept_words = kept_words.combine_chunks()
    la = pa.LargeListArray.from_arrays(pa.array(offsets), kept_words)
    clean = pc.binary_join(la, " ")
    new_doc = np.r_[True, doc_idx[1:] != doc_idx[:-1]] if nw else np.array([], bool)
    prev_cov = np.r_[False, covered[:-1]] if nw else covered
    span_start = covered & (~prev_cov | new_doc)
    return pa.table(
        {
            "doc_id": pa.array(dids, pa.int64()),
            "n_words": pa.array(n_words),
            "n_dup_words": pa.array(
                np.bincount(doc_idx[covered], minlength=n_docs).astype(np.int64)
            ),
            "n_spans": pa.array(
                np.bincount(doc_idx[span_start], minlength=n_docs).astype(
                    np.int64
                )
            ),
            "clean_text": clean,
        }
    )


def dedup_spans(sf_dir: str, n: int = DEDUP_SPAN_N):
    """Remove cross-document duplicated spans: every maximal word run
    covered by an n-gram appearing in >= 2 distinct documents is cut
    from the text. (doc_id, n_words, n_dup_words, n_spans, clean_text)
    sorted by doc_id; clean_text joins the kept words with single
    spaces (whitespace is normalized by the rewrite, as in the
    reference ExactSubstr pipeline).

    Scale shape: stage 1 emits distinct (gram, doc) pairs (never the
    token stream) into a bounded gram-hash-keyed exchange; stage 2
    keeps grams with >= 2 distinct docs. Then a size-aware crossover:
    small duplicated-gram sets broadcast ONCE as a sorted int64 array
    (searchsorted membership in a single local rewrite pass); large
    sets ship their (doc_id, gh) pairs back to their documents through
    ONE doc-keyed exchange and the rewrite runs per group. Both paths
    are pinned output-identical in tests (plus a scalar corpus-wide
    reference). NOTE: the shared-gram stats materialize at CALL time
    (eager crossover decision); the rewrite pass stays lazy. 2M-doc
    rehearsal: 73 s end-to-end (27k docs/s) in a shared-host window."""
    import ray
    import ray.data

    rows = table_rows(sf_dir, "documents")
    gram_pairs = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(lambda b: _gram_doc_rows(b, n), batch_format="pyarrow")
        .repartition(shuffle_parts(rows * 140))
        .groupby("part")
    )

    def shared_pairs(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = group.take(
            pc.sort_indices(
                group,
                sort_keys=[("gh", "ascending"), ("doc_id", "ascending")],
            )
        )
        gh = g.column("gh").to_numpy()
        doc = g.column("doc_id").to_numpy()
        new = np.r_[True, gh[1:] != gh[:-1]]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, gh.size])
        shared_run = np.repeat(lens >= 2, lens)
        return pa.table(
            {
                "doc_id": pa.array(doc[shared_run], pa.int64()),
                "gh": pa.array(gh[shared_run], pa.int64()),
            }
        )

    shared = gram_pairs.map_groups(shared_pairs, batch_format="pyarrow")
    stats = shared.materialize()
    n_shared_pairs = stats.count()
    docs = _read_documents(sf_dir, ["doc_id", "text"])

    if n_shared_pairs <= SPAN_BROADCAST_MAX_GRAMS:
        batches = list(stats.iter_batches(batch_format="pyarrow"))
        if batches:
            t = pa.concat_tables(pa.table(b) for b in batches)
            gh_set = np.unique(t.column("gh").to_numpy())
        else:
            gh_set = np.array([], dtype=np.int64)
        set_ref = ray.put(gh_set)

        def local_rewrite(batch: pa.Table) -> pa.Table:
            s = ray.get(set_ref)

            def is_dup(gh: np.ndarray, _doc: np.ndarray) -> np.ndarray:
                if s.size == 0:
                    return np.zeros(gh.size, dtype=bool)
                pos = np.minimum(np.searchsorted(s, gh), s.size - 1)
                return s[pos] == gh

            return _strip_dup_windows(batch, n, is_dup)

        return docs.map_batches(
            local_rewrite, batch_format="pyarrow"
        ).sort("doc_id")

    parts = SHARED_GRAM_PARTITIONS

    def doc_side(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table(
            {
                "docpart": pa.array(d % parts),
                "side": pa.array(np.zeros(len(d), dtype=np.int64)),
                "doc_id": pa.array(d),
                "gh": pa.array(np.zeros(len(d), dtype=np.int64)),
                "text": batch.column("text"),
            }
        )

    def pair_side(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table(
            {
                "docpart": pa.array(d % parts),
                "side": pa.array(np.ones(len(d), dtype=np.int64)),
                "doc_id": pa.array(d),
                "gh": batch.column("gh"),
                "text": pa.array([""] * len(d), pa.string()),
            }
        )

    def meet(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group.column("side").to_numpy()
        dmask = side == 0
        doc_rows = group.filter(pa.array(dmask))
        doc_rows = doc_rows.take(
            pc.sort_indices(doc_rows, sort_keys=[("doc_id", "ascending")])
        )
        pk = _mix2_64(
            group.column("gh").to_numpy()[~dmask],
            group.column("doc_id").to_numpy()[~dmask],
        )
        pk = np.unique(pk)

        def is_dup(gh: np.ndarray, doc: np.ndarray) -> np.ndarray:
            if pk.size == 0:
                return np.zeros(gh.size, dtype=bool)
            wk = _mix2_64(gh, doc)
            pos = np.minimum(np.searchsorted(pk, wk), pk.size - 1)
            return pk[pos] == wk

        return _strip_dup_windows(
            doc_rows.select(["doc_id", "text"]), n, is_dup
        )

    d_ds = docs.map_batches(doc_side, batch_format="pyarrow")
    p_ds = stats.map_batches(pair_side, batch_format="pyarrow")
    return (
        d_ds.union(p_ds)
        .repartition(shuffle_parts(rows * 6700))
        .groupby("docpart")
        .map_groups(meet, batch_format="pyarrow")
        .sort("doc_id")
    )


def quality_percentile_filter(sf_dir: str, pct: float = 0.5):
    """Percentile-based quality curation: keep documents whose
    quality_milli >= the exact pct-quantile of the corpus quality
    distribution (DuckDB quantile_disc convention: the sorted value at
    index max(0, ceil(pct*n)-1)). (doc_id, quality_milli) sorted by
    doc_id.

    Scale shape: quality_milli has a closed 0..1000 integer range, so
    the exact order statistic comes from ONE pass of per-batch
    1001-bin bincounts (a bounded 1001-row exchange — no sort, no
    sample-based approximation); the scored (doc_id, quality) rows are
    materialized once (16 B/doc — tiny next to the text) so the text
    is read and scored exactly once."""
    from ray.data.aggregate import Sum

    scores = quality_score(sf_dir).materialize()
    n_total = scores.count()
    if n_total == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "quality_milli": pa.array([], pa.int64()),
            }
        )

    def hist(batch: pa.Table) -> pa.Table:
        q = batch.column("quality_milli").to_numpy()
        c = np.bincount(q, minlength=1001)
        nz = np.flatnonzero(c)
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(c[nz].astype(np.int64)),
            }
        )

    rows = scores.map_batches(hist, batch_format="pyarrow").groupby(
        "bin"
    ).aggregate(Sum("cnt")).take_all()  # <= 1001 rows by construction
    counts = np.zeros(1001, dtype=np.int64)
    for r in rows:
        counts[int(r["bin"])] = int(r["sum(cnt)"])
    thr = disc_quantile_from_hist(counts, n_total, pct)

    def keep(batch: pa.Table) -> pa.Table:
        q = batch.column("quality_milli").to_numpy()
        return batch.filter(pa.array(q >= thr))

    return scores.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def quality_percentile_filter_by_lang(sf_dir: str, pct: float = 0.5):
    """Per-GROUP percentile curation: keep documents at or above their
    own language's exact pct-quantile of quality_milli (per-group
    quantile_disc convention) — the per-language analog of
    quality_percentile_filter, so a high-scoring language doesn't
    crowd out every other language's budget.
    (doc_id, lang, quality_milli) sorted by doc_id.

    Same closed-range trick, one more dimension: per-batch
    (lang, bin 0..1000) bincounts fold through a bounded exchange
    (|langs| x 1001 rows), the driver derives each language's exact
    order statistic, and the filter pass broadcasts the tiny
    {lang: threshold} map."""
    from ray.data.aggregate import Sum

    def score_batch(batch: pa.Table) -> pa.Table:
        n_chars, alpha, _, n, uniq = _stats_arrays(batch)
        ratio_u = np.divide(uniq, n, out=np.zeros(len(n)), where=n > 0)
        ratio_a = np.divide(
            alpha, n_chars, out=np.zeros(len(n)), where=n_chars > 0
        )
        length_ok = np.where(n >= 20, 1.0, n / 20.0)
        score = 1000 * (0.4 * ratio_u + 0.4 * ratio_a + 0.2 * length_ok)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "quality_milli": pa.array(
                    np.floor(score + 0.5).astype(np.int64)
                ),
            }
        )

    scores = (
        _read_documents(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(score_batch, batch_format="pyarrow")
        .materialize()
    )

    def hist(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = lang.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        q = batch.column("quality_milli").to_numpy()
        key = codes * 1001 + q
        c = np.bincount(key, minlength=len(enc.dictionary) * 1001)
        nz = np.flatnonzero(c)
        return pa.table(
            {
                "lang": enc.dictionary.take(pa.array(nz // 1001)),
                "bin": pa.array((nz % 1001).astype(np.int64)),
                "cnt": pa.array(c[nz].astype(np.int64)),
            }
        )

    rows = (
        scores.map_batches(hist, batch_format="pyarrow")
        .groupby(["lang", "bin"])
        .aggregate(Sum("cnt"))
        .take_all()
    )  # <= |langs| x 1001 rows by construction
    counts: dict[str, np.ndarray] = {}
    for r in rows:
        counts.setdefault(r["lang"], np.zeros(1001, np.int64))[
            int(r["bin"])
        ] = int(r["sum(cnt)"])
    thr = {
        lang: disc_quantile_from_hist(c, int(c.sum()), pct)
        for lang, c in counts.items()
    }

    def keep(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = lang.dictionary_encode()
        t = np.array(
            [thr.get(v, 0) for v in enc.dictionary.to_pylist()],
            dtype=np.int64,
        )[enc.indices.to_numpy().astype(np.int64)]
        q = batch.column("quality_milli").to_numpy()
        return batch.filter(pa.array(q >= t))

    return scores.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def lang_id_confusion(sf_dir: str):
    """Language-ID quality view: confusion matrix of the stop-word
    language guesser against the corpus's true lang labels.
    (lang, lang_guess, n) sorted by (lang, lang_guess) — the curation
    QA artifact for deciding whether the cheap classifier is fit for a
    mixture. One fused read-and-guess map pass (the lang_id kernel runs
    on the same batch that carries the true label), then a tiny
    |langs|^2 rollup."""
    from ray.data.aggregate import Sum

    def guess_with_label(batch: pa.Table) -> pa.Table:
        guessed = _lang_id_batch(
            batch.select(["doc_id", "text"])
        )
        return pa.table(
            {
                "lang": batch.column("lang"),
                "lang_guess": guessed.column("lang_guess"),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        ).group_by(["lang", "lang_guess"]).aggregate([("one", "sum")])

    agg = (
        _read_documents(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(guess_with_label, batch_format="pyarrow")
        .groupby(["lang", "lang_guess"])
        .aggregate(Sum("one_sum"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "lang_guess": batch.column("lang_guess"),
                "n": batch.column("sum(one_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(
        ["lang", "lang_guess"]
    )


def dsir_importance_weights(sf_dir: str, target_lang: str = "en", n: int = 2):
    """DSIR-style data-selection importance weights (Data Selection via
    Importance Resampling, arXiv:2302.03169) with exact integer
    arithmetic: the target distribution is the corpus slice
    ``lang == target_lang``, the raw distribution is the whole corpus,
    and a document's weight is its hashed-n-gram log importance ratio
    in bits —

        weight_bits(d) = sum_g tf_d(g) * (s_raw(g) - s_target(g)),
        s_X(g) = bit_length(max(T_X, 1) // max(c_X(g), 1))

    i.e. the same integer surprisal stand-in for -log2 p(g) that
    unigram_surprisal uses (bit-identical in DuckDB as
    ``length(bin(...))``), so the oracle hash is exact. Positive weight
    = the doc's n-grams are more probable under the target than under
    the raw corpus — DSIR keeps the top-weight docs. Grams absent from
    the target slice clamp to c_t=1 (maximally surprising), the paper's
    smoothing role. Output (doc_id, n_grams, weight_bits); docs with
    < n words have no grams and are omitted, mirroring the oracle.

    Scale shape (the shared_ngram_counts skeleton): stage 1 emits ONE
    row per distinct (doc, gram) — blake2b word hashes + a rolling
    polynomial combine, lexsort run-length for per-doc tf — so the
    shuffle moves O(distinct (doc,gram)) rows, never the token stream;
    gram identity is a 63-bit hash (collision odds ~ grams^2 / 2^64,
    same accepted identity as shared_ngram_counts). Stage 2 groups by
    gram-hash partition (bounded count, hot grams stay one group's
    problem) and computes per-gram (c_raw, c_target) with run-length
    sums, then folds per-doc PARTIAL (n_grams, weight_bits) sums —
    O(docs) rows out per partition. Stage 3 is one doc-keyed regroup.
    Global totals (T_raw, T_target) come from two Dataset sums over the
    once-materialized stage-1 rows, not a second tokenize pass.
    NOTE: stage-1 rows + totals materialize at CALL time (eager);
    scoring stays lazy."""
    import hashlib

    import pyarrow.compute as pc

    def grams_stage(batch: pa.Table) -> pa.Table:
        """(part, gh, doc_id, tf, tf_t): per-(doc, gram) occurrence
        counts, tf_t = tf when the doc is in the target slice else 0.
        Each doc's words live in one input row, so each (gh, doc_id)
        pair is emitted exactly once globally — stage 2 relies on it."""
        _, _, doc_idx, codes, words = _split_words(batch)
        dids = batch.column("doc_id").to_numpy()
        is_t = pc.equal(
            batch.column("lang"), pa.scalar(target_lang)
        ).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "part": pa.array([], pa.int64()),
                "gh": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "tf_t": pa.array([], pa.int64()),
            }
        )
        if codes.size < n:
            return empty
        dict_hashes = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
                )
                for w in words.to_pylist()
            ),
            dtype=np.uint64,
            count=len(words),
        )
        wh = dict_hashes[codes]
        m = wh.size - n + 1
        valid = doc_idx[:m] == doc_idx[n - 1 :]
        gh = np.zeros(m, np.uint64)
        prime = np.uint64(1099511628211)
        for k in range(n):
            gh = gh * prime + wh[k : m + k]
        gd = doc_idx[:m][valid]
        gh = (gh[valid] & np.uint64((1 << 63) - 1)).astype(np.int64)
        if gd.size == 0:
            return empty
        order = np.lexsort((gh, gd))
        d, h = gd[order], gh[order]
        new = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
        starts = np.flatnonzero(new)
        tf = np.diff(np.r_[starts, d.size]).astype(np.int64)
        out_doc_idx = d[starts]
        tf_t = np.where(is_t[out_doc_idx], tf, 0)
        out_gh = h[starts]
        return pa.table(
            {
                "part": pa.array(out_gh % SHARED_GRAM_PARTITIONS),
                "gh": pa.array(out_gh),
                "doc_id": pa.array(dids[out_doc_idx], pa.int64()),
                "tf": pa.array(tf),
                "tf_t": pa.array(tf_t),
            }
        )

    rows = (
        _read_documents(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(grams_stage, batch_format="pyarrow")
        .materialize()
    )
    t_raw = int(rows.sum("tf") or 0)
    t_t = int(rows.sum("tf_t") or 0)
    if t_raw == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
                "weight_bits": pa.array([], pa.int64()),
            }
        )

    def bits_partials(group: pa.Table) -> pa.Table:
        """Per gram-hash partition: per-gram (c_raw, c_t) by run-length
        sums, then per-doc partial (n_grams, weight_bits)."""
        g = group.take(
            pc.sort_indices(group, sort_keys=[("gh", "ascending")])
        )
        gh = g.column("gh").to_numpy()
        tf = g.column("tf").to_numpy()
        tf_t = g.column("tf_t").to_numpy()
        doc = g.column("doc_id").to_numpy()
        new = np.r_[True, gh[1:] != gh[:-1]]
        gid = np.cumsum(new) - 1
        n_grams_p = np.max(gid) + 1
        c_raw = np.zeros(n_grams_p, np.int64)
        c_t = np.zeros(n_grams_p, np.int64)
        np.add.at(c_raw, gid, tf)
        np.add.at(c_t, gid, tf_t)
        s_raw = _bit_length64(
            (max(t_raw, 1) // np.maximum(c_raw, 1)).astype(np.uint64)
        )
        s_t = _bit_length64(
            (max(t_t, 1) // np.maximum(c_t, 1)).astype(np.uint64)
        )
        delta = (s_raw.astype(np.int64) - s_t.astype(np.int64))[gid]
        uniq, inv = np.unique(doc, return_inverse=True)
        ng = np.zeros(uniq.size, np.int64)
        wb = np.zeros(uniq.size, np.int64)
        np.add.at(ng, inv, tf)
        np.add.at(wb, inv, tf * delta)
        return pa.table(
            {
                "part2": pa.array((uniq % TERM_PARTITIONS).astype(np.int64)),
                "doc_id": pa.array(uniq),
                "n_grams": pa.array(ng),
                "weight_bits": pa.array(wb),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        did = group.column("doc_id").to_numpy()
        uniq, inv = np.unique(did, return_inverse=True)
        ng = np.zeros(uniq.size, np.int64)
        wb = np.zeros(uniq.size, np.int64)
        np.add.at(ng, inv, group.column("n_grams").to_numpy())
        np.add.at(wb, inv, group.column("weight_bits").to_numpy())
        return pa.table(
            {
                "doc_id": pa.array(uniq),
                "n_grams": pa.array(ng),
                "weight_bits": pa.array(wb),
            }
        )

    return (
        rows.groupby("part")
        .map_groups(bits_partials, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(fold, batch_format="pyarrow")
        .sort("doc_id")
    )


#: Default source-mixture weights (epochs per source): >1 upsamples by
#: duplication, <1 downsamples deterministically. __ray_entry__ renders
#: the oracle SQL from THIS dict so the two engines cannot drift.
MIXTURE_WEIGHTS: dict[str, float] = {
    "src0": 2.5,
    "src1": 1.5,
    "src2": 1.0,
    "src3": 0.5,
}
MIXTURE_DEFAULT_WEIGHT = 0.25


def mixture_sample(sf_dir: str, weights: dict[str, float] | None = None):
    """Deterministic source-mixture sampling — the pretraining
    data-mixing primitive (weights = epochs per source, a la the
    LLaMA/GPT-3 mixture tables): each doc is emitted
    ``floor(w) + (lcg(doc_id) < frac(w))`` times, so w=2.5 duplicates
    every doc twice and a deterministic half of them a third time,
    while w=0.25 keeps a quarter. Output (doc_id, lang, source,
    copy_idx with copy_idx in [0, n)), sorted by (doc_id, copy_idx).

    Pure per-batch map — no shuffle, no RNG state, resumable by
    construction (the same doc always gets the same copy count); the
    up-sampled copies materialize only in the OUTPUT stream, so the
    operator streams at any corpus size."""
    import pyarrow.compute as pc

    weights = MIXTURE_WEIGHTS if weights is None else weights

    def fn(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy()
        with np.errstate(over="ignore"):
            h = (did.astype(np.uint64) * np.uint64(_FIB_MULT)) % np.uint64(
                2**32
            )
        enc = pc.dictionary_encode(batch.column("source").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ws = np.array(
            [
                weights.get(s, MIXTURE_DEFAULT_WEIGHT)
                for s in enc.dictionary.to_pylist()
            ],
            np.float64,
        )
        base = np.floor(ws).astype(np.int64)[codes]
        frac_cut = ((ws - np.floor(ws)) * 2**32).astype(np.int64)[codes]
        n = base + (h.astype(np.int64) < frac_cut)
        keep = n > 0
        nk = n[keep]
        total = int(nk.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "copy_idx": pa.array([], pa.int64()),
                }
            )
        idx = np.flatnonzero(keep)
        rep = np.repeat(idx, nk)
        ends = np.cumsum(nk)
        copy_idx = np.arange(total) - np.repeat(ends - nk, nk)
        sel = batch.take(pa.array(rep))
        return pa.table(
            {
                "doc_id": sel.column("doc_id").cast(pa.int64()),
                "lang": sel.column("lang"),
                "source": sel.column("source"),
                "copy_idx": pa.array(copy_idx, pa.int64()),
            }
        )

    return (
        _read_documents(sf_dir, ["doc_id", "lang", "source"])
        .map_batches(fn, batch_format="pyarrow")
        .sort(["doc_id", "copy_idx"])
    )
