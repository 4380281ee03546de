"""Property tests (hypothesis) mirroring the reference's proptest suite
(tests/property_tests.rs: tokenizer totality, query robustness, avgdl) plus
codec round-trip invariants. No Ray needed — pure kernels."""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings, strategies as st

# derandomized: the driver's correctness gate runs this suite; example
# generation must not vary between runs
settings.register_profile("stable", derandomize=True)
settings.load_profile("stable")

from probe_ray.index.codec import (
    BLOCK,
    block_meta,
    decode_selected_blocks,
    decode_varint_deltas,
    encode_varint_deltas,
    encode_varint_deltas_multi,
    pack_tf,
    unpack_tf,
)
from probe_ray.query.bm25 import create_query_plan
from probe_ray.query.parser import parse_query
from probe_ray.tokenize.tables import SPECIAL_CASE_WORDS
from probe_ray.tokenize.tokenizer import preprocess_text_with_filename, tokenize

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_tokenizer_total_and_deduped(text):
    """tokenize() never raises, never emits duplicates or empty strings,
    and is deterministic."""
    toks = tokenize(text)
    assert len(toks) == len(set(toks))
    assert all(isinstance(t, str) and t for t in toks)
    assert toks == tokenize(text)


@settings(max_examples=150, deadline=None)
@given(text_st, text_st)
def test_preprocess_tf_bounded(code, path):
    """TF of any term in content++path tokens is at most 2 (SURVEY H1)."""
    toks = preprocess_text_with_filename(code, path)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    assert all(v <= 2 for v in counts.values())


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_query_parser_total(q):
    """Any input either parses (fallbacks included,
    elastic_query.rs:913-963) or raises ParseError — never any other
    exception — and deterministically so. The search layer maps
    ParseError to an empty result (searcher.py:search_many)."""
    from probe_ray.query.parser import ParseError

    def attempt():
        try:
            return repr(parse_query(q)), None
        except ParseError as e:
            return None, str(e)

    a1 = attempt()
    a2 = attempt()
    assert a1 == a2
    if a1[0] is not None:
        plan = create_query_plan(q)
        assert list(plan.term_indices) == sorted(plan.term_indices)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=700
    )
)
def test_codec_roundtrip(ids):
    arr = np.unique(np.asarray(ids, dtype=np.uint64))
    payload = encode_varint_deltas(arr)
    assert np.array_equal(decode_varint_deltas(payload, len(arr)), arr)
    # selected-block decode agrees with full decode
    nblocks = (len(arr) + BLOCK - 1) // BLOCK
    sel = np.arange(0, nblocks, 2)
    got_ids, got_pos = decode_selected_blocks(payload, len(arr), sel)
    assert np.array_equal(got_ids, np.concatenate(
        [arr[b * BLOCK : (b + 1) * BLOCK] for b in sel]
    ) if len(sel) else np.empty(0, np.uint64))
    assert np.array_equal(arr[got_pos], got_ids)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=2**40),
            min_size=1,
            max_size=300,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_multi_codec_matches_single(groups):
    arrays = [np.unique(np.asarray(g, dtype=np.uint64)) for g in groups]
    vals = np.concatenate(arrays)
    lens = np.array([len(a) for a in arrays])
    assert encode_varint_deltas_multi(vals, lens) == [
        encode_varint_deltas(a) for a in arrays
    ]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2), min_size=1, max_size=600))
def test_tf_bitmap_roundtrip(tfs):
    arr = np.asarray(tfs)
    assert np.array_equal(unpack_tf(pack_tf(arr), len(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=1, max_value=2), min_size=1, max_size=70),
        min_size=0,
        max_size=8,
    )
)
def test_pack_tf_multi_matches_single(groups):
    from probe_ray.index.codec import pack_tf_multi

    arrays = [np.asarray(g, dtype=np.uint8) for g in groups]
    flat = np.concatenate(arrays) if arrays else np.empty(0, dtype=np.uint8)
    lens = np.array([len(a) for a in arrays], dtype=np.int64)
    assert pack_tf_multi(flat, lens) == [pack_tf(a) for a in arrays]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=600
    ),
    st.data(),
)
def test_block_meta_invariants(ids, data):
    arr = np.unique(np.asarray(ids, dtype=np.uint64))
    tfs = np.asarray(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=2),
                min_size=len(arr),
                max_size=len(arr),
            )
        ),
        dtype=np.uint8,
    )
    last_b, maxtf_b = block_meta(arr, tfs)
    last = np.frombuffer(last_b, np.uint64)
    maxtf = np.frombuffer(maxtf_b, np.uint8)
    nblocks = (len(arr) + BLOCK - 1) // BLOCK
    assert len(last) == len(maxtf) == nblocks
    assert last[-1] == arr[-1]
    assert np.all(np.diff(last.astype(np.int64)) > 0) or nblocks == 1
    for b in range(nblocks):
        blk = tfs[b * BLOCK : (b + 1) * BLOCK]
        assert maxtf[b] == blk.max()


# a term the hybrid path treats as an ACTIVE special (alnum-only unit);
# include case-folding trouble: dotted/dotless I, sharp s, Kelvin sign
_tricky_chars = st.characters(
    whitelist_categories=("Lu", "Ll", "Nd"),
    whitelist_characters="İıßẞK",
)
_term_st = st.text(alphabet=_tricky_chars, min_size=1, max_size=8)
_body_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=300, deadline=None)
@given(_body_st, _body_st, _term_st)
def test_unit_candidate_soundness(content, path, term):
    """The unit-postings candidate rule (search/hybrid.py): if a dynamic
    special term changes a document's tokenization, the lowercased term
    must be a substring of one of the doc's lowercased alnum units —
    otherwise the index-served candidate set would silently miss a doc
    whose score shifts under the query context."""
    from probe_ray.search.hybrid import _UNIT_RE
    from probe_ray.tokenize.tables import SPECIAL_CASE_WORDS
    from probe_ray.tokenize.tokenizer import _ALNUM_RUNS

    t = term.lower()
    if not _UNIT_RE.match(t) or t in SPECIAL_CASE_WORDS:
        return  # inactive special: hybrid asserts tokenization is unchanged
    sp = frozenset({t})
    d = preprocess_text_with_filename(content, path)
    c = preprocess_text_with_filename(content, path, sp)
    if d != c:
        units = {u.lower() for u in _ALNUM_RUNS.findall(content)}
        units.update(u.lower() for u in _ALNUM_RUNS.findall(path))
        assert any(t in u for u in units), (t, content, path)


_UNIT_RE_T = re.compile(r"[^\W_]+\Z", re.UNICODE)
_nonunit_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=10
).filter(lambda s: not _UNIT_RE_T.match(s.lower()))


@settings(max_examples=200, deadline=None)
@given(_body_st, _nonunit_st)
def test_inactive_special_changes_nothing(content, term):
    """Non-unit special terms (spaces/punct/underscore) can never match an
    alnum run, so the hybrid path runs those queries as pure index
    queries — valid only if they truly never alter tokenization."""
    d = preprocess_text_with_filename(content, "p.py")
    c = preprocess_text_with_filename(content, "p.py", frozenset({term.lower()}))
    assert d == c, (term,)


@settings(max_examples=200, deadline=None)
@given(_body_st, st.sampled_from(sorted(SPECIAL_CASE_WORDS)))
def test_static_special_case_changes_nothing(content, word):
    """STATIC special-case words are in every tokenizer table already —
    adding them as dynamic specials must be a tokenization no-op (the
    hybrid answers those quoted terms from the index alone)."""
    d = preprocess_text_with_filename(content, "p.py")
    c = preprocess_text_with_filename(content, "p.py", frozenset({word}))
    assert d == c, (word,)


# --- pattern matcher totality + match invariants ---------------------------

_pat_piece = st.sampled_from(
    ["fn ", "$NAME", "$$$", "$$$ARGS", "(", ")", "{", "}", " ", "foo",
     "= ", ";", "$A", "->"]
)
_src_st = st.text(
    alphabet="abfnoparens(){};=$->_ \n", min_size=0, max_size=200
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_pat_piece, min_size=1, max_size=6), _src_st)
def test_pattern_matcher_total_and_sound(pieces, src):
    """compile_pattern/finditer never crash; matches are in-bounds,
    non-overlapping, ordered, and non-empty; every literal word of the
    pattern appears (case-sensitively) inside its match."""
    from probe_ray.search.pattern import _META, compile_pattern

    pattern = "".join(pieces)
    p = compile_pattern(pattern)
    prev_end = 0
    words = [w for w in _META.sub(" ", pattern).split() if w.isalnum()]
    for m in p.finditer(src):
        assert 0 <= m.start() < m.end() <= len(src)
        assert m.start() >= prev_end  # non-overlapping, ordered
        prev_end = m.end()
        assert src[m.start():m.end()] == m.group(0)
        for w in words:
            assert w in m.group(0)


_word_st = st.text(alphabet="ab ", min_size=0, max_size=12)
_docs_st = st.lists(_word_st, min_size=1, max_size=12)


@settings(max_examples=150, deadline=None)
@given(_docs_st)
def test_strip_dup_windows_property(texts):
    """dedup_spans' rewrite kernel vs a scalar reference on random tiny
    corpora (alphabet chosen to force shared n-grams): identical
    covered-word masks, span counts and rebuilt text for n=2."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from probe_ray.ops import text as textmod

    n = 2
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    # shared-gram set from the scalar definition
    prime = 1099511628211

    def wh(w):
        return int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
        )

    def words_of(s):
        s2 = s.strip()
        return s2.split() if s2 else [""]

    gram_docs = {}
    for did, tx in enumerate(texts):
        ws = words_of(tx)
        hs = [wh(w) for w in ws]
        for i in range(len(ws) - n + 1):
            g = 0
            for k in range(n):
                g = (g * prime + hs[i + k]) % (1 << 64)
            gram_docs.setdefault(g & ((1 << 63) - 1), set()).add(did)
    shared = {g for g, d in gram_docs.items() if len(d) >= 2}

    def is_dup(gh, _doc):
        return np.array([int(g) in shared for g in gh], dtype=bool)

    got = textmod._strip_dup_windows(batch, n, is_dup).to_pylist()

    for did, tx in enumerate(texts):
        ws = words_of(tx)
        hs = [wh(w) for w in ws]
        cov = [False] * len(ws)
        for i in range(len(ws) - n + 1):
            g = 0
            for k in range(n):
                g = (g * prime + hs[i + k]) % (1 << 64)
            if (g & ((1 << 63) - 1)) in shared:
                for j in range(i, i + n):
                    cov[j] = True
        row = got[did]
        assert row["doc_id"] == did
        assert row["n_words"] == len(ws)
        assert row["n_dup_words"] == sum(cov)
        assert row["n_spans"] == sum(
            1 for i, c in enumerate(cov) if c and (i == 0 or not cov[i - 1])
        )
        assert row["clean_text"] == " ".join(
            w for w, c in zip(ws, cov) if not c
        )
