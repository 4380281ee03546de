"""Property tests (hypothesis) mirroring the reference's proptest suite
(tests/property_tests.rs: tokenizer totality, query robustness, avgdl) plus
codec round-trip invariants. No Ray needed — pure kernels."""

from __future__ import annotations

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
