"""Property-based tests (hypothesis) for the varint codec and the
segmented-cumsum list decode used by the scorer — the invariants the whole
index format rests on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from igd_spark import codec


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(arr))
    assert out.dtype == np.uint64
    assert out.tolist() == vals


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_doc_id_roundtrip(vals):
    d = np.array(sorted(vals), dtype=np.int64)
    assert codec.decode_doc_ids(codec.encode_doc_ids(d)).tolist() == d.tolist()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=50, unique=True),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_concat_decode_segmented_cumsum(blocks):
    """The scorer's one-pass list decode: concatenating per-block delta
    buffers and applying a segmented cumsum must equal per-block decode."""
    blocks = [np.array(sorted(b), dtype=np.int64) for b in blocks]
    bufs = [codec.encode_doc_ids(b) for b in blocks]
    n_arr = np.array([b.size for b in blocks], dtype=np.int64)
    vals = codec.varint_decode(b"".join(bufs)).astype(np.int64)
    ends = np.cumsum(n_arr)
    c = np.cumsum(vals)
    seg_off = np.concatenate(([0], c[ends[:-1] - 1]))
    d = c - np.repeat(seg_off, n_arr)
    want = np.concatenate(blocks)
    assert d.tolist() == want.tolist()


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_tokenizer_oracle_is_total(text):
    """The python-oracle tokenizer never crashes and produces only non-empty
    lowercase alnum tokens (spec in FIXTURES.md §5)."""
    import re

    from igd_spark.oracle import tokenize

    for t in tokenize(text):
        # only [a-z0-9] runs survive the split regex
        assert re.fullmatch(r"[a-z0-9]+", t), t


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=300),
    st.lists(st.integers(min_value=0, max_value=299), max_size=8),
)
@settings(max_examples=150, deadline=None)
def test_varint_encode_offsets_slicing(values, cuts):
    """stream[off[i]:off[j]] must equal varint_encode(values[i:j]) for any
    cut points — the contract the one-shot block packer relies on."""
    v = np.array(values, dtype=np.uint64)
    stream, off = codec.varint_encode_offsets(v)
    assert stream == codec.varint_encode(v)
    assert len(off) == v.size + 1 and off[0] == 0 and off[-1] == len(stream)
    bounds = sorted({0, v.size, *[c for c in cuts if c <= v.size]})
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        assert stream[off[lo]:off[hi]] == codec.varint_encode(v[lo:hi])
        assert codec.varint_decode(stream[off[lo]:off[hi]]).tolist() == v[lo:hi].tolist()
