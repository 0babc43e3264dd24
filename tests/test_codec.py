import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.codec import (
    block_maxes,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    # classic LEB128 vectors
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([1], dtype=np.uint64)) == b"\x01"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([], dtype=np.uint64)) == b""


def test_varint_roundtrip_extremes():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1,
                     2**64 - 1], dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert varint_decode(varint_encode(vals)).tolist() == xs


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**62), min_size=1,
               max_size=300),
       st.integers(min_value=1, max_value=1000))
def test_postings_roundtrip_property(idset, tfbase):
    doc_ids = np.array(sorted(idset), dtype=np.uint64)
    rng = np.random.default_rng(tfbase)
    tfs = rng.integers(1, tfbase + 1, size=doc_ids.size).astype(np.uint64)
    blob = encode_postings(doc_ids, tfs)
    out_ids, out_tfs = decode_postings(blob)
    assert out_ids.tolist() == doc_ids.astype(np.int64).tolist()
    assert out_tfs.tolist() == tfs.astype(np.int64).tolist()


def test_postings_reject_unsorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([5, 3], dtype=np.uint64),
                        np.array([1, 1], dtype=np.uint64))
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 3], dtype=np.uint64),
                        np.array([1, 1], dtype=np.uint64))


def test_postings_empty():
    assert encode_postings(np.empty(0, np.uint64), np.empty(0, np.uint64)) == b""
    ids, tfs = decode_postings(b"")
    assert ids.size == 0 and tfs.size == 0


def test_compression_beats_raw():
    # dense doc ids -> small deltas -> way under 16 bytes/posting
    ids = np.arange(0, 100000, 3, dtype=np.uint64)
    tfs = np.ones(ids.size, dtype=np.uint64)
    blob = encode_postings(ids, tfs)
    assert len(blob) < ids.size * 3  # ~2 bytes/posting here

def test_block_maxes():
    ids = np.arange(1, 301, dtype=np.int64)
    tfs = np.ones(300, dtype=np.int64)
    tfs[5] = 9
    tfs[250] = 7
    last, mx = block_maxes(ids, tfs, block=128)
    assert last.tolist() == [128, 256, 300]
    assert mx.tolist() == [9, 7, 1]  # pos 250 falls in block 1 (128..255)
