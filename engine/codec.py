"""Varint/delta posting-list codec (vectorized NumPy, no per-element Python).

Replaces the reference's comma-joined posting strings ``doc1:tf1,doc2:tf2``
(written by the missing Indexer, parsed at
searchEngine/src/cis5550/search/Searcher.java:80-101) with the standard
IR-engine layout mandated by BASELINE.json north_star:

    postings = varint( [doc_ids[0], tf[0], delta1, tf[1], delta2, tf[2], ...] )

Doc ids must be strictly ascending (deltas > 0 after the first), tfs >= 1.
LEB128 little-endian varints. Alongside the blob we keep per-block metadata
(last_doc_id, max_tf per block of BLOCK_SIZE postings) for block-max WAND.

Everything here is pure NumPy so it is unit-testable without Spark and fast
inside Arrow-batched pandas UDFs. The encode/decode loops iterate over *byte
positions* (<=10 for uint64), never over elements.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_U7 = np.uint64(7)
_U0x7F = np.uint64(0x7F)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized: O(10) numpy passes."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    # byte length of each value: 1 + floor(bits/7) for bits > 7
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp = tmp >> _U7
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nbytes
    cur = v.copy()
    # write byte k of every value that has >= k+1 bytes
    alive = np.arange(n)
    pos = starts.copy()
    k = 0
    while alive.size:
        has_more = nbytes[alive] > (k + 1)
        byte = (cur[alive] & _U0x7F).astype(np.uint8)
        byte[has_more] |= 0x80
        out[pos[alive]] = byte
        pos[alive] += 1
        cur[alive] = cur[alive] >> _U7
        alive = alive[has_more]
        k += 1
    return out.tobytes()


def varint_decode(blob: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array. Vectorized."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (raw & 0x80) == 0
    # value index of each byte = number of ends strictly before it
    val_idx = np.concatenate(([0], np.cumsum(is_end)[:-1]))
    n_vals = int(is_end.sum())
    # byte position within its value
    starts_of_vals = np.concatenate(([0], np.flatnonzero(is_end)[:-1] + 1))
    pos_in_val = np.arange(raw.size) - starts_of_vals[val_idx]
    payload = (raw & 0x7F).astype(np.uint64) << (pos_in_val.astype(np.uint64) * _U7)
    out = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(out, val_idx, payload)  # bitwise-OR equivalent: shifts disjoint
    return out


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode sorted (doc_ids, tfs) into one delta/varint blob."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    if doc_ids.size == 0:
        return b""
    if doc_ids.size > 1 and not (doc_ids[1:] > doc_ids[:-1]).all():
        raise ValueError("doc_ids must be strictly ascending")
    deltas = np.empty_like(doc_ids)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    interleaved = np.empty(doc_ids.size * 2, dtype=np.uint64)
    interleaved[0::2] = deltas
    interleaved[1::2] = tfs
    return varint_encode(interleaved)


def decode_postings(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a postings blob -> (doc_ids int64 asc, tfs int64)."""
    flat = varint_decode(blob)
    if flat.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if flat.size % 2:
        raise ValueError("corrupt postings blob: odd varint count")
    deltas = flat[0::2]
    tfs = flat[1::2].astype(np.int64)
    doc_ids = np.cumsum(deltas, dtype=np.uint64).astype(np.int64)
    return doc_ids, tfs


def block_maxes(doc_ids: np.ndarray, tfs: np.ndarray,
                block: int = BLOCK_SIZE) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (last_doc_id, max_tf) over sorted postings, for WAND."""
    n = doc_ids.size
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    n_blocks = (n + block - 1) // block
    last_ids = doc_ids[np.minimum(np.arange(1, n_blocks + 1) * block, n) - 1]
    max_tfs = np.array(
        [tfs[i * block:(i + 1) * block].max() for i in range(n_blocks)],
        dtype=np.int64,
    )
    return np.asarray(last_ids, dtype=np.int64), max_tfs
