"""Posting-list codecs: delta-gap + VByte (z=1), zlib (z=2), block layout.

z=1 is bit-exact to the reference's ``SimpleCompression``
(``/root/reference/selfindex_z1_simple_compression.py:18-83``): big-endian
7-bit groups, high bit set on the *last* byte of each value, ``0``
encoding to ``b'\\x80'``; delta coding stores the first value followed by
successive gaps.  z=2 is the reference's ``LibraryCompression``
(``selfindex_z2_lib_compression.py:21-65``): 4-byte native uint32 pack +
zlib (level 6 plain / level 9 with delta).  Both codecs must decode any
sorted posting list to the same ints (``verify_compression.py:82-105``).

The block layout extends z=1 for the scale path (SURVEY.md §2.3 B8/B9):
fixed-size blocks of postings, each block carrying ``(last_doc_id,
max_impact)`` metadata so the query kernel can skip whole blocks whose
BM25 upper bound ``idf * max_impact`` cannot reach the running top-k
threshold (block-max WAND).  Encoding runs vectorized with numpy inside
pandas UDF batches.
"""

from __future__ import annotations

import zlib
from typing import List, Sequence

import numpy as np

BLOCK_SIZE = 128


# ---------------------------------------------------------------- z=1 VByte

def vbyte_encode(numbers: Sequence[int]) -> bytes:
    """VByte-encode non-negative ints (reference ``encode_list``)."""
    out = bytearray()
    for n in numbers:
        if n == 0:
            out.append(0x80)
            continue
        stack = []
        while n > 0:
            stack.append(n & 0x7F)
            n >>= 7
        stack[0] |= 0x80
        out.extend(reversed(stack))
    return bytes(out)


def vbyte_decode(data: bytes) -> List[int]:
    """Decode VByte stream (reference ``decode_list``)."""
    numbers = []
    current = 0
    for byte in data:
        if byte & 0x80:
            numbers.append((current << 7) | (byte & 0x7F))
            current = 0
        else:
            current = (current << 7) | byte
    return numbers


def delta_encode(numbers: Sequence[int]) -> bytes:
    """First value + successive gaps, VByte-packed (reference
    ``encode_delta``; requires sorted ascending input for non-negative
    gaps)."""
    if not len(numbers):
        return b""
    arr = np.asarray(numbers, dtype=np.int64)
    deltas = np.empty_like(arr)
    deltas[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=deltas[1:])
    return vbyte_encode(deltas.tolist())


def delta_decode(data: bytes) -> List[int]:
    if not data:
        return []
    return np.cumsum(np.asarray(vbyte_decode(data), dtype=np.int64)).tolist()


# ---------------------------------------------------------------- z=2 zlib

def zlib_encode(numbers: Sequence[int]) -> bytes:
    return zlib.compress(
        np.asarray(numbers, dtype="<u4").tobytes(), 6
    )


def zlib_decode(data: bytes) -> List[int]:
    return np.frombuffer(zlib.decompress(data), dtype="<u4").astype(np.int64).tolist()


def zlib_delta_encode(numbers: Sequence[int]) -> bytes:
    if not len(numbers):
        return b""
    arr = np.asarray(numbers, dtype=np.int64)
    deltas = np.empty_like(arr)
    deltas[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=deltas[1:])
    return zlib.compress(deltas.astype("<u4").tobytes(), 9)


def zlib_delta_decode(data: bytes) -> List[int]:
    if not data:
        return []
    deltas = np.frombuffer(zlib.decompress(data), dtype="<u4").astype(np.int64)
    return np.cumsum(deltas).tolist()


# ------------------------------------------------------------- block layout

def encode_block(doc_ids: Sequence[int], tfs: Sequence[int],
                 doc_lens: Sequence[int]) -> tuple[bytes, bytes, bytes]:
    """One posting block -> (doc_gap_blob, tf_blob, doc_len_blob)."""
    return delta_encode(doc_ids), vbyte_encode(list(tfs)), vbyte_encode(list(doc_lens))


def decode_block(doc_blob: bytes, tf_blob: bytes, len_blob: bytes):
    """-> (doc_ids, tfs, doc_lens) as int64 numpy arrays."""
    doc_ids = np.asarray(delta_decode(doc_blob), dtype=np.int64)
    tfs = np.asarray(vbyte_decode(tf_blob), dtype=np.int64)
    doc_lens = np.asarray(vbyte_decode(len_blob), dtype=np.int64)
    return doc_ids, tfs, doc_lens


def bm25_impact(tfs: np.ndarray, doc_lens: np.ndarray, avg_doc_len: float,
                k1: float, b: float) -> np.ndarray:
    """Per-posting BM25 partial impact (score / idf); the block max of
    this is the stored block-max metadata."""
    tfs = tfs.astype(np.float64)
    return tfs * (k1 + 1) / (tfs + k1 * (1 - b + b * (doc_lens / avg_doc_len)))


def uncompressed_bytes(n_postings: int) -> int:
    """Reference accounting baseline: 4 bytes per posting
    (``selfindex_z1_simple_compression.py:180-215``)."""
    return 4 * n_postings
