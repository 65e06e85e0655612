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

def _vbyte_encode_scalar(numbers: Sequence[int]) -> bytes:
    """Bit-exact transliteration of the reference ``encode_list``
    (``selfindex_z1_simple_compression.py:18-41``) — kept as the codec
    spec; the vectorized :func:`vbyte_encode` must match it byte-for-
    byte (tested in tests/test_codec.py)."""
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


def _vbyte_decode_scalar(data: bytes) -> List[int]:
    """Reference ``decode_list`` (``selfindex_z1…:43-57``); spec twin of
    :func:`vbyte_decode`."""
    numbers = []
    current = 0
    for byte in data:
        if byte & 0x80:
            numbers.append((current << 7) | (byte & 0x7F))
            current = 0
        else:
            current = (current << 7) | byte
    return numbers


_U7 = np.uint64(7)
_U7F = np.uint64(0x7F)
_U80 = np.uint64(0x80)


def vbyte_encode_with_value_lengths(numbers) -> tuple[bytes, np.ndarray]:
    """VByte-encode non-negative ints, also returning the encoded byte
    length of EACH value — lets callers slice one encoded stream into
    per-run blobs (byte-identical to encoding each run separately,
    since VByte encodes values independently)."""
    arr = np.asarray(numbers, dtype=np.uint64)
    n = arr.size
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    lengths = np.ones(n, dtype=np.int64)
    v = arr >> _U7
    while v.any():
        lengths += v > 0
        v >>= _U7
    ends = np.cumsum(lengths)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    pos = ends - 1
    v = arr.copy()
    # last (terminator) byte of every value: low 7 bits | 0x80
    out[pos] = ((v & _U7F) | _U80).astype(np.uint8)
    v >>= _U7
    active = v > 0
    pos -= 1
    while active.any():
        idx = np.nonzero(active)[0]
        out[pos[idx]] = (v[idx] & _U7F).astype(np.uint8)
        v >>= _U7
        active = v > 0
        pos -= 1
    return out.tobytes(), lengths


def vbyte_encode(numbers) -> bytes:
    """VByte-encode non-negative ints — numpy-vectorized (the loop runs
    over byte *positions*, max 10 iterations, not over values)."""
    return vbyte_encode_with_value_lengths(numbers)[0]


def vbyte_decode_np(data: bytes) -> np.ndarray:
    """Decode VByte stream -> int64 array (vectorized)."""
    if not data:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(data, dtype=np.uint8)
    is_last = (b & 0x80) > 0
    ends = np.nonzero(is_last)[0]
    if ends.size == 0:
        return np.empty(0, dtype=np.int64)
    # drop a trailing incomplete value (reference decoder behavior)
    valid = np.arange(b.size) <= ends[-1]
    b = b[valid]
    is_last = is_last[valid]
    gid = np.zeros(b.size, dtype=np.int64)
    gid[1:] = np.cumsum(is_last[:-1])
    shifts = (_U7 * (ends[gid] - np.arange(b.size)).astype(np.uint64))
    vals = (b & np.uint8(0x7F)).astype(np.uint64) << shifts
    out = np.zeros(ends.size, dtype=np.uint64)
    np.bitwise_or.at(out, gid, vals)
    return out.astype(np.int64)


def vbyte_decode(data: bytes) -> List[int]:
    """Decode VByte stream (reference ``decode_list`` semantics)."""
    return vbyte_decode_np(data).tolist()


def delta_encode(numbers) -> bytes:
    """First value + successive gaps, VByte-packed (reference
    ``encode_delta``; requires sorted ascending input for non-negative
    gaps)."""
    arr = np.asarray(numbers, dtype=np.int64)
    if not arr.size:
        return b""
    deltas = np.empty_like(arr)
    deltas[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=deltas[1:])
    return vbyte_encode(deltas)


def delta_decode_np(data: bytes) -> np.ndarray:
    if not data:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(vbyte_decode_np(data))


def delta_decode(data: bytes) -> List[int]:
    return delta_decode_np(data).tolist()


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

def encode_block(doc_ids, tfs, doc_lens, codec: str = "vbyte") -> tuple[bytes, bytes, bytes]:
    """One posting block -> (doc_gap_blob, tf_blob, doc_len_blob).

    ``codec='vbyte'`` is the reference z=1 layout (delta + VByte);
    ``codec='zlib'`` the z=2 layout (delta + zlib level 9 for doc ids,
    plain zlib level 6 for the tf/len streams) — both decode to
    identical postings (``verify_compression.py:82-105``).  z=2 packs
    uint32 like the reference, so it requires doc_id < 2^32 (z=1 is the
    64-bit-safe default for the 10^12-doc regime)."""
    if codec == "vbyte":
        return delta_encode(doc_ids), vbyte_encode(tfs), vbyte_encode(doc_lens)
    if codec == "zlib":
        return (
            zlib_delta_encode(doc_ids),
            zlib_encode(tfs),
            zlib_encode(doc_lens),
        )
    raise ValueError(f"unknown codec {codec!r}")


def decode_block(doc_blob: bytes, tf_blob: bytes, len_blob: bytes,
                 codec: str = "vbyte"):
    """-> (doc_ids, tfs, doc_lens) as int64 numpy arrays."""
    if codec == "vbyte":
        return (
            delta_decode_np(doc_blob),
            vbyte_decode_np(tf_blob),
            vbyte_decode_np(len_blob),
        )
    if codec == "zlib":
        return (
            np.asarray(zlib_delta_decode(doc_blob), dtype=np.int64),
            np.asarray(zlib_decode(tf_blob), dtype=np.int64),
            np.asarray(zlib_decode(len_blob), dtype=np.int64),
        )
    raise ValueError(f"unknown codec {codec!r}")


def encode_positions(flat_positions, counts, codec: str = "vbyte") -> bytes:
    """Position streams for a posting run -> one blob.

    ``flat_positions`` is the concatenation of every posting's sorted
    position array; ``counts`` is positions-per-posting (== the tf
    stream, one position per occurrence — no separate count stream is
    stored).  Layout: per posting, first position absolute then gaps
    (delta resets at posting boundaries), VByte- or zlib-packed.
    Fully vectorized: the boundary resets are one fancy-index write."""
    a = np.asarray(flat_positions, dtype=np.int64)
    if a.size == 0:
        return b""
    cnts = np.asarray(counts, dtype=np.int64)
    starts = np.zeros(cnts.size, dtype=np.int64)
    starts[1:] = np.cumsum(cnts[:-1])
    starts = starts[cnts > 0]
    d = a.copy()
    d[1:] -= a[:-1]
    d[starts] = a[starts]
    if codec == "vbyte":
        return vbyte_encode(d)
    if codec == "zlib":
        return zlib.compress(d.astype("<u4").tobytes(), 6)
    raise ValueError(f"unknown codec {codec!r}")


def decode_positions(blob: bytes, counts, codec: str = "vbyte") -> np.ndarray:
    """Inverse of :func:`encode_positions`: -> flat int64 position array
    (split it with ``counts`` to recover per-posting arrays)."""
    cnts = np.asarray(counts, dtype=np.int64)
    if codec == "vbyte":
        d = vbyte_decode_np(blob)
    elif codec == "zlib":
        d = (
            np.frombuffer(zlib.decompress(blob), dtype="<u4").astype(np.int64)
            if blob
            else np.empty(0, dtype=np.int64)
        )
    else:
        raise ValueError(f"unknown codec {codec!r}")
    if d.size == 0:
        return d
    c = np.cumsum(d)
    nz = cnts[cnts > 0]
    starts = np.zeros(nz.size, dtype=np.int64)
    starts[1:] = np.cumsum(nz[:-1])
    grp_base = np.zeros(nz.size, dtype=np.int64)
    grp_base[1:] = c[starts[1:] - 1]
    return c - np.repeat(grp_base, nz)


def encode_runs(doc_ids, tfs, doc_lens, run_starts, run_ends,
                flat_positions=None):
    """Encode EVERY (term-)run of a sorted posting group in one
    vectorized pass per stream (vbyte layout).  ``run_starts/run_ends``
    index the run boundaries in the group arrays.  Returns per-run
    lists ``(doc_blobs, tf_blobs, len_blobs, pos_blobs_or_None)`` —
    byte-identical to calling :func:`encode_block` /
    :func:`encode_positions` per run (VByte encodes values
    independently, so one encoded stream slices cleanly at value
    boundaries), but without a Python loop per run over numpy calls."""
    d = np.asarray(doc_ids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    l = np.asarray(doc_lens, dtype=np.int64)
    starts = np.asarray(run_starts, dtype=np.int64)
    ends = np.asarray(run_ends, dtype=np.int64)

    gaps = d.copy()
    gaps[1:] -= d[:-1]
    gaps[starts] = d[starts]  # delta resets at run boundaries

    def stream_slices(values):
        blob, lens = vbyte_encode_with_value_lengths(values)
        off = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        return [blob[off[s]:off[e]] for s, e in zip(starts, ends)]

    doc_blobs = stream_slices(gaps)
    tf_blobs = stream_slices(t)
    len_blobs = stream_slices(l)

    pos_blobs = None
    if flat_positions is not None:
        p = np.asarray(flat_positions, dtype=np.int64)
        # posting i owns positions [pcum[i], pcum[i+1]) — tf positions each
        pcum = np.zeros(t.size + 1, dtype=np.int64)
        np.cumsum(t, out=pcum[1:])
        dpos = p.copy()
        if p.size:
            dpos[1:] -= p[:-1]
            post_starts = pcum[:-1][t > 0]
            dpos[post_starts] = p[post_starts]  # delta resets per posting
        blob, plens = vbyte_encode_with_value_lengths(dpos)
        poff = np.zeros(plens.size + 1, dtype=np.int64)
        np.cumsum(plens, out=poff[1:])
        pos_blobs = [
            blob[poff[pcum[s]]:poff[pcum[e]]] for s, e in zip(starts, ends)
        ]
    return doc_blobs, tf_blobs, len_blobs, pos_blobs


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
