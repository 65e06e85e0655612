"""Codec tests (FIXTURES.md §4; reference ``verify_compression.py``)."""

import hypothesis.strategies as st
import numpy as np
from hypothesis import given, settings

from elasticsearch_spark.functions.codec import (
    bm25_impact,
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    vbyte_decode,
    vbyte_encode,
    zlib_decode,
    zlib_delta_decode,
    zlib_delta_encode,
    zlib_encode,
)

EDGE_LISTS = [
    [],
    [0],
    [0, 1, 2],
    [2**31 - 1],
    [127, 128, 16383, 16384],
    list(range(100)),             # dense, gap=1
    [0, 10**6, 2 * 10**6],        # sparse
    [42],
]


def test_vbyte_zero_byte():
    # reference: 0 encodes to the single byte 0x80
    assert vbyte_encode([0]) == b"\x80"


def test_edge_lists_roundtrip():
    for lst in EDGE_LISTS:
        assert vbyte_decode(vbyte_encode(lst)) == lst
        assert delta_decode(delta_encode(lst)) == lst
        assert zlib_delta_decode(zlib_delta_encode(lst)) == lst
        if lst:
            assert zlib_decode(zlib_encode(lst)) == lst


def test_vbyte_boundaries():
    # 127 -> 1 byte, 128 -> 2 bytes (7-bit groups, high bit terminates)
    assert vbyte_encode([127]) == bytes([0x7F | 0x80])
    assert vbyte_encode([128]) == bytes([0x01, 0x00 | 0x80])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=1000))
def test_roundtrip_property(values):
    sorted_vals = sorted(values)
    assert vbyte_decode(vbyte_encode(values)) == values
    # delta coding requires sorted input (posting lists are sorted)
    assert delta_decode(delta_encode(sorted_vals)) == sorted_vals
    # z1 and z2 must agree (verify_compression.py:82-105)
    assert zlib_delta_decode(zlib_delta_encode(sorted_vals)) == delta_decode(
        delta_encode(sorted_vals)
    )


def test_block_roundtrip_and_impact():
    doc_ids = [3, 17, 18, 400, 100000]
    tfs = [1, 5, 2, 1, 9]
    lens = [30, 800, 55, 41, 120]
    blobs = encode_block(doc_ids, tfs, lens)
    d, t, ln = decode_block(*blobs)
    assert d.tolist() == doc_ids and t.tolist() == tfs and ln.tolist() == lens

    imp = bm25_impact(t, ln, avg_doc_len=100.0, k1=1.2, b=0.75)
    # impact is score/idf: tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    expect0 = 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 30 / 100))
    assert abs(imp[0] - expect0) < 1e-12
    assert imp.max() <= 1.2 + 1  # bounded by k1+1


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62 - 1), min_size=0, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_vectorized_matches_scalar_reference(values):
    """The numpy codec must be byte-identical to the scalar reference
    transliteration (selfindex_z1_simple_compression.py:18-57)."""
    from elasticsearch_spark.functions.codec import (
        _vbyte_decode_scalar,
        _vbyte_encode_scalar,
    )

    blob = vbyte_encode(values)
    assert blob == _vbyte_encode_scalar(values)
    assert vbyte_decode(blob) == _vbyte_decode_scalar(blob) == values


def test_decode_truncated_stream_drops_incomplete_tail():
    # reference decoder leaves an unterminated trailing value unfinished
    blob = vbyte_encode([5, 300]) + b"\x01\x02"  # dangling continuation
    from elasticsearch_spark.functions.codec import _vbyte_decode_scalar

    assert vbyte_decode(blob) == _vbyte_decode_scalar(blob) == [5, 300]


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**31 - 1),
        min_size=1,
        max_size=200,
        unique=True,
    )
)
@settings(max_examples=100, deadline=None)
def test_z1_z2_cross_implementation_agreement(values):
    """verify_compression.py:82-105 semantics: the VByte (z=1) and zlib
    (z=2) codecs must decode any sorted posting list to identical ints."""
    postings = sorted(values)
    assert (
        delta_decode(delta_encode(postings))
        == zlib_delta_decode(zlib_delta_encode(postings))
        == postings
    )


# ----------------------------------------------------- position streams

@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=1 << 20), min_size=1, max_size=30),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=100, deadline=None)
def test_position_stream_roundtrip(pos_lists):
    """Per-posting position arrays -> one delta blob -> back, for both
    codecs.  Counts come from the tf stream (len of each array)."""
    import numpy as np

    from elasticsearch_spark.functions.codec import decode_positions, encode_positions

    pos_lists = [sorted(p) for p in pos_lists]
    counts = np.array([len(p) for p in pos_lists], dtype=np.int64)
    flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_lists])
    for codec in ("vbyte", "zlib"):
        blob = encode_positions(flat, counts, codec)
        got = decode_positions(blob, counts, codec)
        assert got.tolist() == flat.tolist(), codec


def test_position_stream_empty_and_zero_counts():
    import numpy as np

    from elasticsearch_spark.functions.codec import decode_positions, encode_positions

    assert encode_positions(np.empty(0), np.empty(0, dtype=np.int64)) == b""
    assert decode_positions(b"", np.empty(0, dtype=np.int64)).size == 0
    # a zero-count posting interleaved (tf can't be 0 in practice, but
    # the split math must not break)
    flat = np.array([3, 7, 2], dtype=np.int64)
    counts = np.array([2, 0, 1], dtype=np.int64)
    blob = encode_positions(flat, counts)
    assert decode_positions(blob, counts).tolist() == [3, 7, 2]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 40),  # run base doc id
            st.integers(min_value=1, max_value=12),       # run length
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(max_examples=60, deadline=None)
def test_encode_runs_bit_identical_to_per_run_encode(run_specs):
    """The whole-group single-pass encoder must produce byte-identical
    blobs to encoding each run separately (incl. position streams)."""
    import numpy as np

    from elasticsearch_spark.functions.codec import (
        encode_block,
        encode_positions,
        encode_runs,
    )

    rng = np.random.RandomState(7)
    doc_ids, tfs, lens, starts, ends, flat_pos = [], [], [], [], [], []
    pos_per_run = []
    i = 0
    for base, n in run_specs:
        starts.append(i)
        d = np.sort(rng.choice(np.arange(base, base + 10 * n), size=n, replace=False))
        t = rng.randint(1, 6, size=n)
        l = rng.randint(1, 900, size=n)
        doc_ids.extend(d.tolist())
        tfs.extend(t.tolist())
        lens.extend(l.tolist())
        run_flat = []
        for tf in t:
            run_flat.extend(np.sort(rng.randint(0, 1000, size=tf)).tolist())
        pos_per_run.append((np.array(run_flat, dtype=np.int64), t))
        flat_pos.extend(run_flat)
        i += n
        ends.append(i)

    got_d, got_t, got_l, got_p = encode_runs(
        doc_ids, tfs, lens, starts, ends, np.array(flat_pos, dtype=np.int64)
    )
    for r, (s, e) in enumerate(zip(starts, ends)):
        want = encode_block(
            np.array(doc_ids[s:e]), np.array(tfs[s:e]), np.array(lens[s:e])
        )
        assert (got_d[r], got_t[r], got_l[r]) == want, r
        want_p = encode_positions(*pos_per_run[r])
        assert got_p[r] == want_p, r
