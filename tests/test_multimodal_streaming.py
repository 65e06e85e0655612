"""Multimodal plumbing (binary columns via mapInPandas) + streaming
segment ingestion."""

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators import multimodal
from elasticsearch_spark.sources.webtext import corpus_rows


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [(f"img://{i}", bytes([i % 251] * (600 + 97 * i))) for i in range(6)]
    return spark.createDataFrame(rows, "url string, data binary")


def test_binary_metadata(blobs):
    out = {r["url"]: r for r in multimodal.binary_metadata(blobs).collect()}
    assert out["img://0"]["n_bytes"] == 600
    assert out["img://1"]["content_hash"] != out["img://2"]["content_hash"]


def test_image_features_deterministic(blobs):
    a = sorted(multimodal.image_features(blobs).collect())
    b = sorted(multimodal.image_features(blobs).collect())
    assert a == b  # stub decoder is a pure function of the bytes
    row = dict(zip([f.name for f in multimodal.IMAGE_FEATURES_SCHEMA.fields], a[0]))
    assert 8 <= row["width"] <= 16 and 8 <= row["height"] <= 16
    assert row["channels"] == 3
    assert 0 <= row["mean_luma"] <= 255


def test_phash_near_pairs_finds_duplicate_images(spark):
    """Image dedup over the perceptual hash: byte-identical blobs under
    different urls must pair at hamming 0; near hashes (planted bit
    flips) must pair within the threshold; the banded result must equal
    a brute-force Hamming scan of the phash column."""
    import itertools

    payload = bytes(range(256)) * 3
    rows = [
        ("img://a", payload),
        ("img://b", payload),                     # exact duplicate blob
        ("img://c", bytes([7] * 500)),
        ("img://d", bytes([9] * 701)),
    ]
    blobs = spark.createDataFrame(rows, "url string, data binary")
    feats = multimodal.image_features(blobs)
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in multimodal.phash_near_pairs(feats, max_hamming=10).collect()
    }
    assert pairs[("img://a", "img://b")] == 0

    # banded == brute force over the actual phash values
    ph = {r["url"]: r["phash"] for r in feats.collect()}
    want = {
        (a, b): bin((ph[a] ^ ph[b]) & ((1 << 64) - 1)).count("1")
        for a, b in itertools.combinations(sorted(ph), 2)
        if bin((ph[a] ^ ph[b]) & ((1 << 64) - 1)).count("1") <= 10
    }
    assert pairs == want


def test_frame_sample_fanout(blobs):
    frames = multimodal.frame_sample(blobs, frame_bytes=100, every_n=2).collect()
    one = [r for r in frames if r["url"] == "img://0"]
    # 600 bytes -> 6 frames -> sampled idx 0,2,4
    assert sorted(r["frame_idx"] for r in one) == [0, 2, 4]
    assert all(len(r["frame"]) == 100 for r in one)


def test_stream_build_matches_batch(spark, tmp_index_root):
    import pyspark.sql.types as T

    from elasticsearch_spark.operators.build import IndexBuilder, IndexConfig
    from elasticsearch_spark.operators.query import QueryEngine
    from elasticsearch_spark.streaming.ingest import stream_build

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    rows = corpus_rows(120)
    corpus = spark.createDataFrame(rows, schema)

    # write the corpus as several files => several micro-batches
    input_dir = os.path.join(tmp_index_root, "stream_in")
    corpus.repartition(4).write.mode("overwrite").parquet(input_dir)

    cfg = IndexConfig(n_buckets=4, doc_range_bits=5)
    stream_dir = os.path.join(tmp_index_root, "stream_idx")
    manifest = stream_build(
        spark, input_dir, stream_dir, cfg, max_files_per_trigger=1
    )
    assert manifest["finalized"]
    assert len(manifest["segments"]) >= 2  # actually saw multiple batches

    batch_dir = os.path.join(tmp_index_root, "stream_batch_idx")
    IndexBuilder(spark, batch_dir, cfg).build(corpus)

    se = QueryEngine(spark, stream_dir)
    be = QueryEngine(spark, batch_dir)
    # same corpus stats and same per-term stats regardless of ingestion path
    assert se.doc_count == be.doc_count
    assert se.avg_doc_len == pytest.approx(be.avg_doc_len, abs=1e-9)
    assert se.stats["n_terms"] == be.stats["n_terms"]
    assert se.stats["n_postings"] == be.stats["n_postings"]
    # ranked results agree on scores (doc ids differ: arrival vs url order)
    a = se.ranked("machine learning", k=5)["results"]
    b = be.ranked("machine learning", k=5)["results"]
    assert [round(r["score"], 9) for r in a] == [round(r["score"], 9) for r in b]


def test_stream_update_commits_delta_segments(spark, tmp_index_root):
    """Continuous O(delta) ingestion: each micro-batch becomes an
    immediately-queryable delta segment; the base index is never
    rewritten; the final live view equals a one-shot batch build."""
    import pyspark.sql.types as T

    from elasticsearch_spark.operators.build import IndexBuilder, IndexConfig
    from elasticsearch_spark.operators.query import QueryEngine
    from elasticsearch_spark.streaming.ingest import stream_update

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    rows = corpus_rows(200)
    base = spark.createDataFrame(rows[:140], schema)
    extra = spark.createDataFrame(rows[140:], schema)

    cfg = IndexConfig(n_buckets=4, doc_range_bits=5)
    idx = os.path.join(tmp_index_root, "stream_upd_idx")
    IndexBuilder(spark, idx, cfg).build(base)

    def _tree_states(path):
        out = {}
        for root, _dirs, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = {t: _tree_states(os.path.join(idx, t)) for t in ("postings", "blocks")}

    stream_in = os.path.join(tmp_index_root, "stream_upd_in")
    extra.repartition(3).write.mode("overwrite").parquet(stream_in)
    manifest = stream_update(
        spark, stream_in, idx, cfg, max_files_per_trigger=1, compact=False
    )
    assert len(manifest["delta_segments"]) >= 2  # several micro-batches
    after = {t: _tree_states(os.path.join(idx, t)) for t in ("postings", "blocks")}
    assert before == after  # base untouched

    batch_dir = os.path.join(tmp_index_root, "stream_upd_batch")
    IndexBuilder(spark, batch_dir, cfg).build(base.unionByName(extra))
    se, be = QueryEngine(spark, idx), QueryEngine(spark, batch_dir)
    assert se.doc_count == be.doc_count
    assert se.avg_doc_len == pytest.approx(be.avg_doc_len, abs=1e-9)
    # between compactions n_terms is the last exact value (an exact
    # recount per micro-batch would be an O(vocab) job on the O(delta)
    # path); the explicit live count must match the batch build exactly
    assert se.stats["n_terms_exact"] is False
    assert IndexBuilder(spark, idx, cfg).live_term_count() == be.stats["n_terms"]
    assert se.stats["n_postings"] == be.stats["n_postings"]

    from elasticsearch_spark.operators.reader import live_docs

    def ranked_urls(eng, d, q):
        urls = {r["doc_id"]: r["url"] for r in live_docs(spark, d).collect()}
        return [
            (urls[r["doc_id"]], round(r["score"], 9))
            for r in eng.ranked(q, k=10)["results"]
        ]

    for q in ["machine learning", "sparkhead", "zo ta ne"]:
        assert ranked_urls(se, idx, q) == ranked_urls(be, batch_dir, q), q

    # replayed micro-batch is a no-op (idempotent segment commit)
    n_segments = len(manifest["segments"])
    b = IndexBuilder(spark, idx, cfg)
    b.update_index(add=extra, segment_name="stream_u_00000", compact=False)
    assert len(b._load_manifest()["segments"]) == n_segments
