"""Live-index view: read-time merge of the compacted base tables with
incremental delta segments and tombstones (O(delta) updates, B14).

After ``IndexBuilder.update_index`` the on-disk layout is:

    postings/ dictionary/ docs/ blocks/      compacted base (unchanged!)
    segments/<seg>/{docs,postings,dictionary,blocks}/   delta segments
    deltas/dict_rm_*/                        df partials of REMOVED docs
    manifest.json: delta_segments, tombstones, per-segment stats

Queries see base ∪ delta segments, minus tombstones — every source is
bucket-partitioned identically, so partition pruning and term predicate
pushdown apply per union branch, and the number of branches is bounded
by the compaction policy (an LSM-style read amplification bound).
Compaction (``IndexBuilder.compact``) folds everything back into the
base tables; until then an update never rewrites a byte of the base
index — the property that makes appends O(delta) at 10^12 docs.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# above this many tombstones the literal IN-filter becomes a broadcast
# anti-join (Catalyst handles a small table better than a giant literal)
TOMBSTONE_LITERAL_MAX = 1000


def load_manifest(index_dir: str) -> dict:
    # roll forward a compaction interrupted after its commit point (one
    # exists() check when nothing is pending) — readers opening the
    # index otherwise see a half-swapped table set
    from .build import recover_compaction

    recover_compaction(index_dir)
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def load_stats(index_dir: str) -> dict:
    """stats.json overlaid with the manifest's committed copy of the
    corpus stats.  The manifest is the single atomic commit point for
    incremental updates (written first), so its values win when a crash
    separated the manifest and stats writes — engines reading through
    here can never double-count a replayed micro-batch."""
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    try:
        manifest = load_manifest(index_dir)
    except OSError:
        return stats
    for k, v in (manifest.get("stats") or {}).items():
        stats[k] = v
    return stats


def delta_segments(manifest: dict) -> List[str]:
    return list(manifest.get("delta_segments", []))


def tombstones(manifest: dict) -> List[int]:
    return [int(t) for t in manifest.get("tombstones", [])]


def filter_tombstones(df: DataFrame, tombs: List[int],
                      col: str = "doc_id") -> DataFrame:
    if not tombs:
        return df
    if len(tombs) <= TOMBSTONE_LITERAL_MAX:
        return df.filter(~F.col(col).isin(tombs))
    spark = df.sparkSession
    tomb_df = F.broadcast(
        spark.createDataFrame([(int(t),) for t in tombs], f"{col} long")
    )
    return df.join(tomb_df, col, "left_anti")


def _union(parts: List[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def live_postings(spark: SparkSession, index_dir: str,
                  manifest: Optional[dict] = None) -> DataFrame:
    """Base postings ∪ delta-segment postings, tombstone-filtered."""
    manifest = manifest or load_manifest(index_dir)
    parts = [spark.read.parquet(os.path.join(index_dir, "postings"))]
    for seg in delta_segments(manifest):
        parts.append(
            spark.read.parquet(os.path.join(index_dir, "segments", seg, "postings"))
        )
    return filter_tombstones(_union(parts), tombstones(manifest))


def live_docs(spark: SparkSession, index_dir: str,
              manifest: Optional[dict] = None) -> DataFrame:
    manifest = manifest or load_manifest(index_dir)
    # select the canonical columns: a docs table served by linked tokens
    # files carries a (column-pruned-away) tokens column
    parts = [
        spark.read.parquet(os.path.join(index_dir, "docs")).select(
            "doc_id", "url", "doc_len"
        )
    ]
    for seg in delta_segments(manifest):
        parts.append(
            spark.read.parquet(os.path.join(index_dir, "segments", seg, "docs"))
            .select("doc_id", "url", "doc_len")
        )
    return filter_tombstones(_union(parts), tombstones(manifest))


def live_tokens(spark: SparkSession, index_dir: str,
                manifest: Optional[dict] = None) -> DataFrame:
    """Live forward index (doc_id, tokens): base ∪ delta-segment tokens
    tables, tombstone-filtered — the highlight operator's snippet
    source."""
    manifest = manifest or load_manifest(index_dir)
    parts = [
        spark.read.parquet(os.path.join(index_dir, "tokens")).select(
            "doc_id", "tokens"
        )
    ]
    for seg in delta_segments(manifest):
        parts.append(
            spark.read.parquet(os.path.join(index_dir, "segments", seg, "tokens"))
            .select("doc_id", "tokens")
        )
    return filter_tombstones(_union(parts), tombstones(manifest))


def live_dictionary(spark: SparkSession, index_dir: str,
                    manifest: Optional[dict] = None) -> DataFrame:
    """Live (term, df) as a DataFrame: signed sum over the dictionary
    sources (base + delta partials − removal partials), df > 0 — the
    plan twin of :func:`live_df_lookup` for full-dictionary consumers
    (significant_terms' background frequencies, analytics)."""
    manifest = manifest or load_manifest(index_dir)
    parts = []
    for path, sign in dictionary_sources(index_dir, manifest):
        parts.append(
            spark.read.parquet(path).select(
                "term", (F.col("df") * F.lit(sign)).alias("df")
            )
        )
    merged = _union(parts)
    return (
        merged.groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
        .filter(F.col("df") > 0)
    )


def live_blocks(spark: SparkSession, index_dir: str, manifest: Optional[dict] = None,
                stats: Optional[dict] = None) -> List[Tuple[DataFrame, float]]:
    """[(blocks_df, ub_scale)] — one entry for the base blocks and one
    per delta segment.  ``ub_scale`` corrects each source's stored
    block-max impacts for average-doc-length drift since encode time:
    impact is increasing in avgdl, and the worst-case inflation factor
    is exactly avgdl_now / avgdl_at_encode (the dl-dominated limit), so
    ``max_impact * max(1, ratio)`` stays a valid upper bound and WAND
    pruning stays lossless."""
    manifest = manifest or load_manifest(index_dir)
    if stats is None:
        stats = load_stats(index_dir)
    avg_now = stats["avg_doc_len"]

    def scale(avg_enc) -> float:
        if not avg_enc or avg_enc <= 0:
            return 1.0
        return max(1.0, float(avg_now) / float(avg_enc))

    out = [
        (
            spark.read.parquet(os.path.join(index_dir, "blocks")),
            scale(stats.get("base_avgdl_at_encode", avg_now)),
        )
    ]
    for seg in delta_segments(manifest):
        seg_meta = manifest["segments"][seg]
        out.append(
            (
                spark.read.parquet(os.path.join(index_dir, "segments", seg, "blocks")),
                scale(seg_meta.get("avgdl_at_encode", avg_now)),
            )
        )
    return out


def dictionary_sources(index_dir: str, manifest: Optional[dict] = None
                       ) -> List[Tuple[str, int]]:
    """[(parquet_dir, sign)] whose signed df-sum per term is the LIVE
    document frequency: base dictionary (+), delta-segment dictionary
    partials (+), removed-doc df partials (−)."""
    manifest = manifest or load_manifest(index_dir)
    out = [(os.path.join(index_dir, "dictionary"), 1)]
    for seg in delta_segments(manifest):
        out.append((os.path.join(index_dir, "segments", seg, "dictionary"), 1))
    for name in manifest.get("dict_deltas", []):
        out.append((os.path.join(index_dir, "deltas", name), -1))
    return out


def live_df_lookup(spark: SparkSession, index_dir: str, terms: List[str],
                   n_buckets: int, manifest: Optional[dict] = None) -> dict:
    """term -> live document frequency, summed over the signed
    dictionary sources.  Driver-side pyarrow point reads (bucket
    partition pruning + term predicate; no Spark job) with a Spark
    fallback per source."""
    from ..functions.udfs import term_bucket

    totals: dict = {}
    for path, sign in dictionary_sources(index_dir, manifest):
        found = _df_point_lookup(path, terms, n_buckets)
        if found is None:
            buckets = sorted({term_bucket(t, n_buckets) for t in terms})
            rows = (
                spark.read.parquet(path)
                .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
                .select("term", "df")
                .collect()
            )
            found = {r["term"]: r["df"] for r in rows}
        for t, v in found.items():
            totals[t] = totals.get(t, 0) + sign * int(v)
    return totals


def _df_point_lookup(path: str, terms: List[str], n_buckets: int):
    from ..functions.udfs import term_bucket

    try:
        import pyarrow.dataset as pads

        dataset = pads.dataset(path, partitioning="hive")
        buckets = sorted({term_bucket(t, n_buckets) for t in terms})
        expr = pads.field("bucket").isin(buckets) & pads.field("term").isin(terms)
        tbl = dataset.to_table(columns=["term", "df"], filter=expr)
        out: dict = {}
        for term, df in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
            out[term] = out.get(term, 0) + df
        return out
    except Exception:
        return None
