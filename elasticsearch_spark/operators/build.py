"""Distributed inverted-index build (SURVEY.md §2.3, §3.3).

Spark-first rework of the reference's single-process build
(``/root/reference/selfindex_q_daat.py:58-125``): one wide shuffle
(tokenize -> term-partitioned postings), then narrow writes.  All heavy
lifting is DataFrame ops + the three pandas-UDF families; no driver-side
loops over data.

Index layout on disk (parquet; Iceberg-shaped layout, catalog-free —
SURVEY.md §7 stage 3 fallback since no Iceberg jar ships offline):

    <index_dir>/manifest.json                build lineage + per-segment checkpoints
    <index_dir>/segments/<seg>/docs/         (doc_id, url, doc_len)
    <index_dir>/segments/<seg>/postings/     bucket=*/ (term, doc_id, tf, doc_len)
    <index_dir>/postings/                    bucket=*/ merged, sorted (term, doc_id)
    <index_dir>/blocks/                      bucket=*/ compressed block-max runs
    <index_dir>/dictionary/                  (term, df, idf, bucket)
    <index_dir>/docs/                        (doc_id, url, doc_len)
    <index_dir>/stats.json                   corpus stats + build metrics

Scale design (10^12 docs, 1000 executors):
* doc_id assignment: repartitionByRange on url + per-partition offsets —
  a distributed zipWithIndex without any single-partition window.
* postings build: ``posexplode`` -> partial-aggregated ``groupBy`` (map-
  side combine), then ``repartition(bucket)`` + ``sortWithinPartitions``
  so each term-hash bucket is a sorted posting run (the north-star's
  term-partitioned build).  Head-term skew is bounded because tf
  aggregation happens *before* the bucket shuffle (a term contributes
  ≤ one row per doc), and AQE skew handling is on for the residual skew.
* segments: the corpus is built in document segments, each a complete
  checkpoint unit recorded in manifest.json — a killed build resumes by
  skipping completed segments.  The final merge is a sorted merge of
  segment posting runs (union preserves bucket partitioning; the sort
  recreates run order), reference B14's upgrade.
* compression: per-(term, doc-range) runs delta-gap + VByte encoded with
  block-max metadata via applyInPandas (bounded memory per group).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
from dataclasses import asdict, dataclass, field, fields
from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codec
from ..functions.udfs import extract_tokenize_udf, term_bucket_col, tokenize_udf


@dataclass(frozen=True)
class IndexConfig:
    n_buckets: int = 32            # term-hash partitions of the postings table
    doc_range_bits: int = 16       # block runs aligned to doc_id >> bits
    k1: float = 1.2
    b: float = 0.75
    lang: Optional[str] = "en"     # index only this language (None = all)
    pretokenized: bool = False     # input has whitespace-token text, skip pipeline
    use_html: bool = True          # tokenize extracted html (else the text column)
    segment_docs: int = 0          # docs per segment; 0 = single segment
    id_partitions: int = 0         # partitions for doc-id assignment (0 = default)
    positional: bool = False       # store per-posting position arrays (phrase queries)
    shuffle_salt: int = 1          # >1: split each bucket across salt sub-shuffles
                                   # (explicit head-term skew handling; Zipf head
                                   # terms make single-bucket partitions unbalanced
                                   # at scale even after tf pre-aggregation)
    codec: str = "vbyte"           # posting-run codec: "vbyte" (z=1, 64-bit safe)
                                   # or "zlib" (z=2 comparator, uint32 doc ids)
    store_tfidf: bool = False      # x=3 variant (B7): also persist postings with
                                   # precomputed (tf/dl)*ln(N/df) scores
                                   # (reference plot_c_info_type.py:64-76)


BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("range_id", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("last_doc", T.LongType()),
        T.StructField("max_impact", T.DoubleType()),
        T.StructField("doc_blob", T.BinaryType()),
        T.StructField("tf_blob", T.BinaryType()),
        T.StructField("len_blob", T.BinaryType()),
        # per-posting position streams (positional indexes only; null
        # otherwise).  Counts come from the tf stream — one position
        # per occurrence — so no extra count stream is stored.
        T.StructField("pos_blob", T.BinaryType()),
    ]
)


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _link_tree(src: str, dst: str) -> None:
    """Copy a parquet directory tree with hardlinks (fallback: copy) —
    the local-fs analogue of a metadata-only table move; on an object
    store this is a server-side copy with no shuffle or decode."""
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst, exist_ok=True)
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out_dir = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out_dir, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(out_dir, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def _apply_compaction_commit(index_dir: str, commit: dict) -> None:
    """Roll a committed compaction forward to completion.  Idempotent:
    every step checks on-disk state first, so a crash at ANY point is
    repaired by re-running (``recover_compaction`` does exactly that on
    the next manifest load).  The table swap is two cheap renames per
    table — never a delete-then-replace window in which the table is
    missing — and the manifest/stats rewrites come verbatim from the
    commit record, so a half-applied run cannot mix generations."""

    def p(*parts: str) -> str:
        return os.path.join(index_dir, *parts)

    for name in commit["swap"]:
        cur, new, bak = p(name), p(name + ".new"), p(name + ".old")
        if os.path.exists(new):
            if os.path.exists(cur) and not os.path.exists(bak):
                os.rename(cur, bak)
            if not os.path.exists(cur):
                os.rename(new, cur)
    # bookkeeping rides the commit record (atomic rewrite of both files)
    for fname, payload in (
        ("manifest.json", commit["manifest"]),
        ("stats.json", commit["stats"]),
    ):
        tmp = p(fname) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2)
        os.replace(tmp, p(fname))
    for name in commit["swap"]:
        bak = p(name + ".old")
        if os.path.exists(bak):
            shutil.rmtree(bak)
    if os.path.isdir(p("deltas")):
        shutil.rmtree(p("deltas"))
    if os.path.exists(p("compact_commit.json")):
        os.remove(p("compact_commit.json"))


def recover_compaction(index_dir: str) -> None:
    """Finish a compaction interrupted after its commit point.

    ``compact()`` writes every merged table to ``<name>.new``, then
    atomically records ``compact_commit.json`` (the COMMIT POINT), then
    swaps tables and rewrites the bookkeeping.  A crash BEFORE the
    commit record leaves the live index byte-untouched (stray ``.new``
    dirs are simply overwritten by the next compact); a crash AFTER it
    is rolled forward here.  Called from every manifest load — one
    ``exists()`` check when nothing is pending."""
    commit_p = os.path.join(index_dir, "compact_commit.json")
    if not os.path.exists(commit_p):
        return
    with open(commit_p) as f:
        commit = json.load(f)
    _apply_compaction_commit(index_dir, commit)


def assign_doc_ids(df: DataFrame, order_col: str = "url", num_partitions: int = 0,
                   scratch_dir: Optional[str] = None) -> DataFrame:
    """Dense sequential doc_id by global ``order_col`` order, without a
    single-partition window: range-partition on the key, count rows per
    partition (tiny driver collect), broadcast the cumulative offsets,
    then a *within-partition* row_number.

    The range-partitioned frame is MATERIALIZED to ``scratch_dir``
    (parquet) before the counts are collected: the per-partition offsets
    are only valid for the exact partition assignment they were counted
    from, and an unmaterialized recompute may resample different range
    boundaries (the range sampler is seeded per RDD id) — silently
    wrong/duplicate ids.  Files make the assignment deterministic under
    executor loss AND leak nothing: the caller deletes the directory
    once the dependent write has run (no CacheManager entry to forget).
    ``_pid`` is stored as data, so the read-back partitioning is
    irrelevant.  Default scratch is a process-local temp dir (cleaned at
    exit) — fine on local[*]; cluster callers pass shared storage, as
    ``IndexBuilder.prepare_docs`` does with ``<index_dir>/_scratch``.
    """
    spark = df.sparkSession
    if num_partitions <= 0:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if scratch_dir is None:
        scratch_dir = _default_scratch("assign_ids_")
    ranged = df.repartitionByRange(num_partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # the sampling + scratch write + count are METADATA-sized jobs (one
    # narrow key column); AQE stage materialization adds fixed per-job
    # latency here (~2x on this path, measured) and can optimize
    # nothing — keep it for the data-scale stages only
    from ..session import interactive_aqe_off

    with interactive_aqe_off(spark):
        ranged.write.mode("overwrite").parquet(scratch_dir)
        ranged = spark.read.parquet(scratch_dir)
        # per-partition counts from the parquet FOOTERS of the files the
        # write just produced (part-NNNNN = the writing task's partition
        # id = the stored _pid): a driver-side metadata read instead of
        # a whole count job — one fewer fixed-cost job per build
        counts = _part_file_counts(scratch_dir)
        if counts is None:  # unexpected layout: the count job fallback
            counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_df = F.broadcast(
        spark.createDataFrame([(pid, off) for pid, off in offsets.items()], "_pid int, _offset long")
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    out = (
        ranged.join(offsets_df, "_pid")
        .withColumn("doc_id", (F.row_number().over(w) - 1 + F.col("_offset")).cast("long"))
        .drop("_pid", "_offset")
    )
    return out


def _part_file_counts(scratch_dir: str) -> Optional[dict]:
    """{partition_id: num_rows} from parquet footers of a just-written
    scratch directory.  Returns None when any data file doesn't follow
    Spark's ``part-NNNNN-...`` naming OR when the file's STORED ``_pid``
    column statistics don't match the filename index (caller falls back
    to a count job).  The cross-check matters because the filename-pid
    ≡ stored-pid assumption is load-bearing for doc-id uniqueness (the
    project's core invariant): a Spark version or committer that
    renumbers write tasks (AQE coalesce, alternative committers) would
    otherwise silently duplicate doc ids.  The stats live in the SAME
    footer being read, so validation stays metadata-cheap (no data
    pages touched).  Partitions that wrote no file have zero rows and
    are simply absent — the offset math only needs present pids."""
    import re

    try:
        import pyarrow.parquet as pq

        counts: dict = {}
        for name in os.listdir(scratch_dir):
            if name.startswith(("_", ".")) or not name.endswith(".parquet"):
                continue
            m = re.match(r"part-(\d+)", name)
            if not m:
                return None
            pid = int(m.group(1))
            meta = pq.ParquetFile(os.path.join(scratch_dir, name)).metadata
            schema_names = [meta.schema.column(i).name
                            for i in range(meta.num_columns)]
            try:
                pid_idx = schema_names.index("_pid")
            except ValueError:
                return None
            for rg in range(meta.num_row_groups):
                stats = meta.row_group(rg).column(pid_idx).statistics
                if (
                    stats is None
                    or not stats.has_min_max
                    or stats.min != pid
                    or stats.max != pid
                ):
                    return None  # filename pid ≠ stored pid: count job
            counts[pid] = counts.get(pid, 0) + meta.num_rows
        return counts
    except Exception:
        return None


def _default_scratch(prefix: str) -> str:
    """Process-local scratch dir, removed at interpreter exit."""
    import atexit
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, True)
    return d


class IndexBuilder:
    """Builds the full index from the webtext input table."""

    def __init__(self, spark: SparkSession, index_dir: str, config: IndexConfig = IndexConfig()):
        self.spark = spark
        self.index_dir = index_dir
        self.config = config
        self.metrics: List[dict] = []
        self._scratch_dirs: List[str] = []

    @classmethod
    def open(cls, spark: SparkSession, index_dir: str, **overrides) -> "IndexBuilder":
        """Builder bound to an EXISTING index, config loaded from its
        stats.json — the safe constructor for update/compact/stream
        callers.  A hand-passed config that disagrees with the stored
        one would write delta segments the readers misread (e.g. bucket
        ids hashed under a different ``n_buckets`` silently vanish from
        pruned scans); ``update_index`` independently validates this.
        ``overrides`` may adjust build-only knobs (shuffle_salt, ...)."""
        with open(os.path.join(index_dir, "stats.json")) as f:
            stored = json.load(f).get("config") or {}
        known = {f.name for f in fields(IndexConfig)}
        cfg = {k: v for k, v in stored.items() if k in known}
        cfg.update(overrides)
        return cls(spark, index_dir, IndexConfig(**cfg))

    # ------------------------------------------------------------ helpers
    def _path(self, *parts: str) -> str:
        return os.path.join(self.index_dir, *parts)

    def _manifest_path(self) -> str:
        return self._path("manifest.json")

    def _load_manifest(self) -> dict:
        recover_compaction(self.index_dir)
        if os.path.exists(self._manifest_path()):
            with open(self._manifest_path()) as f:
                return json.load(f)
        return {"config": asdict(self.config), "segments": {}, "finalized": False}

    def _save_manifest(self, manifest: dict) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path())

    def _new_scratch(self) -> str:
        """Scratch dir under the index (shared storage on a cluster) for
        the doc-id assignment materialization; freed by _drop_scratch
        once the dependent write has run — continuous ingestion must not
        accumulate one leaked cache/scratch per micro-batch."""
        import tempfile

        root = self._path("_scratch")
        os.makedirs(root, exist_ok=True)
        d = tempfile.mkdtemp(prefix="ids_", dir=root)
        self._scratch_dirs.append(d)
        return d

    def _drop_scratch(self) -> None:
        while self._scratch_dirs:
            shutil.rmtree(self._scratch_dirs.pop(), ignore_errors=True)
        root = self._path("_scratch")
        try:
            if os.path.isdir(root) and not os.listdir(root):
                os.rmdir(root)
        except OSError:
            pass

    def _record(self, stage: str, seconds: float, docs: int = 0, postings: int = 0) -> dict:
        entry = {
            "stage": stage,
            "seconds": round(seconds, 3),
            "docs": docs,
            "postings": postings,
            "docs_per_sec": round(docs / seconds, 1) if seconds > 0 and docs else None,
            "postings_per_sec": round(postings / seconds, 1) if seconds > 0 and postings else None,
        }
        self.metrics.append(entry)
        return entry

    # ------------------------------------------------------------- stages
    def prepare_docs(self, raw: DataFrame) -> DataFrame:
        """Input table -> (doc_id, url, doc_len, tokens).

        Filters language, extracts+tokenizes via the pandas UDF, assigns
        deterministic doc ids by url order.
        """
        cfg = self.config
        df = raw
        if cfg.lang is not None and "lang" in df.columns:
            df = df.filter(F.col("lang") == cfg.lang)
        if cfg.pretokenized:
            # whitespace split identical to python str.split(): no empty tokens
            tokens = F.when(
                F.length(F.trim(F.col("text"))) > 0,
                F.split(F.trim(F.col("text")), r"\s+"),
            ).otherwise(F.array().cast("array<string>"))
        elif cfg.use_html and "html" in df.columns:
            tokens = extract_tokenize_udf(F.col("html"))
        else:
            tokens = tokenize_udf(F.col("text"))

        if "doc_id" in df.columns:
            # caller-provided stable ids (e.g. driver testdata)
            df = df.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                (F.col("url") if "url" in df.columns else F.col("doc_id")).cast("string").alias("url"),
                tokens.alias("tokens"),
            )
        else:
            # Assign ids on a NARROW url-only projection (parquet column
            # pruning makes the range-partitioner's sampling pass and the
            # id shuffle nearly free), then hash-join the mapping back.
            # This keeps the heavy extract/tokenize UDF out of the range
            # partitioner's sampling re-execution AND runs it after a
            # shuffle, i.e. on spark.sql.shuffle.partitions partitions
            # rather than whatever the input file split count was.
            base = df.withColumn("url", F.col("url").cast("string"))
            ids = assign_doc_ids(
                base.select("url"), "url", self.config.id_partitions,
                scratch_dir=self._new_scratch(),
            )
            # 2x the shuffle width for the tokenize stage: the pandas
            # UDF pipelines JVM (scan/arrow) and Python (tokenize) work
            # per task, and finer tasks both smooth the wave tail and
            # spread Zipf doc-length skew — measured ~10% faster at
            # every core count (A/B rp=16 vs 32 on the 80k bench corpus)
            n_parts = self.config.id_partitions or 2 * int(
                self.spark.conf.get("spark.sql.shuffle.partitions")
            )
            # Catalyst broadcasts the small id map, which would leave the
            # join output on the raw scan's file-split partitioning (often
            # far fewer splits than cores) — repartition by doc_id BEFORE
            # the tokenize UDF so the Python stage uses every core and
            # Zipf-length skew is spread round-robin-by-hash.
            df = (
                base.join(ids, "url")
                .repartition(n_parts, "doc_id")
                .select("doc_id", "url", tokens.alias("tokens"))
            )
        return df.select("doc_id", "url", F.size("tokens").alias("doc_len"), "tokens")

    def build_segment(self, seg_name: str, docs: DataFrame,
                      docs_stats: Optional[dict] = None,
                      link_docs_from: Optional[str] = None) -> dict:
        """One checkpointed segment: docs table + bucket-partitioned
        postings run.  Returns segment stats for the manifest.

        ``docs_stats`` + ``link_docs_from``: when the caller already has
        the doc stats (from an Observation on the tokens write) and the
        segment covers the WHOLE tokens table, the docs table is served
        by hardlinking the tokens files (readers column-prune the tokens
        column away) — one fewer job + write per build."""
        cfg = self.config
        t0 = time.time()
        docs_path = self._path("segments", seg_name, "docs")
        if docs_stats is not None and link_docs_from is not None:
            _link_tree(link_docs_from, docs_path)
            n_docs, sum_len = docs_stats["n"], docs_stats["s"]
            min_id, max_id = docs_stats["mn"], docs_stats["mx"]
        else:
            # Observation collects the stats DURING the write — no
            # read-back job (these per-stage jobs are the fixed residue
            # that limits small-sample scaling efficiency; see
            # BENCH/BASELINE.md §4)
            obs_docs = Observation()
            (
                docs.select("doc_id", "url", "doc_len")
                .observe(
                    obs_docs,
                    F.count(F.lit(1)).alias("n"),
                    F.sum("doc_len").alias("s"),
                    F.min("doc_id").alias("mn"),
                    F.max("doc_id").alias("mx"),
                )
                .write.mode("overwrite")
                .parquet(docs_path)
            )
            n_docs, sum_len = obs_docs.get["n"], obs_docs.get["s"] or 0
            min_id, max_id = obs_docs.get["mn"], obs_docs.get["mx"]
        t1 = time.time()
        self._record(f"{seg_name}/docs", t1 - t0, docs=n_docs)

        # Wide shuffle: explode -> per-(term,doc) tf with map-side combine.
        if cfg.positional:
            # posexplode keeps token offsets; positions sorted per posting
            # (B3 — persisted here, unlike the reference which built and
            # dropped them, selfindex_z1_simple_compression.py:141)
            exploded = docs.select(
                "doc_id", "doc_len", F.posexplode("tokens").alias("pos", "term")
            )
            postings = (
                exploded.groupBy("term", "doc_id", "doc_len")
                .agg(
                    F.count("*").cast("int").alias("tf"),
                    F.sort_array(F.collect_list("pos")).alias("positions"),
                )
                .withColumn("bucket", term_bucket_col(F.col("term"), cfg.n_buckets))
            )
        else:
            exploded = docs.select(
                "doc_id", "doc_len", F.explode("tokens").alias("term")
            )
            postings = (
                exploded.groupBy("term", "doc_id", "doc_len")
                .agg(F.count("*").cast("int").alias("tf"))
                .withColumn("bucket", term_bucket_col(F.col("term"), cfg.n_buckets))
            )
        post_path = self._path("segments", seg_name, "postings")
        # Bucket exchange -> sorted run file(s) per bucket.  The sort
        # leads with the partition column so the dynamic-partition writer
        # needs no extra planner-inserted sort, and (term, doc_id) order
        # within each file gives parquet row-group stats for term pruning.
        # shuffle_salt > 1 splits each bucket across salt sub-shuffles by
        # doc range — the explicit skew guard for Zipf head terms (each
        # salted slice is still a sorted (term, doc_id) run; readers
        # merge runs, so multiple files per bucket are part of the
        # contract).
        if cfg.shuffle_salt > 1:
            salted = postings.withColumn(
                "_salt", F.pmod(F.col("doc_id"), F.lit(cfg.shuffle_salt)).cast("int")
            )
            writer = (
                salted.repartition(cfg.n_buckets * cfg.shuffle_salt, "bucket", "_salt")
                .sortWithinPartitions("bucket", "term", "doc_id")
                .drop("_salt")
            )
        else:
            writer = postings.repartition(cfg.n_buckets, "bucket").sortWithinPartitions(
                "bucket", "term", "doc_id"
            )
        obs_post = Observation()
        (
            writer.observe(obs_post, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(post_path)
        )
        n_postings = obs_post.get["n"]
        t2 = time.time()
        self._record(f"{seg_name}/postings", t2 - t1, docs=n_docs, postings=n_postings)
        return {
            "n_docs": n_docs,
            "sum_doc_len": int(sum_len),
            "n_postings": n_postings,
            # doc-id range: lets incremental removals scan only the
            # segments that can contain the tombstoned ids
            "min_doc_id": int(min_id) if min_id is not None else None,
            "max_doc_id": int(max_id) if max_id is not None else None,
            "built_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "seconds": round(t2 - t0, 3),
        }

    def finalize(self, manifest: dict) -> dict:
        """Merge segment runs into the final index: postings (sorted
        merge), dictionary (+idf), docs, compressed block-max runs,
        corpus stats.  Tombstoned doc_ids (incremental deletes, B14) are
        anti-joined out of every merged table."""
        cfg = self.config
        seg_names = sorted(manifest["segments"])
        tombstones = sorted(manifest.get("tombstones", []))
        tomb_df = None
        if tombstones:
            tomb_df = F.broadcast(
                self.spark.createDataFrame(
                    [(int(d),) for d in tombstones], "doc_id long"
                )
            )
        t0 = time.time()

        post_path = self._path("postings")
        if len(seg_names) == 1 and tomb_df is None:
            # Single-segment fast path: the segment run IS the final
            # table (already bucket-partitioned and (term, doc_id)
            # sorted) — link files instead of re-shuffling ~all postings.
            _link_tree(self._path("segments", seg_names[0], "postings"), post_path)
        else:
            seg_postings = [
                self.spark.read.parquet(self._path("segments", s, "postings"))
                for s in seg_names
            ]
            merged = seg_postings[0]
            for p in seg_postings[1:]:
                merged = merged.unionByName(p)
            if tomb_df is not None:
                merged = merged.join(tomb_df, "doc_id", "left_anti")
            # Sorted merge of segment runs: bucket partitioning is
            # preserved by the union; one sort per bucket restores
            # (term, doc_id) run order for the final table.
            (
                merged.repartition(cfg.n_buckets, "bucket")
                .sortWithinPartitions("bucket", "term", "doc_id")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(post_path)
            )
        postings = self.spark.read.parquet(post_path)
        t1 = time.time()

        if tomb_df is None:
            n_docs = sum(m["n_docs"] for m in manifest["segments"].values())
            sum_len = sum(m["sum_doc_len"] for m in manifest["segments"].values())
        else:
            # recompute from the surviving docs (removed docs' lengths
            # must leave avgdl — the BM25 normalizer)
            seg_docs_tmp = [
                self.spark.read.parquet(self._path("segments", s, "docs"))
                for s in seg_names
            ]
            alive = seg_docs_tmp[0]
            for d in seg_docs_tmp[1:]:
                alive = alive.unionByName(d)
            alive = alive.join(tomb_df, "doc_id", "left_anti")
            row = alive.agg(
                F.count("*").alias("n"), F.sum("doc_len").alias("s")
            ).collect()[0]
            n_docs, sum_len = row["n"], row["s"] or 0
        avg_doc_len = (sum_len / n_docs) if n_docs else 0.0

        # Compressed block-max runs per (term, doc-range) — written
        # BEFORE the dictionary so the dictionary can be derived from
        # the tiny block metadata instead of re-scanning all postings.
        n_postings = self._write_blocks(postings, avg_doc_len)
        t15 = time.time()

        # Dictionary: df per term + the reference idf ln((N+1)/(df+1)).
        # df = Σ n over a term's block runs — an aggregation over ~one
        # row per (term, doc-range) metadata, not over the postings.
        dict_path = self._path("dictionary")
        n_terms = self._write_dictionary_from_blocks(
            self._path("blocks"), dict_path, n_docs
        )
        t2 = time.time()

        # Docs table (merged).
        docs_path = self._path("docs")
        if len(seg_names) == 1 and tomb_df is None:
            _link_tree(self._path("segments", seg_names[0], "docs"), docs_path)
        else:
            seg_docs = [
                self.spark.read.parquet(self._path("segments", s, "docs")).select(
                    "doc_id", "url", "doc_len"
                )
                for s in seg_names
            ]
            docs_all = seg_docs[0]
            for d in seg_docs[1:]:
                docs_all = docs_all.unionByName(d)
            if tomb_df is not None:
                docs_all = docs_all.join(tomb_df, "doc_id", "left_anti")
            docs_all.write.mode("overwrite").parquet(docs_path)
        t3 = time.time()

        # x=3 variant (B7): postings with the score precomputed at index
        # time, idf = ln(N/df) (the reference's x=3 formula, distinct
        # from the dictionary's ln((N+1)/(df+1))).  Join is on
        # (bucket, term) — both sides are bucket-partitioned runs, so at
        # scale this is a co-located bucket join, one extra O(index)
        # pass paid only when the variant is requested.
        if cfg.store_tfidf:
            dict_df = self.spark.read.parquet(dict_path).select("bucket", "term", "df")
            tfidf = (
                postings.join(dict_df, ["bucket", "term"])
                .filter(F.col("doc_len") > 0)
                .select(
                    "bucket",
                    "term",
                    "doc_id",
                    (
                        (F.col("tf").cast("double") / F.col("doc_len"))
                        * F.log(F.lit(float(n_docs)) / F.col("df"))
                    ).alias("score"),
                )
            )
            (
                tfidf.repartition(cfg.n_buckets, "bucket")
                .sortWithinPartitions("bucket", "term", "doc_id")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(self._path("tfidf"))
            )

        self._record("finalize/merge_postings", t1 - t0, postings=n_postings)
        self._record("finalize/blocks", t15 - t1, postings=n_postings)
        self._record("finalize/dictionary", t2 - t15)
        self._record("finalize/docs", t3 - t2, docs=n_docs)

        stats = {
            "doc_count": n_docs,
            "sum_doc_len": int(sum_len),
            "avg_doc_len": avg_doc_len,
            # blocks below were encoded with this avgdl: incremental
            # updates shift the live avgdl, and WAND scales these
            # block-max bounds by max(1, avgdl_now/avgdl_at_encode) to
            # stay a valid upper bound (operators/reader.py)
            "base_avgdl_at_encode": avg_doc_len,
            "n_terms": n_terms,
            "n_terms_exact": True,
            "n_postings": n_postings,
            "config": asdict(cfg),
            "build_metrics": self.metrics,
            # A6 analogue: on-disk footprint per table (reference reports
            # pickle file size, plot_a_datastore.py:458-491)
            "table_bytes": {
                t: _tree_bytes(self._path(t))
                for t in ("postings", "blocks", "dictionary", "docs", "tokens", "tfidf")
            },
        }
        with open(self._path("stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
        return stats

    def _write_blocks(self, postings: DataFrame, avg_doc_len: float,
                      out_path: Optional[str] = None) -> int:
        """Delta-gap + VByte compressed posting runs with block-max
        metadata, one run per (term, doc-range); bounded group memory via
        doc-range alignment (SURVEY.md §2.3 B8-B11)."""
        cfg = self.config
        k1, b = cfg.k1, cfg.b
        range_bits = cfg.doc_range_bits

        out_schema = T.StructType(
            list(BLOCK_SCHEMA.fields) + [T.StructField("bucket", T.IntegerType())]
        )
        out_cols = [f.name for f in out_schema.fields]

        codec_name = cfg.codec
        positional = cfg.positional and "positions" in postings.columns

        def encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
            # group key is (bucket, range_id) -> range_id constant here;
            # term runs found by numpy boundary detection on the sorted
            # frame (no per-term pandas groupby slicing)
            bucket, range_id = int(key[0]), int(key[1])
            pdf = pdf.sort_values(["term", "doc_id"])
            import numpy as np

            terms = pdf["term"].to_numpy()
            doc_ids = pdf["doc_id"].to_numpy()
            tfs = pdf["tf"].to_numpy()
            lens = pdf["doc_len"].to_numpy()
            pos_col = pdf["positions"].to_numpy() if positional else None
            change = np.nonzero(terms[1:] != terms[:-1])[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(terms)]))
            n_runs = starts.size

            # per-run max impact + doc bounds, fully vectorized
            imp = codec.bm25_impact(tfs, lens, avg_doc_len, k1, b)
            max_imp = np.maximum.reduceat(imp, starts)

            if codec_name == "vbyte":
                # whole-group single-pass encode, byte-sliced per run
                flat = None
                if positional:
                    flat = (
                        np.concatenate([np.asarray(p) for p in pos_col])
                        if len(pos_col)
                        else np.empty(0, dtype=np.int64)
                    )
                doc_blobs, tf_blobs, len_blobs, pos_blobs = codec.encode_runs(
                    doc_ids, tfs, lens, starts, ends, flat
                )
            else:  # zlib comparator: per-run compression contexts
                doc_blobs, tf_blobs, len_blobs, pos_blobs = [], [], [], []
                for s, e in zip(starts, ends):
                    db, tb, lb = codec.encode_block(
                        doc_ids[s:e], tfs[s:e], lens[s:e], codec_name
                    )
                    doc_blobs.append(db)
                    tf_blobs.append(tb)
                    len_blobs.append(lb)
                    if positional:
                        fl = np.concatenate(
                            [np.asarray(p) for p in pos_col[s:e]]
                        )
                        pos_blobs.append(
                            codec.encode_positions(fl, tfs[s:e], codec_name)
                        )
                if not positional:
                    pos_blobs = None

            out = {
                "term": terms[starts],
                "range_id": np.full(n_runs, range_id, dtype=np.int64),
                "n": (ends - starts).astype(np.int32),
                "first_doc": doc_ids[starts].astype(np.int64),
                "last_doc": doc_ids[ends - 1].astype(np.int64),
                "max_impact": max_imp,
                "doc_blob": doc_blobs,
                "tf_blob": tf_blobs,
                "len_blob": len_blobs,
                "pos_blob": pos_blobs if pos_blobs is not None else [None] * n_runs,
                "bucket": np.full(n_runs, bucket, dtype=np.int32),
            }
            return pd.DataFrame(out, columns=out_cols)

        cols = ["bucket", "term", "doc_id", "tf", "doc_len"] + (
            ["positions"] if positional else []
        )
        blocks = (
            postings.select(*cols)
            .withColumn("range_id", F.shiftright(F.col("doc_id"), range_bits))
            .groupBy("bucket", "range_id")
            .applyInPandas(encode_group, schema=out_schema)
        )
        blocks_path = out_path or self._path("blocks")
        obs_blocks = Observation()
        (
            blocks.observe(obs_blocks, F.sum("n").alias("total"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(blocks_path)
        )
        return obs_blocks.get["total"] or 0

    def _write_dictionary_from_blocks(self, blocks_path: str, dict_path: str,
                                      n_docs: int) -> int:
        """Dictionary (term, df, idf, bucket) derived from block-run
        metadata: df = Σ n over a term's runs.  Scans ~one row per
        (term, doc-range) — metadata-sized, never the postings — and the
        blob columns are pruned from the read entirely."""
        cfg = self.config
        blocks = self.spark.read.parquet(blocks_path)
        dictionary = (
            blocks.groupBy("term", "bucket")
            .agg(F.sum("n").cast("long").alias("df"))
            .withColumn(
                "idf",
                F.when(
                    F.col("df") > 0,
                    F.log((F.lit(n_docs) + 1) / (F.col("df") + 1)),
                ).otherwise(F.lit(0.0)),
            )
        )
        obs_dict = Observation()
        (
            dictionary.repartition(cfg.n_buckets, "bucket")
            .sortWithinPartitions("bucket", "term")
            .observe(obs_dict, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(dict_path)
        )
        return int(obs_dict.get["n"])

    # --------------------------------------------------------------- main
    def build(self, raw: DataFrame, max_segments: Optional[int] = None) -> dict:
        """Full build with segment checkpoints.  ``max_segments`` limits
        how many segments are (re)built this invocation — used to test
        resume-after-kill; completed segments are always skipped."""
        cfg = self.config
        manifest = self._load_manifest()
        t_start = time.time()

        # Tokenize exactly once into a columnar forward table — cheaper
        # and more resumable than caching 10^8s of token strings as JVM
        # objects (deserialized persist would GC-thrash at scale), and a
        # crash after this point never re-runs the Python UDF.  The doc
        # stats (count/sum/min/max) ride the write as an Observation and
        # are checkpointed in the manifest, so neither the segment
        # planner nor the docs table needs another pass over the data.
        tokens_path = self._path("tokens")
        if not os.path.exists(os.path.join(tokens_path, "_SUCCESS")):
            t0 = time.time()
            obs_tok = Observation()
            (
                self.prepare_docs(raw)
                .observe(
                    obs_tok,
                    F.count(F.lit(1)).alias("n"),
                    F.sum("doc_len").alias("s"),
                    F.min("doc_id").alias("mn"),
                    F.max("doc_id").alias("mx"),
                )
                .write.mode("overwrite")
                .parquet(tokens_path)
            )
            manifest["tokens_stats"] = {
                "n": int(obs_tok.get["n"]),
                "s": int(obs_tok.get["s"] or 0),
                "mn": obs_tok.get["mn"],
                "mx": obs_tok.get["mx"],
            }
            self._save_manifest(manifest)
            self._record("tokenize", time.time() - t0, docs=manifest["tokens_stats"]["n"])
            # the tokens write materialized the id assignment — free its
            # scratch (nothing downstream re-reads it)
            self._drop_scratch()
        docs = self.spark.read.parquet(tokens_path)
        tok_stats = manifest.get("tokens_stats")

        if cfg.segment_docs and cfg.segment_docs > 0:
            # Segment by doc_id range: deterministic, resumable.
            if tok_stats is not None:
                n_total = (tok_stats["mx"] + 1) if tok_stats["mx"] is not None else 0
            else:  # legacy manifest without checkpointed tokens stats
                n_total = docs.agg(F.max("doc_id")).collect()[0][0]
                n_total = (n_total + 1) if n_total is not None else 0
            n_segments = max(1, math.ceil(n_total / cfg.segment_docs))
        else:
            n_segments = 1

        built = 0
        for i in range(n_segments):
            seg_name = f"seg_{i:05d}"
            if manifest["segments"].get(seg_name):
                continue  # checkpoint: already complete
            if max_segments is not None and built >= max_segments:
                break
            if cfg.segment_docs and n_segments > 1:
                lo, hi = i * cfg.segment_docs, (i + 1) * cfg.segment_docs
                seg_docs = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
                manifest["segments"][seg_name] = self.build_segment(seg_name, seg_docs)
            else:
                # whole-corpus segment: docs table = linked tokens files
                # + stats from the tokenize Observation (no extra job)
                manifest["segments"][seg_name] = self.build_segment(
                    seg_name, docs, docs_stats=tok_stats,
                    link_docs_from=tokens_path if tok_stats else None,
                )
            self._save_manifest(manifest)
            built += 1

        all_done = len(manifest["segments"]) == n_segments
        if all_done and not manifest.get("finalized"):
            stats = self.finalize(manifest)
            manifest["finalized"] = True
            manifest["stats"] = {k: stats[k] for k in self.STATS_KEYS}
            # checkpoint the id high-water mark so the FIRST incremental
            # update needs no O(corpus) max(doc_id) scan of the base
            if tok_stats and tok_stats.get("mx") is not None:
                manifest["next_doc_id"] = int(tok_stats["mx"]) + 1
            manifest["total_seconds"] = round(time.time() - t_start, 3)
            self._save_manifest(manifest)
        return manifest

    # -------------------------------------------------------- incremental
    # auto-compaction policy: bound read amplification (union branches)
    # and tombstone-set size
    COMPACT_MAX_DELTA_SEGMENTS = 8
    COMPACT_MAX_TOMBSTONES = 1_000_000

    # corpus-stat keys that ride the manifest (the single atomic commit
    # point for incremental updates); stats.json is rewritten AFTER the
    # manifest and reconciled from it on load, so a crash between the
    # two writes can never double-count a replayed micro-batch
    STATS_KEYS = ("doc_count", "sum_doc_len", "avg_doc_len", "n_terms",
                  "n_postings", "n_terms_exact")

    # config fields that shape the on-disk layout / query semantics; an
    # update run with a different value would write delta segments the
    # readers misinterpret (e.g. bucket values hashed under a different
    # n_buckets silently drop from pruned scans) — wrong results, no error
    SEMANTIC_CONFIG = ("n_buckets", "doc_range_bits", "k1", "b", "lang",
                      "pretokenized", "use_html", "positional", "codec",
                      "store_tfidf")

    def _check_config_matches(self) -> None:
        stored = self._load_stats().get("config") or {}
        mine = asdict(self.config)
        diffs = {
            k: (stored.get(k), mine.get(k))
            for k in self.SEMANTIC_CONFIG
            if k in stored and stored.get(k) != mine.get(k)
        }
        if diffs:
            raise ValueError(
                "IndexConfig mismatch vs the existing index at "
                f"{self.index_dir!r}: {diffs} (stored, passed). Updating "
                "with a different layout config writes delta segments the "
                "readers would silently misread — construct the builder "
                "with IndexBuilder.open() to adopt the stored config."
            )

    def _load_stats(self) -> dict:
        with open(self._path("stats.json")) as f:
            stats = json.load(f)
        # manifest.json is the commit point (written atomically first);
        # if a crash separated the manifest and stats writes, the
        # manifest copy of the corpus stats wins
        manifest = self._load_manifest()
        for k, v in (manifest.get("stats") or {}).items():
            stats[k] = v
        return stats

    def _save_stats(self, stats: dict) -> None:
        with open(self._path("stats.json"), "w") as f:
            json.dump(stats, f, indent=2)

    def _segment_extras(self, seg_name: str, avgdl_at_encode: float) -> None:
        """Per-segment final artifacts for an UPDATE segment: dictionary
        df partial + compressed block runs, so queries can merge this
        segment at read time without any base-table rewrite."""
        seg_post = self.spark.read.parquet(self._path("segments", seg_name, "postings"))
        blocks_path = self._path("segments", seg_name, "blocks")
        self._write_blocks(seg_post, avgdl_at_encode, blocks_path)
        # df partial derived from the block metadata (see
        # _write_dictionary_from_blocks) — the idf column written here is
        # meaningless for a partial (readers use df only) but harmless
        self._write_dictionary_from_blocks(
            blocks_path, self._path("segments", seg_name, "dictionary"), 0
        )

    def live_term_count(self, manifest: Optional[dict] = None) -> int:
        """EXACT live distinct-term count: one O(vocabulary) job over the
        signed dictionary sources (never O(postings)).

        Deliberately NOT called by ``update_index``: between compactions
        ``stats['n_terms']`` keeps the last exact (build/compact-time)
        value with ``n_terms_exact=False``, because recounting per update
        would put an O(vocab) aggregation on the otherwise-O(delta)
        streaming ingest path (one per micro-batch).  Callers that need
        the exact live count pay for it explicitly here; ``compact()``
        restores exactness as a side effect of its dictionary pass."""
        manifest = manifest or self._load_manifest()
        from .reader import dictionary_sources

        parts = []
        for path, sign in dictionary_sources(self.index_dir, manifest):
            parts.append(
                self.spark.read.parquet(path).select(
                    "term", (F.col("df") * F.lit(sign)).alias("df")
                )
            )
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        return (
            merged.groupBy("term")
            .agg(F.sum("df").alias("df"))
            .filter(F.col("df") > 0)
            .count()
        )

    def update_index(self, add: Optional[DataFrame] = None,
                     remove_urls: Optional[List[str]] = None,
                     compact: object = "auto",
                     segment_name: Optional[str] = None,
                     remove_doc_ids: Optional[List[int]] = None) -> dict:
        """O(delta) incremental update (B14; reference interface
        ``index_base.py:65-67`` — only the ES backend implemented it,
        ``elasticsearch_indexer.py:151-180``).

        LSM-style: additions become a self-contained delta segment (docs
        + postings + dictionary partial + blocks — one segment build,
        doc ids continue past the current max), removals become manifest
        tombstones plus a df-subtraction partial computed by scanning
        ONLY the segments whose doc-id range contains the removed ids.
        **No base table is rewritten**; queries merge base ∪ deltas at
        read time (operators/reader.py).  Corpus stats update
        arithmetically from integer (doc_count, sum_doc_len) — exact,
        not drifting.  ``compact`` = True / False / "auto": fold deltas
        into the base tables (the only O(index) operation) now, never,
        or when the read-amplification policy triggers.

        Note: the optional x=3 ``store_tfidf`` table is refreshed only
        at compaction (its scores bake in N and df).
        """
        manifest = self._load_manifest()
        if not manifest["segments"]:
            raise ValueError("update_index requires an existing index; use build()")
        if segment_name is not None and segment_name in manifest["segments"]:
            # idempotent replay guard (streaming micro-batch re-delivery
            # after a crash): the named segment already committed
            return manifest
        # refuse to write delta segments under a layout/semantics config
        # that disagrees with the stored one (silent wrong results
        # otherwise — see _check_config_matches)
        self._check_config_matches()
        t_start = time.time()
        stats = self._load_stats()
        doc_count = int(stats["doc_count"])
        sum_len = int(stats.get("sum_doc_len") or round(stats["avg_doc_len"] * doc_count))
        n_postings = int(stats["n_postings"])

        if remove_urls or remove_doc_ids:
            from .reader import live_docs

            # removal by url OR by doc_id (the reference's update API
            # removes by doc id — elasticsearch_indexer.py:151-166
            # ``remove_files: List[(doc_id, _)]``); both resolve to the
            # same (doc_id, doc_len) rows the tombstone math needs
            cond = (
                F.col("url").isin(list(remove_urls))
                if remove_urls else F.lit(False)
            )
            if remove_doc_ids:
                cond = cond | F.col("doc_id").isin(
                    [int(i) for i in remove_doc_ids]
                )
            rows = (
                live_docs(self.spark, self.index_dir, manifest)
                .filter(cond)
                .select("doc_id", "doc_len")
                .collect()
            )
            if rows:
                rm_ids = sorted(int(r["doc_id"]) for r in rows)
                doc_count -= len(rows)
                sum_len -= sum(int(r["doc_len"]) for r in rows)
                # df partial of the removed docs: scan only segments
                # whose id range intersects (manifest-recorded ranges)
                affected = []
                for seg, meta in manifest["segments"].items():
                    lo, hi = meta.get("min_doc_id"), meta.get("max_doc_id")
                    if lo is None or hi is None or any(
                        lo <= i <= hi for i in rm_ids
                    ):
                        affected.append(seg)
                parts = [
                    self.spark.read.parquet(self._path("segments", s, "postings"))
                    for s in affected
                ]
                merged = parts[0]
                for p in parts[1:]:
                    merged = merged.unionByName(p, allowMissingColumns=True)
                if len(rm_ids) <= 1000:
                    rm_posts = merged.filter(F.col("doc_id").isin(rm_ids))
                else:
                    rm_df = F.broadcast(
                        self.spark.createDataFrame(
                            [(i,) for i in rm_ids], "doc_id long"
                        )
                    )
                    rm_posts = merged.join(rm_df, "doc_id", "left_semi")
                delta_name = f"dict_rm_{len(manifest.get('dict_deltas', [])):05d}"
                obs = Observation()
                (
                    rm_posts.groupBy("term", "bucket")
                    .agg(F.count("*").cast("long").alias("df"))
                    .observe(obs, F.sum("df").alias("removed"))
                    .write.mode("overwrite")
                    .partitionBy("bucket")
                    .parquet(self._path("deltas", delta_name))
                )
                n_postings -= int(obs.get["removed"] or 0)
                manifest.setdefault("dict_deltas", []).append(delta_name)
                tombs = set(manifest.get("tombstones", []))
                tombs.update(rm_ids)
                manifest["tombstones"] = sorted(tombs)

        if add is not None:
            next_id = manifest.get("next_doc_id")
            if next_id is None:
                # The docs table is tombstone-filtered, so its max can sit
                # BELOW removed ids; a new doc given a tombstoned id would
                # be silently dropped by the tombstone filter.  Advance
                # past both the alive max and the tombstone max.
                alive_max = (
                    self.spark.read.parquet(self._path("docs"))
                    .agg(F.max("doc_id"))
                    .collect()[0][0]
                )
                alive_max = -1 if alive_max is None else int(alive_max)
                tomb_max = max(
                    (int(t) for t in manifest.get("tombstones", [])), default=-1
                )
                next_id = max(alive_max, tomb_max) + 1
            if "doc_id" in add.columns:
                # caller-managed ids, same precedence as build()'s
                # prepare_docs: preserved VERBATIM.  Required for
                # multi-field updates — every field sub-index must see
                # the SAME id for the same doc no matter how the stream
                # partitioned the rows into micro-batches (fresh
                # per-batch assignment would permute ids per batch).
                # The caller guarantees no collision with live or
                # tombstoned ids.
                new_docs = self.prepare_docs(add)
            else:
                # fresh ids by url order, offset past the existing range
                new_docs = self.prepare_docs(add).withColumn(
                    "doc_id", F.col("doc_id") + F.lit(int(next_id))
                )
            seg_name = segment_name or f"seg_{len(manifest['segments']):05d}"
            # tokenize-once for the segment (same rationale as build())
            tok_path = self._path("segments", seg_name, "tokens")
            new_docs.write.mode("overwrite").parquet(tok_path)
            self._drop_scratch()  # id assignment materialized by the write
            new_docs = self.spark.read.parquet(tok_path)
            seg_stats = self.build_segment(seg_name, new_docs)
            doc_count += seg_stats["n_docs"]
            sum_len += seg_stats["sum_doc_len"]
            n_postings += seg_stats["n_postings"]
            avgdl_now = (sum_len / doc_count) if doc_count else 0.0
            self._segment_extras(seg_name, avgdl_now)
            seg_stats["avgdl_at_encode"] = avgdl_now
            manifest["segments"][seg_name] = seg_stats
            manifest.setdefault("delta_segments", []).append(seg_name)
            # advance past BOTH the fresh-id range and any caller-managed
            # ids (whose max can exceed next_id + n_docs)
            manifest["next_doc_id"] = max(
                int(next_id) + seg_stats["n_docs"],
                int(seg_stats.get("max_doc_id", -1) or -1) + 1,
            )

        stats["doc_count"] = doc_count
        stats["sum_doc_len"] = sum_len
        stats["avg_doc_len"] = (sum_len / doc_count) if doc_count else 0.0
        stats["n_postings"] = n_postings
        # n_terms keeps the last EXACT (build/compact-time) value: an
        # exact recount is an O(vocabulary) job — the one non-O(delta)
        # cost this path used to pay, once per streaming micro-batch.
        # live_term_count() computes it on demand; compact() restores
        # exactness via its dictionary pass.
        stats["n_terms_exact"] = not (
            manifest.get("delta_segments")
            or manifest.get("dict_deltas")
            or manifest.get("tombstones")
        )
        manifest["finalized"] = True
        manifest["stats"] = {k: stats[k] for k in self.STATS_KEYS}
        manifest["total_seconds"] = round(time.time() - t_start, 3)
        # manifest.json is the single atomic commit point: the replay
        # guard above keys on it, so the updated corpus stats must ride
        # the SAME write — a crash between the two file writes leaves a
        # committed manifest + stale stats.json, which _load_stats /
        # reader.load_stats reconcile from the manifest copy.  (Writing
        # stats first would let a replayed batch double-count.)
        self._save_manifest(manifest)
        self._save_stats(stats)

        if compact is True or (compact == "auto" and self._should_compact(manifest, stats)):
            return self.compact()
        return manifest

    def _should_compact(self, manifest: dict, stats: dict) -> bool:
        if len(manifest.get("delta_segments", [])) > self.COMPACT_MAX_DELTA_SEGMENTS:
            return True
        tomb_cap = min(
            self.COMPACT_MAX_TOMBSTONES,
            max(1000, int(0.1 * max(stats.get("doc_count", 0), 1))),
        )
        return len(manifest.get("tombstones", [])) > tomb_cap

    def compact(self) -> dict:
        """Fold delta segments + tombstones into the base tables — the
        ONLY O(index) operation in the update path.  Merges **base ∪
        delta segments** (NOT all segment dirs: segment files retain
        docs removed before earlier compactions, and re-merging them
        would resurrect the dead), writes every table to ``<name>.new``
        and swaps atomically, then clears the delta bookkeeping so the
        read-time view is a single base again."""
        manifest = self._load_manifest()
        stats = self._load_stats()
        cfg = self.config
        delta = list(manifest.get("delta_segments", []))
        tombs = sorted(int(t) for t in manifest.get("tombstones", []))
        if not delta and not tombs and not manifest.get("dict_deltas"):
            return manifest
        t_start = time.time()
        from .reader import filter_tombstones

        def new(name: str) -> str:
            return self._path(name + ".new")

        parts = [self.spark.read.parquet(self._path("postings"))]
        for s in delta:
            parts.append(self.spark.read.parquet(self._path("segments", s, "postings")))
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p, allowMissingColumns=True)
        merged = filter_tombstones(merged, tombs)
        (
            merged.repartition(cfg.n_buckets, "bucket")
            .sortWithinPartitions("bucket", "term", "doc_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(new("postings"))
        )
        postings = self.spark.read.parquet(new("postings"))

        # stats are already exact (integer arithmetic at update time)
        n_docs = int(stats["doc_count"])
        sum_len = int(stats.get("sum_doc_len") or round(stats["avg_doc_len"] * n_docs))
        avg_doc_len = (sum_len / n_docs) if n_docs else 0.0

        n_postings = self._write_blocks(postings, avg_doc_len, new("blocks"))
        n_terms = self._write_dictionary_from_blocks(
            new("blocks"), new("dictionary"), n_docs
        )

        docs_parts = [
            self.spark.read.parquet(self._path("docs")).select(
                "doc_id", "url", "doc_len"
            )
        ]
        for s in delta:
            docs_parts.append(
                self.spark.read.parquet(self._path("segments", s, "docs")).select(
                    "doc_id", "url", "doc_len"
                )
            )
        docs_all = docs_parts[0]
        for d in docs_parts[1:]:
            docs_all = docs_all.unionByName(d)
        filter_tombstones(docs_all, tombs).write.mode("overwrite").parquet(new("docs"))

        swap = ["postings", "dictionary", "docs", "blocks"]
        if cfg.store_tfidf:
            dict_df = self.spark.read.parquet(new("dictionary")).select(
                "bucket", "term", "df"
            )
            tfidf = (
                postings.join(dict_df, ["bucket", "term"])
                .filter(F.col("doc_len") > 0)
                .select(
                    "bucket",
                    "term",
                    "doc_id",
                    (
                        (F.col("tf").cast("double") / F.col("doc_len"))
                        * F.log(F.lit(float(n_docs)) / F.col("df"))
                    ).alias("score"),
                )
            )
            (
                tfidf.repartition(cfg.n_buckets, "bucket")
                .sortWithinPartitions("bucket", "term", "doc_id")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(new("tfidf"))
            )
            swap.append("tfidf")

        stats.update(
            {
                "doc_count": n_docs,
                "sum_doc_len": sum_len,
                "avg_doc_len": avg_doc_len,
                "base_avgdl_at_encode": avg_doc_len,
                "n_terms": int(n_terms),
                "n_terms_exact": True,
                "n_postings": int(n_postings),
                "table_bytes": {
                    t: _tree_bytes(new(t) if t in swap else self._path(t))
                    for t in ("postings", "blocks", "dictionary", "docs", "tokens", "tfidf")
                },
            }
        )
        manifest["delta_segments"] = []
        manifest["dict_deltas"] = []
        manifest["tombstones"] = []
        manifest["finalized"] = True
        manifest["stats"] = {k: stats[k] for k in self.STATS_KEYS}
        manifest["total_seconds"] = round(time.time() - t_start, 3)
        # COMMIT POINT: atomically record that the .new generation is
        # complete, together with the post-compaction bookkeeping; the
        # swap + cleanup below are idempotent roll-forward steps that
        # recover_compaction() re-runs after a crash anywhere past this
        # line.  A crash BEFORE this line leaves the live index
        # untouched and the deltas listed — compaction simply re-runs.
        commit = {"swap": swap, "stats": stats, "manifest": manifest}
        tmp = self._path("compact_commit.json") + ".tmp"
        with open(tmp, "w") as f:
            json.dump(commit, f, indent=2)
        os.replace(tmp, self._path("compact_commit.json"))
        _apply_compaction_commit(self.index_dir, commit)
        # the deletion-neighborhood sidecar (fuzzy_sidecar.py) covers
        # the BASE dictionary, which this compaction just swapped:
        # rebuild it if one was materialized.  Pure accelerator — a
        # crash here leaves a stale meta and fuzzy expansion falls back
        # to the range scan, never wrong results.
        from . import fuzzy_sidecar as _fs

        old_meta_p = _fs._meta_path(self.index_dir)
        if os.path.exists(old_meta_p):
            try:
                with open(old_meta_p) as f:
                    prev_edits = int(json.load(f).get("max_edits", 2))
            except Exception:
                prev_edits = 2
            _fs.build_fuzzy_sidecar(self.spark, self.index_dir, prev_edits)
        return manifest

    def build_fuzzy_sidecar(self, max_edits: int = 2) -> dict:
        """Materialize the deletion-neighborhood fuzzy sidecar over the
        base dictionary (see :mod:`fuzzy_sidecar`); once present it is
        kept fresh by :meth:`compact`."""
        from .fuzzy_sidecar import build_fuzzy_sidecar

        return build_fuzzy_sidecar(self.spark, self.index_dir, max_edits)

    # --------------------------------------------------------- accounting
    def compression_stats(self) -> dict:
        """B13: compressed vs uncompressed posting bytes (reference
        counts 4 B/posting uncompressed,
        ``selfindex_z1_simple_compression.py:180-215``; ours adds the
        tf and doc_len streams it ignored)."""
        blocks = self.spark.read.parquet(self._path("blocks"))
        row = blocks.agg(
            F.sum("n").alias("n_postings"),
            F.sum(
                F.length("doc_blob") + F.length("tf_blob") + F.length("len_blob")
            ).alias("compressed_bytes"),
            F.count("*").alias("n_blocks"),
        ).collect()[0]
        uncompressed = 3 * 4 * (row["n_postings"] or 0)  # 3 int32 streams
        comp = row["compressed_bytes"] or 0
        return {
            "n_postings": row["n_postings"],
            "n_blocks": row["n_blocks"],
            "compressed_bytes": int(comp),
            "uncompressed_bytes": int(uncompressed),
            "ratio": round(comp / uncompressed, 4) if uncompressed else None,
        }


# ------------------------------------------------------- index management

def list_indexes(root: str) -> List[str]:
    """B15: every finalized index directory under ``root``."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        if os.path.exists(os.path.join(root, name, "manifest.json")):
            out.append(name)
    return out


def delete_index(index_dir: str) -> bool:
    """B15: drop an index (reference ``selfindex_q_daat.py:260-274``)."""
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        return False
    shutil.rmtree(index_dir)
    return True
