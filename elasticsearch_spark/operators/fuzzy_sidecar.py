"""Deletion-neighborhood sidecar for fuzzy expansion — the
Levenshtein-automaton analogue the CLAUDE notes flagged: Lucene
intersects an automaton with its term FST so a fuzzy query never scans
the dictionary; at ``prefix_length=0`` our range-scan expansion
(``expand.fuzzy_terms``) degrades to a FULL dictionary read, which at a
web-scale vocabulary (10^7-10^8 terms) is the one remaining
scan-everything query path.

This sidecar applies the symmetric-delete principle (the public
SymSpell algorithm): if ``lev(a, b) <= e`` — substitutions, inserts and
deletes — then deleting at most ``e`` characters from each of ``a`` and
``b`` reaches a COMMON variant.  So precompute every base-dictionary
term's deletion variants (``<= max_edits`` deletions) into a parquet
table ``(del_key, term)`` hash-bucketed on ``del_key``, and a fuzzy
query becomes:

1. generate the query term's own deletion neighborhood
   (``O(len^max_edits)`` keys, ~100 for a 12-char term at e=2);
2. point-read the sidecar with ``del_key IN neighborhood`` (hive
   ``bucket=`` pruning + row-group stats on the sorted ``del_key``) —
   the same driver-side pyarrow shape as the df point lookup;
3. verify true levenshtein on the candidate terms (drops the
   symmetric-delete false positives), then fetch LIVE df for the
   survivors (``reader.live_df_lookup`` — signed sources, so removed
   terms drop out) and apply the ES ``top_terms`` cap.

Scale: at e=2 and mean term length L≈8 the sidecar holds ~1+L+L²/2 ≈ 37
rows per vocabulary term — 100× smaller than the postings table — and
every query touches only its own neighborhood.  The sidecar covers the
BASE dictionary only; delta-segment terms (O(delta) by the LSM
invariant) are unioned in at query time by scanning just the delta
dictionary partials, and ``IndexBuilder.compact()`` rebuilds the
sidecar when it swaps a new base in.  Staleness is detected by
comparing the recorded base ``dictionary`` mtime (the same
mtime-invalidation pattern the engine caches use); a stale or missing
sidecar silently falls back to the range scan, so the sidecar is a
pure accelerator — it can never change results.

Reference parity: the reference engine has no fuzzy query at all (its
grammar is match/boolean/phrase, ``selfindex_q_taat.py``); this is the
ES ``fuzzy`` query's scale path, per SURVEY §2.9's beyond-reference
surface.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Set

import pandas as pd

SIDECAR_DIR = "fuzzy_sidecar"
META_FILE = "fuzzy_sidecar.meta.json"
DEFAULT_MAX_EDITS = 2


def deletion_variants(term: str, max_edits: int) -> List[str]:
    """All strings reachable from ``term`` by deleting at most
    ``max_edits`` characters, the term itself included, sorted.
    |result| is O(len^max_edits): 1 + L + L(L-1)/2 at e=2."""
    out = {term}
    frontier = {term}
    for _ in range(max_edits):
        nxt: Set[str] = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1:])
        frontier = nxt - out
        out |= nxt
        if not frontier:
            break
    return sorted(out)


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, META_FILE)


def _dict_mtime(index_dir: str) -> float:
    return os.path.getmtime(os.path.join(index_dir, "dictionary"))


def load_meta(index_dir: str) -> Optional[dict]:
    """Sidecar metadata if present AND current (base dictionary mtime
    matches the one recorded at build), else None."""
    p = _meta_path(index_dir)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            meta = json.load(f)
        if meta.get("dict_mtime") != _dict_mtime(index_dir):
            return None  # base swapped (compaction) after sidecar build
        if not os.path.isdir(os.path.join(index_dir, SIDECAR_DIR)):
            return None
        return meta
    except Exception:
        return None


def build_fuzzy_sidecar(spark, index_dir: str,
                        max_edits: int = DEFAULT_MAX_EDITS) -> dict:
    """Materialize the deletion-neighborhood sidecar for the BASE
    dictionary: explode each distinct term into its deletion variants
    (Arrow-batched pandas UDF — build path, not per-row Python), hash-
    bucket on ``del_key`` with the index's own ``n_buckets``, and write
    bucket-led sorted runs so point reads prune on partition + row-group
    stats.  Writes to ``fuzzy_sidecar.new`` then swaps; the meta file is
    written LAST, so a crash anywhere leaves a missing/stale meta and
    queries fall back to the range scan."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from ..functions.udfs import term_bucket_col
    from .reader import load_stats

    stats = load_stats(index_dir)
    n_buckets = int(stats["config"]["n_buckets"])
    dict_mtime = _dict_mtime(index_dir)

    @pandas_udf("array<string>")
    def variants(terms: pd.Series) -> pd.Series:
        return terms.map(lambda t: deletion_variants(t, max_edits))

    base = (
        spark.read.parquet(os.path.join(index_dir, "dictionary"))
        .select("term")
        .distinct()
    )
    rows = (
        base.withColumn("del_key", F.explode(variants(F.col("term"))))
        .withColumn("bucket", term_bucket_col(F.col("del_key"), n_buckets))
    )
    new_dir = os.path.join(index_dir, SIDECAR_DIR + ".new")
    (
        rows.repartition(n_buckets, "bucket")
        .sortWithinPartitions("bucket", "del_key", "term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(new_dir)
    )
    import shutil

    cur = os.path.join(index_dir, SIDECAR_DIR)
    meta_p = _meta_path(index_dir)
    if os.path.exists(meta_p):
        os.remove(meta_p)  # invalidate BEFORE touching the table
    if os.path.isdir(cur):
        shutil.rmtree(cur)
    os.rename(new_dir, cur)
    meta = {
        "max_edits": int(max_edits),
        "n_buckets": n_buckets,
        "dict_mtime": dict_mtime,
    }
    tmp = meta_p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, meta_p)
    return meta


def base_candidates(index_dir: str, term: str,
                    max_edits: int) -> Optional[Set[str]]:
    """Base-dictionary candidate terms whose deletion neighborhood
    intersects ``term``'s — a SUPERSET of the true lev<=max_edits
    matches (callers verify).  None when the sidecar is absent, stale,
    or was built for a smaller ``max_edits`` (fallback to range scan).

    Driver-side pyarrow point read: ``bucket`` partition pruning +
    ``del_key IN neighborhood`` against sorted row-group stats — no
    Spark job, same shape as ``reader._df_point_lookup``."""
    meta = load_meta(index_dir)
    if meta is None or max_edits > int(meta["max_edits"]):
        return None
    keys = deletion_variants(term, max_edits)
    try:
        import pyarrow.dataset as pads

        from ..functions.udfs import term_bucket

        n_buckets = int(meta["n_buckets"])
        ds = pads.dataset(
            os.path.join(index_dir, SIDECAR_DIR), partitioning="hive"
        )
        buckets = sorted({term_bucket(k, n_buckets) for k in keys})
        expr = pads.field("bucket").isin(buckets) & pads.field("del_key").isin(
            keys
        )
        tbl = ds.to_table(columns=["term"], filter=expr)
        return set(tbl["term"].to_pylist())
    except Exception:
        return None
