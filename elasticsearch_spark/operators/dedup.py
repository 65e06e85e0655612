"""Deduplication operators for large-scale corpus curation.

All DataFrame-native (JVM xxhash64, no Python in the hot path), designed
for the 10^12-doc regime:

* exact:    content-hash groupBy — one shuffle on a 64-bit key.
* minhash:  k permutations via xxhash64(seed, token), LSH banding; only
            band-bucket groups shuffle, candidate verification computes
            exact Jaccard on the (tiny) candidate set.
* simhash:  tf-weighted 64-bit signature; near-pairs via the 4x16-bit
            band trick + Hamming verification (bit_count).
* ngram:    shingle-based exact Jaccard — the brute-force baseline used
            to validate the sketch paths on small corpora.

The entry-gate twins of these (md5-based, DuckDB-checkable) live in
``plans/entry_queries.py``; these versions trade portability for speed.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

# Default per-bucket member cap for the banded near-dup paths: buckets
# larger than this switch from all-pairs (n²/2 candidates) to min-id
# STAR form (n−1).  1000 bounds any one bucket's candidate contribution
# at ~500k pairs — far above any honest near-dup cluster a band bucket
# should hold at web scale, and small enough that a pathological dense
# cluster (the skew case that kills 10^12-row jobs) stays linear.
# Callers pass bucket_cap=None to opt back into guaranteed-complete
# all-pairs, or an int to tune.
DEFAULT_BUCKET_CAP = 1000

BucketCap = Union[int, None, str]


def _resolve_cap(bucket_cap: BucketCap) -> Optional[int]:
    if bucket_cap == "auto":
        return DEFAULT_BUCKET_CAP
    return bucket_cap


def exact_duplicates(df: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """(id, content_hash, canon_id, is_dup): canonical = min id per
    identical content."""
    h = F.xxhash64(F.col(text_col)).alias("content_hash")
    w = Window.partitionBy("content_hash")
    return (
        df.select(F.col(id_col).alias("id"), h)
        .withColumn("canon_id", F.min("id").over(w))
        .withColumn("is_dup", F.col("id") != F.col("canon_id"))
    )


def _token_set(df: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(F.col(tokens_col))).alias("token")
    )


def minhash_signatures(df: DataFrame, id_col: str, tokens_col: str,
                       n_hashes: int = 32) -> DataFrame:
    """(id, perm, minhash) — k permutations as min over xxhash64(perm,
    token).  Single shuffle: k per-perm MIN aggregates in one
    groupBy(id) with map-side combine (no k-way crossJoin fan-out),
    then an explode back to the row shape."""
    toks = _token_set(df, id_col, tokens_col)
    wide = toks.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.lit(i).cast("int"), F.col("token"))).alias(f"m{i}")
            for i in range(n_hashes)
        ]
    )
    perms = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("perm"), F.col(f"m{i}").alias("minhash")
            )
            for i in range(n_hashes)
        ]
    )
    return wide.select("id", F.explode(perms).alias("s")).select(
        "id", F.col("s.perm").alias("perm"), F.col("s.minhash").alias("minhash")
    )


def _bucket_self_pairs(banded: DataFrame, cap: Optional[int],
                       with_hash: bool,
                       cap_observation: Optional[Observation] = None
                       ) -> DataFrame:
    """Self-pairs within (q, qk) buckets — the shared candidate
    generator behind every band-bucket near-dup path.

    ``banded`` carries (id, q, qk[, h]).  Without ``cap`` this is the
    plain triangular self-join: a bucket of n members emits n(n−1)/2
    candidates — quadratic, and a dense duplicate CLUSTER (the skew
    case real web corpora always have) makes one bucket dominate the
    whole job.  With ``cap``, buckets larger than ``cap`` switch to
    STAR form: every member pairs with the bucket's min-id
    representative only (n−1 candidates, linear).  Star pairing
    preserves the CONNECTED COMPONENTS of the candidate graph exactly —
    within one bucket, all-pairs and star have identical components —
    which is the property dedup clustering consumes; what it gives up
    is the explicit member×member pair list inside an over-cap bucket
    (those pairs reach each other through the representative).  This is
    a semantic guarantee, not silent truncation: no member ever drops
    out of the candidate graph.

    CAVEAT (verified-pair completeness): when the caller VERIFIES the
    star candidates with a distance cut (Hamming ≤ k, Jaccard ≥ t), an
    over-cap member whose distance to the min-id representative fails
    the cut is dropped even if it is within the cut of some OTHER
    bucket member — sharing one band does not bound the distance to the
    representative.  Verified-edge completeness therefore holds only
    with ``cap=None``; with a cap the guarantee is candidate-GRAPH
    component preservation, and the verified output may miss
    member×member edges inside over-cap buckets.

    ``cap_observation``: an :class:`~pyspark.sql.Observation` to attach
    to the over-cap branch — after the caller's first action it reports
    ``capped_buckets`` (distinct over-cap (band, bucket) groups) and
    ``capped_rows`` (members routed through star form), so a capped run
    is VISIBLE in job stats rather than a silent semantics change.

    Cost: one extra window shuffle on the band key; the join side is
    bounded by cap²/2 per bucket + n−1 star rows."""
    cols = ["id", "q", "qk"] + (["h"] if with_hash else [])
    banded = banded.select(*cols)
    if with_hash:
        sel_a = [F.col("a.id").alias("a"), F.col("b.id").alias("b"),
                 F.col("a.h").alias("ha"), F.col("b.h").alias("hb")]
    else:
        sel_a = [F.col("a.id").alias("a"), F.col("b.id").alias("b")]
    if cap is None:
        a, b = banded.alias("a"), banded.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.q") == F.col("b.q"))
                & (F.col("a.qk") == F.col("b.qk"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(*sel_a)
            .distinct()
        )
        if cap_observation is not None:
            # uncapped run: attach the observation anyway (all zeros) —
            # a caller combining bucket_cap=None with cap stats would
            # otherwise hang forever in Observation.get (no plan ever
            # carries the observation)
            pairs = pairs.observe(
                cap_observation,
                (F.count(F.lit(1)) * 0).alias("capped_buckets"),
                (F.count(F.lit(1)) * 0).alias("capped_rows"),
            )
        return pairs
    w = Window.partitionBy("q", "qk")
    rep_struct = F.min(
        F.struct("id", *(["h"] if with_hash else []))
    ).over(w)
    sized = banded.withColumn("_n", F.count(F.lit(1)).over(w)).withColumn(
        "_rep", rep_struct
    )
    small = sized.filter(F.col("_n") <= cap).drop("_n", "_rep")
    a, b = small.alias("a"), small.alias("b")
    small_pairs = a.join(
        b,
        (F.col("a.q") == F.col("b.q"))
        & (F.col("a.qk") == F.col("b.qk"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(*sel_a)
    star_sel = [F.col("_rep.id").alias("a"), F.col("id").alias("b")]
    if with_hash:
        star_sel += [F.col("_rep.h").alias("ha"), F.col("h").alias("hb")]
    over = sized.filter(F.col("_n") > cap)
    if cap_observation is not None:
        # observed metrics forbid DISTINCT aggregates: count each
        # over-cap bucket via its representative's own row instead
        # (exactly one per bucket) — same number, plain SUM
        over = over.observe(
            cap_observation,
            F.sum(
                F.when(F.col("id") == F.col("_rep.id"), 1).otherwise(0)
            ).alias("capped_buckets"),
            F.count(F.lit(1)).alias("capped_rows"),
        )
    star_pairs = (
        over.filter(F.col("id") != F.col("_rep.id"))
        .select(*star_sel)
    )
    return small_pairs.unionByName(star_pairs).distinct()


def minhash_lsh_pairs(df: DataFrame, id_col: str = "url", tokens_col: str = "tokens",
                      n_hashes: int = 32, bands: int = 8,
                      verify_threshold: Optional[float] = None,
                      bucket_cap: BucketCap = "auto",
                      cap_observation: Optional[Observation] = None
                      ) -> DataFrame:
    """LSH candidate pairs (a, b); with ``verify_threshold`` also
    computes exact Jaccard on candidates and filters (a, b, jaccard).

    ``bucket_cap`` bounds the per-bucket quadratic blowup from dense
    duplicate clusters: over-cap band buckets emit min-id-representative
    STAR pairs instead of all-pairs (the 100-TB skew guard), DEFAULT ON
    at ``DEFAULT_BUCKET_CAP`` so a naive caller never runs an unbounded
    quadratic join.  Candidate-graph components are preserved, but with
    ``verify_threshold`` set an over-cap member whose Jaccard to the
    REPRESENTATIVE is below threshold is dropped even if it clears the
    threshold against another bucket member — verified-pair
    completeness holds only with ``bucket_cap=None`` (see
    :func:`_bucket_self_pairs`).  Pass ``cap_observation`` to get
    (capped_buckets, capped_rows) job stats after the first action."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, tokens_col, n_hashes)
    band_sig = sig.groupBy(
        "id", (F.col("perm") / rows_per_band).cast("int").alias("band")
    ).agg(F.xxhash64(F.sort_array(F.collect_list(F.struct("perm", "minhash")))).alias("bh"))
    pairs = _bucket_self_pairs(
        band_sig.select(
            "id", F.col("band").alias("q"), F.col("bh").alias("qk")
        ),
        _resolve_cap(bucket_cap),
        with_hash=False,
        cap_observation=cap_observation,
    )
    if verify_threshold is None:
        return pairs
    return verify_jaccard(pairs, df, id_col, tokens_col).filter(
        F.col("jaccard") >= verify_threshold
    )


def verify_jaccard(pairs: DataFrame, df: DataFrame, id_col: str,
                   tokens_col: str) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs: (a, b, jaccard)."""
    toks = _token_set(df, id_col, tokens_col)
    cnt = toks.groupBy("id").agg(F.count("*").alias("n"))
    ta = toks.select(F.col("id").alias("a"), "token")
    tb = toks.select(F.col("id").alias("b"), "token")
    inter = (
        pairs.join(ta, "a").join(tb, ["b", "token"]).groupBy("a", "b").agg(
            F.count("*").alias("c")
        )
    )
    na = cnt.select(F.col("id").alias("a"), F.col("n").alias("na"))
    nb = cnt.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    return (
        pairs.join(inter, ["a", "b"], "left")
        .na.fill({"c": 0})
        .join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
    )


def simhash64(df: DataFrame, id_col: str = "url", tokens_col: str = "tokens") -> DataFrame:
    """(id, simhash) — tf-weighted 64-bit SimHash from xxhash64 term
    hashes.  Single shuffle: 64 per-bit SUM aggregates in one groupBy
    (map-side combine) then a bit-pack expression; no 64x bit-fanout
    join, so shuffle rows = |(doc, token)| pairs."""
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(F.col(tokens_col)).alias("token"))
        .groupBy("id", "token")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.xxhash64("token"))
    )
    contribs = tf.groupBy("id").agg(
        *[
            F.sum(F.col("tf") * (2 * F.expr(f"(h >> {bit}) & 1") - 1)).alias(f"c{bit}")
            for bit in range(64)
        ]
    )
    # bit 63 is the sign bit: build the signature as the XOR-style sum of
    # per-bit longs; shiftleft(1L, 63) wraps to Long.MIN_VALUE, which is
    # exactly the two's-complement encoding bit_count/XOR expect.
    packed = None
    for bit in range(64):
        term = F.when(
            F.col(f"c{bit}") > 0, F.expr(f"shiftleft(1L, {bit})")
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return contribs.select("id", packed.cast("long").alias("simhash"))


def hamming_near_pairs(sig: DataFrame, id_col: str = "id",
                       hash_col: str = "simhash", n_bits: int = 64,
                       n_bands: Optional[int] = None,
                       max_hamming: int = 3,
                       bucket_cap: BucketCap = "auto",
                       cap_observation: Optional[Observation] = None
                       ) -> DataFrame:
    """(a, b, hamming ≤ max_hamming) over ANY precomputed ≤64-bit hash
    column, via the band pigeonhole: split the hash into ``n_bands``
    contiguous bit bands — a pair within Hamming distance n_bands − 1
    must agree EXACTLY on at least one band, so candidates are pairs
    sharing a (band, band-bits) bucket (never all pairs; the 10^12-row
    shape) and exact verification (xor + bit_count) runs on candidates
    only.  Completeness therefore requires n_bands ≥ max_hamming + 1 —
    the default sizes the bands exactly so, and an explicit smaller
    n_bands raises instead of silently dropping pairs.

    Generic consumers: token simhash (:func:`simhash_near_pairs`),
    image perceptual hashes (multimodal.phash_near_pairs), any
    fingerprint column.  Band keys mask away arithmetic-shift sign
    extension (negative hashes band correctly), and bands past the top
    bit are constant 0 (Java shifts wrap mod 64, so ``h >> 64`` must
    never be emitted).

    ``bucket_cap`` bounds the per-bucket quadratic blowup from dense
    duplicate clusters — over-cap band buckets emit STAR pairs via the
    min-id representative, DEFAULT ON at ``DEFAULT_BUCKET_CAP`` (no
    silent unbounded quadratic join for naive callers).  The Hamming
    filter then applies to rep×member pairs only: sharing a band does
    NOT bound a member's distance to the representative, so an over-cap
    member farther than ``max_hamming`` from the representative is
    dropped even when it is within ``max_hamming`` of another member —
    the pigeonhole completeness contract holds only with
    ``bucket_cap=None`` (see :func:`_bucket_self_pairs`); with a cap
    the guarantee weakens to candidate-graph component preservation.
    Pass ``cap_observation`` to surface (capped_buckets, capped_rows)
    in job stats after the first action."""
    if n_bands is None:
        n_bands = max_hamming + 1
    elif max_hamming > n_bands - 1:
        raise ValueError(
            f"banding guarantees completeness only up to n_bands-1="
            f"{n_bands - 1} bit flips; got max_hamming={max_hamming}"
        )
    width = (n_bits + n_bands - 1) // n_bands
    mask = (1 << width) - 1

    def band_key(band: int):
        shift = width * band
        if shift >= n_bits:
            return F.lit(0).cast("long")
        return F.expr(f"({hash_col} >> {shift}) & {mask}")

    bands = [
        sig.select(
            F.col(id_col).alias("id"),
            F.col(hash_col).alias("h"),
            F.lit(band).alias("q"),
            band_key(band).alias("qk"),
        )
        for band in range(n_bands)
    ]
    banded = bands[0]
    for qdf in bands[1:]:
        banded = banded.unionByName(qdf)
    cand = _bucket_self_pairs(banded, _resolve_cap(bucket_cap),
                              with_hash=True,
                              cap_observation=cap_observation)
    return (
        cand.withColumn("hamming", F.bit_count(F.expr("ha ^ hb")))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def simhash_near_pairs(df: DataFrame, id_col: str = "url", tokens_col: str = "tokens",
                       max_hamming: int = 3,
                       bucket_cap: BucketCap = "auto",
                       cap_observation: Optional[Observation] = None
                       ) -> DataFrame:
    """(a, b, hamming ≤ max_hamming) via the band pigeonhole (e.g. the
    classic 4x16-bit quarters for max_hamming=3): any pair within
    Hamming distance n_bands−1 shares at least one band exactly; bands
    auto-size to max_hamming+1 so the candidate set is complete WHEN
    ``bucket_cap=None``.  ``bucket_cap`` (default on, see
    :func:`hamming_near_pairs` for the star-form semantics and the
    verified-pair completeness caveat): dense-cluster skew guard."""
    sig = simhash64(df, id_col, tokens_col)
    return hamming_near_pairs(
        sig, id_col="id", hash_col="simhash", n_bits=64,
        max_hamming=max_hamming, bucket_cap=bucket_cap,
        cap_observation=cap_observation,
    )


def ngram_shingles(df: DataFrame, id_col: str, tokens_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) — distinct n-gram shingles of the token sequence."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(tokens_col) - n, F.lit(-1))),
                    lambda i: F.concat_ws(" ", F.slice(F.col(tokens_col), i + 1, n)),
                )
            )
        ).alias("shingle"),
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "url", tokens_col: str = "tokens",
                        n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold (brute-force baseline)."""
    sh = ngram_shingles(df, id_col, tokens_col, n)
    cnt = sh.groupBy("id").agg(F.count("*").alias("cnt"))
    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
    )
    na = cnt.select(F.col("id").alias("a"), F.col("cnt").alias("na"))
    nb = cnt.select(F.col("id").alias("b"), F.col("cnt").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(na, "a").join(nb, "b").filter(jac >= threshold)
        .select("a", "b", jac.alias("jaccard"))
    )
