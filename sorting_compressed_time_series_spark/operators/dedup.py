"""Deduplication operators for training-data pipelines.

Four families, all deterministic (seeded hashes only):
- exact: normalize → hash-groupBy (one shuffle, map-side combined);
- n-gram Jaccard: shingle explode → self-join on shingle → pair counts
  (the exact pairwise similarity, pushed through joins — no UDFs);
- MinHash + LSH banding: xxhash64 permutations → per-band bucket join →
  candidates → exact Jaccard verify (the 100 TB path: candidate
  generation is linear in corpus size, quadratic only within buckets);
- SimHash: 64-bit sign-aggregated fingerprint, hamming-adjacent buckets.

At cluster scale the shingle explode is the skew hazard (stopword-like
shingles fan out); `jaccard_pairs` salts nothing but caps per-shingle
fan-out with a frequency filter — the standard trick: a shingle shared by
more than `max_df` docs carries ~no signal and would dominate the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NORMALIZE = "lower(regexp_replace(trim(text), '\\\\s+', ' '))"


def normalized(docs: DataFrame) -> DataFrame:
    return docs.withColumn("norm_text", F.expr(NORMALIZE))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) docs; keep the smallest id."""
    return (
        normalized(docs)
        .groupBy("norm_text")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .select("keep_id", "n_dups")
    )


def word_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc (n=1 → word set)."""
    d = normalized(docs).withColumn("w", F.split("norm_text", " "))
    if n == 1:
        sh = F.array_distinct("w")
    else:
        sh = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("w") - n, F.lit(-1))),
                lambda i: F.concat_ws(
                    " ", *[F.col("w")[i + off] for off in range(n)]
                ),
            )
        )
    return d.select(F.col(id_col).alias("doc_id"), sh.alias("shingles"))


def jaccard_pairs(
    docs: DataFrame, n: int = 3, tau: float = 0.5, max_df: int | None = None
) -> DataFrame:
    """All pairs (a<b) with |A∩B| / |A∪B| >= tau on word n-gram shingles."""
    sh = word_shingles(docs, n).withColumn("sz", F.size("shingles"))
    ex = sh.select("doc_id", "sz", F.explode("shingles").alias("sh"))
    if max_df is not None:
        hot = ex.groupBy("sh").count().filter(F.col("count") > max_df).select("sh")
        ex = ex.join(F.broadcast(hot), "sh", "left_anti")
    a = ex.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"), "sh")
    b = ex.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", "sza", "szb")
        .agg(F.count("*").alias("inter"))
    )
    jac = inter.withColumn(
        "jaccard", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
    )
    return jac.filter(F.col("jaccard") >= tau).select("a", "b", "jaccard")


def minhash_signatures(docs: DataFrame, num_perm: int = 32, n: int = 3) -> DataFrame:
    """MinHash signature per doc: min over shingles of xxhash64(sh, seed_i)."""
    ex = word_shingles(docs, n).select("doc_id", F.explode("shingles").alias("sh"))
    aggs = [
        F.min(F.xxhash64("sh", F.lit(i))).alias(f"mh{i}") for i in range(num_perm)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    docs: DataFrame, num_perm: int = 32, bands: int = 8, n: int = 3
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.
    Estimated Jaccard = fraction of matching minhash components."""
    sig = minhash_signatures(docs, num_perm, n).cache()
    r = num_perm // bands
    # one pass: explode an array of (band, bucket) structs instead of a
    # bands-way union (each union arm re-scanned the signature frame)
    band_structs = F.array(*[
        F.struct(
            F.lit(bidx).alias("band"),
            F.xxhash64(*[F.col(f"mh{bidx * r + j}") for j in range(r)]).alias("bucket"),
        )
        for bidx in range(bands)
    ])
    buckets = sig.select(
        "doc_id", F.explode(band_structs).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    l = buckets.select(F.col("doc_id").alias("a"), "band", "bucket")
    rr = buckets.select(F.col("doc_id").alias("b"), "band", "bucket")
    cand = (
        l.join(rr, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    siga = sig.select(F.col("doc_id").alias("a"), *[F.col(f"mh{i}").alias(f"ha{i}") for i in range(num_perm)])
    sigb = sig.select(F.col("doc_id").alias("b"), *[F.col(f"mh{i}").alias(f"hb{i}") for i in range(num_perm)])
    est = cand.join(siga, "a").join(sigb, "b")
    match_frac = sum(
        (F.col(f"ha{i}") == F.col(f"hb{i}")).cast("int") for i in range(num_perm)
    ) / num_perm
    return est.select("a", "b", match_frac.alias("est_jaccard"))


def simhash(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word hashes: bit b of the fingerprint is the sign
    of sum over words of (bit b of xxhash64(word) ? +1 : -1), built with
    bit arithmetic on the exploded words — stays JVM-side."""
    ex = normalized(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split("norm_text", " ")).alias("w"),
    ).withColumn("h", F.xxhash64("w"))
    aggs = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    per_bit = ex.groupBy("doc_id").agg(*aggs)
    fp = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << b).cast("long") if b < 63 else F.when(
            F.col(f"b{b}") > 0, F.lit(-(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return per_bit.select("doc_id", fp.alias("simhash"))
