"""Corpus-curation pipeline stages: benchmark decontamination, deterministic
stratified sampling, and per-source quality filtering.

These are the curation steps a training-data pipeline runs around the dedup
family (quality filter → dedup → decontaminate → sample/mix).  No reference
counterpart (the reference is a time-series engine); the operators follow the
published pipeline recipes (C4/CCNet-style n-gram decontamination against
eval suites, hash-based stratified sampling, quality-quantile filtering).

Scale design (the part that matters at 100 TB):

- ``decontaminate``: the benchmark n-gram set is broadcast — eval suites are
  megabytes by definition, the corpus side never shuffles its text; the only
  exchange carries one pre-reduced (doc_id, hit_count) row per document.
- ``stratified_sample``: pure map-side filter on an md5-derived sampling key
  — zero shuffle, zero driver involvement, restartable (the key is a pure
  function of doc_id, so re-runs and per-partition retries keep the exact
  same sample).
- ``quality_topp_filter``: exact per-source top-p WITHOUT a corpus-wide
  per-source sort.  Quality is 6-dp-quantized, so the per-source
  (quality → count) histogram is small (≤ 10^6 rows/source worst case);
  the cutoff is derived from the histogram's running sum and docs are kept
  by a broadcast threshold join.  The only per-doc window runs within
  single (stratum, quality) levels — partitions bounded by quality-value
  collisions, never a whole stratum.  A naive ``row_number() OVER
  (PARTITION BY source ORDER BY quality)`` would sort the full corpus per
  source and die on skewed sources.

All three stages are pure Spark column expressions / joins (JVM-side,
whole-stage codegen; no Python UDFs) and exactly mirrored by DuckDB oracles
in queries.py (md5 sampling keys and integer cutoff arithmetic are
engine-portable by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .dedup import word_shingles


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    tau: float = 0.1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs whose word n-gram overlap
    with a benchmark (eval-suite) document set exceeds ``tau``.

    Returns one row per non-benchmark doc: ``(doc_id, n_shingles, n_hit,
    contamination, contaminated)`` with ``contamination = n_hit/n_shingles``
    rounded to 6 dp (0.0 for shingle-less docs).

    ``benchmark`` must be small in the broadcast sense (eval suites are);
    its distinct n-grams are broadcast so the corpus text never shuffles.
    Joined on the shingle text itself — safe because the join is broadcast
    (no exchange to widen) and exact (no hash-collision false positives to
    diverge from the oracle).
    """
    bench_ids = benchmark.select(F.col(id_col).alias("doc_id"))
    bench_grams = (
        word_shingles(benchmark, n, id_col=id_col)
        .select(F.explode("shingles").alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # single pass over the (CPU-dominant) shingle computation: explode_outer
    # keeps shingle-less docs alive, the broadcast marker join tags benchmark
    # grams, and one map-side-combined aggregation recovers BOTH the shingle
    # count and the hit count — no cache, no second scan of the corpus text
    ex = (
        word_shingles(docs, n, id_col=id_col)
        .join(bench_ids, "doc_id", "left_anti")
        .select("doc_id", F.explode_outer("shingles").alias("gram"))
        .join(F.broadcast(bench_grams), "gram", "left")
    )
    agg = ex.groupBy("doc_id").agg(
        F.count("gram").alias("n_shingles"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_hit"),
    )
    ratio = F.round(F.col("n_hit") / F.greatest("n_shingles", F.lit(1)), 6)
    return agg.select(
        "doc_id",
        F.col("n_shingles").cast("int").alias("n_shingles"),
        "n_hit",
        ratio.alias("contamination"),
        (ratio >= tau).alias("contaminated"),
    )


def sample_key(id_col: str = "doc_id", salt: str = "sample") -> F.Column:
    """Deterministic 32-bit sampling key in [0, 2^32): first 8 hex chars of
    md5('<salt>:<id>').  Engine-portable (DuckDB twin:
    ``CAST('0x' || substr(md5('<salt>:' || CAST(id AS VARCHAR)), 1, 8) AS
    BIGINT)``) and a pure function of the id — retries, re-runs, and
    incremental appends all sample consistently."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum hash sampling — the source-mixing stage of
    a training pipeline (each stratum kept at its target rate).

    Keeps a doc iff ``sample_key(doc_id) < floor(rate(stratum) * 2^32)``;
    thresholds are materialized as exact integer literals so the Spark path
    and the SQL oracle compare identically.  Map-side only: no shuffle, no
    driver state, sample membership is a pure function of the row.
    """
    thresholds = {s: min(int(r * 2**32), 2**32) for s, r in rates.items()}
    default_t = min(int(default_rate * 2**32), 2**32)
    t = F.lit(default_t)
    for s, thr in sorted(thresholds.items()):
        t = F.when(F.col(strata_col) == s, F.lit(thr)).otherwise(t)
    key = sample_key(id_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).alias("stratum"),
        key.alias("skey"),
    ).filter(key < t)


def quality_topp_filter(
    docs: DataFrame,
    quality: F.Column,
    keep_percent: int = 40,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-stratum top-p quality filter via histogram cutoff.

    Keeps exactly ``K = ceil(keep_percent% · n_stratum)`` docs per stratum:
    the highest-quality levels in full, and at the single boundary level the
    smallest doc_ids first (deterministic tie-break).  ``keep_percent`` is
    an integer so K's arithmetic is integer-exact in both engines
    (``(n·pct + 99) div 100``); ``quality`` must be a deterministic
    6-dp-rounded expression (see textstats.quality_score) so the histogram
    is small and both engines bucket identically.

    Shuffle profile: pass 1 map-side-combines the corpus down to the
    (stratum, quality) histogram (pure CPU, nothing pinned); pass 2 probes
    the broadcast cutoffs and row_numbers only within single (stratum,
    quality) levels — partitions bounded by the count of docs sharing one
    quantized quality value, never a whole stratum.  The quality expression
    is computed twice by design: two streaming passes beat caching a
    corpus-sized scored frame at the target scale.
    """
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).alias("stratum"),
        quality.alias("quality"),
    )
    hist = scored.groupBy("stratum", "quality").agg(F.count("*").alias("cnt"))
    w = W.partitionBy("stratum").orderBy(F.desc("quality"))
    lv = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "k",
        F.expr(f"div(sum(cnt) over (partition by stratum) * {keep_percent} + 99, 100)"),
    )
    # per (stratum, quality) level: how many docs to admit at this level
    admit = lv.select(
        "stratum",
        "quality",
        F.greatest(
            F.lit(0), F.least(F.col("cnt"), F.col("k") - (F.col("cum") - F.col("cnt")))
        ).alias("n_admit"),
        F.col("cnt").alias("cnt"),
    ).filter(F.col("n_admit") > 0)
    wb = W.partitionBy("stratum", "quality").orderBy("doc_id")
    return (
        scored.join(F.broadcast(admit), ["stratum", "quality"])
        .withColumn("rn", F.row_number().over(wb))
        .filter((F.col("n_admit") == F.col("cnt")) | (F.col("rn") <= F.col("n_admit")))
        .select("doc_id", "stratum", "quality")
    )


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    quality: F.Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    keep_percent: int = 40,
    n: int = 3,
    tau: float = 0.1,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """The fused corpus-curation pipeline in the published recipe order:
    per-source quality top-p -> exact dedup among survivors -> benchmark
    decontamination -> deterministic stratified sample.

    Returns the final kept set as ``(doc_id, stratum, quality, skey)``.

    Stage composition is pure keep-list joins on the fixed-width id key:
    each stage computes its verdict from its own scan of the (columnar,
    predicate-pruned) text and contributes only a doc_id set to the chain,
    so no exchange ever carries document text.  Dedup runs on QUALITY
    SURVIVORS (the kept doc of a dup group is the smallest id that passed
    the quality bar, matching what a staged pipeline would produce), and
    decontamination runs on dedup survivors — each stage sees exactly the
    corpus the previous stage emitted.

    Each stage's keep-list is eagerly ``localCheckpoint``-ed — the
    distributed analogue of the stage materialization a warehouse pipeline
    does between jobs.  The checkpointed frames are NARROW (ids + at most
    stratum/quality, never text), so executor storage cost is a few bytes
    per surviving doc.  Without this the lazy join cascade duplicates
    every upstream subtree per downstream reference — the measured single-
    action plan holds 32 parquet scans with ZERO ReusedExchange nodes
    (Catalyst does not collapse them; the quality histogram alone
    evaluates 4×) vs one scan per stage checkpointed.  On the 500-doc test
    corpus the two shapes time equally (job overhead dominates); the
    checkpointed shape is what survives a corpus 10^6× larger, where each
    duplicated subtree is a full corpus scan."""
    from .dedup import exact_dedup

    kept_q = quality_topp_filter(
        docs, quality, keep_percent, strata_col, id_col).localCheckpoint()
    surv_q = docs.join(kept_q.select(F.col("doc_id").alias(id_col)), id_col)
    dd_keep = exact_dedup(surv_q, id_col=id_col).select(
        F.col("keep_id").alias(id_col)).localCheckpoint()
    surv_d = surv_q.join(dd_keep, id_col)
    flags = decontaminate(surv_d, benchmark, n=n, tau=tau, id_col=id_col)
    clean = flags.filter(~F.col("contaminated")).select(
        F.col("doc_id").alias(id_col)).localCheckpoint()
    surv_c = surv_d.join(clean, id_col)
    sampled = stratified_sample(surv_c, rates, default_rate, strata_col, id_col)
    return sampled.join(
        kept_q.select("doc_id", "quality"), "doc_id"
    ).select("doc_id", "stratum", "quality", "skey")
