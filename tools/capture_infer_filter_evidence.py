"""Plan evidence for the round-6 InferFiltersFromGenerate finding.

Eight registry queries eagerly localCheckpoint inside their builders, so
their captured end-plans are post-checkpoint `Scan ExistingRDD` stubs and
the interesting subplan never appears in plans/r06/<q>_{before,after}.txt.
This script captures the pathology at the component level instead:

- before: the ROUND-START shingle pipeline (JVM zip_with n-gram chain,
  verbatim from git rev 3ebca34:sorting_compressed_time_series_spark/
  operators/dedup.py word_shingles) + explode, with Catalyst's
  InferFiltersFromGenerate ENABLED (round-start optimizer) — the plan
  shows the inferred `size(...) > 0 AND isnotnull(...)` Filter pushed
  BELOW the repartition Exchange with the whole chain re-inlined;
- after: the current Arrow-kernel word_shingles + explode under the
  session defaults — no inferred filter, no pre-exchange evaluation.

Writes plans/r06/shingle_explode_infer_filter_{before,after}.txt.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def jvm_word_shingles(docs, n=3, id_col="doc_id"):
    """Round-start word_shingles (JVM zip_with chain), reproduced verbatim
    for the _before capture."""
    from sorting_compressed_time_series_spark.operators.dedup import normalized

    d = normalized(docs).withColumn("w", F.split("norm_text", " "))
    acc = "w"
    for k in range(1, n):
        acc = (f"zip_with({acc}, slice(w, {k + 1}, greatest(size(w)-{k}, 0)), "
               f"(a, b) -> concat(a, ' ', b))")
    sh = F.expr(f"array_distinct(slice({acc}, 1, greatest(size(w)-{n - 1}, 0)))")
    return d.select(F.col(id_col).alias("doc_id"), sh.alias("shingles"))


def main() -> int:
    from sorting_compressed_time_series_spark.operators.dedup import word_shingles
    from sorting_compressed_time_series_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(
        app="evidence", cores=8, shuffle_partitions=8,
        extra={"spark.sql.optimizer.excludedRules": ""},  # round-start rules
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        8, "doc_id"
    )

    def cap(df, path):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(path, "w") as fh:
            fh.write(plan)
        print(path, len(plan), "chars")

    before = jvm_word_shingles(docs, 3).select(
        "doc_id", F.explode("shingles").alias("sh")
    )
    cap(before, "plans/r06/shingle_explode_infer_filter_before.txt")
    spark.stop()

    spark = get_spark(app="evidence2", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        8, "doc_id"
    )
    after = word_shingles(docs, 3).select(
        "doc_id", F.explode("shingles").alias("sh")
    )
    cap(after, "plans/r06/shingle_explode_infer_filter_after.txt")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
