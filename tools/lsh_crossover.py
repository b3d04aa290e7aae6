"""Measured crossover: exact block-pair cosine dedup vs the LSH
candidate-first path (`cosine_dup_pairs` vs `cosine_dup_pairs_lsh`).

Replicates the sf0.1 embedding table (2 000 × dim-64) K× with shifted ids
— replicas are exact copies, so the true near-dup set at tau 0.9 is the
per-family clique plus a tiny random tail, a realistic dedup shape — and
times both paths at growing corpus sizes on the same session.  Reports
wall, candidate count vs n(n-1)/2, and LSH recall vs the exact output.

The point of the curve: exact block-pair work is the inherent O(n²/2)
dot products (fine as the *verifier*, or when the pair budget is the
task); LSH candidates grow ~linearly with n at fixed bucket occupancy, so
its verify matmul shrinks from n²/2 to |candidates| — the 100 TB path.

Usage: python tools/lsh_crossover.py [K ...]   (default: 10 20 40)
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import _fresh_spark, _steal_gauge, _warmup
from sorting_compressed_time_series_spark.operators import similarity as SIM

SRC = "/root/testdata/sf0.1/embeddings.parquet"
TAU = 0.9
N_TABLES = 12


def replicated(spark, k: int):
    base = spark.read.parquet(SRC)
    ks = spark.range(k).select(F.col("id").alias("k"))
    return (
        base.crossJoin(ks)
        .select(
            (F.col("vec_id") + F.col("k") * 2000).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(32, "vec_id")
    )


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [10, 20, 40]
    spark = _fresh_spark(32)
    _warmup(spark)
    rows = []
    for k in reps:
        emb = replicated(spark, k).cache()
        n = emb.count()
        n_pairs = n * (n - 1) // 2
        # bucket-occupancy-scaled bits: ~16 vectors per bucket per table
        # keeps candidate volume ~linear in n (C(16,2)·buckets·tables)
        # while the banding bound holds recall ≥ ~0.94 at cosine 0.9
        n_bits = max(6, int(round(math.log2(n / 16))))

        # gauge AT the run's parallelism (32): an 8-way gauge misses the
        # hypervisor total-capacity cap that only binds at 32-proc load
        g0 = _steal_gauge(32)
        t0 = time.perf_counter()
        exact = SIM.cosine_dup_pairs(emb, tau=TAU, n_blocks=12)
        exact_pairs = exact.cache()
        n_exact = exact_pairs.count()
        t_exact = time.perf_counter() - t0

        t0 = time.perf_counter()
        lsh = SIM.cosine_dup_pairs_lsh(
            emb, tau=TAU, n_tables=N_TABLES, n_bits=n_bits, bucket_cap=5000
        ).cache()
        n_lsh = lsh.count()
        t_lsh = time.perf_counter() - t0

        # candidate volume BEFORE the exact verify (same plan prefix)
        n_cand = SIM.lsh_candidate_pairs(
            emb.select("vec_id", "embedding"),
            n_tables=N_TABLES, n_bits=n_bits, bucket_cap=5000,
        ).count()

        hit = lsh.join(exact_pairs, ["a", "b"], "inner").count()
        recall = hit / max(n_exact, 1)
        g1 = _steal_gauge(32)
        row = {
            "K": k,
            "n": n,
            "n_pairs_quadratic": n_pairs,
            "n_bits": n_bits,
            "exact_pairs": n_exact,
            "t_exact_s": round(t_exact, 2),
            "lsh_pairs": n_lsh,
            "t_lsh_s": round(t_lsh, 2),
            "lsh_candidates": n_cand,
            "recall_vs_exact": round(recall, 4),
            "subset_of_exact": n_lsh == hit,
            "gauges": (round(g0, 2), round(g1, 2)),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        emb.unpersist()
        exact_pairs.unpersist()
        lsh.unpersist()
    print(json.dumps({"crossover": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
