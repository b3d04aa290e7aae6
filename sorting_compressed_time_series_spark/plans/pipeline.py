"""The full engine pipeline as a resumable batch plan.

The reference's Continuous Query scheduler (confignode CQScheduleTask,
reference confignode/.../manager/cq/CQScheduleTask.java:67-160) re-runs a
window aggregate every ``every_interval`` over ``[now-start_offset,
now-end_offset)``.  Our equivalent is deterministic *watermark-driven
promotion*: each tier's manifest records the watermark up to which windows
have been promoted; a promotion run selects only COMPLETE windows between
the old and new watermark, computes them, appends, and commits data +
watermark atomically (see sources/warehouse.py).  Re-running after a crash
repeats the same deterministic window range → identical table (the
checkpoint-resume oracle in tests/test_warehouse_promotion.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.ingest import flush
from ..operators.retention import apply_retention
from ..operators.rollup import (
    WINDOW_1H_US,
    WINDOW_1M_US,
    promote,
    rollup_tier1,
    tier1_from_flush,
)
from ..sources.warehouse import Warehouse, with_p_day


@dataclass
class TierSpec:
    name: str
    window_us: int
    ttl_us: int | None = None  # None = keep forever


# the cascade matches the token corpus' time scale (points every ~1 ms,
# docs spanning up to ~25 min): finer tiers age out fast, coarse ones live on
WINDOW_1S_US = 1_000_000
DEFAULT_TIERS = [
    TierSpec("tier1_1s", WINDOW_1S_US, ttl_us=7 * 86_400_000_000),
    TierSpec("tier2_1m", WINDOW_1M_US, ttl_us=90 * 86_400_000_000),
    TierSpec("tier3_1h", WINDOW_1H_US, ttl_us=None),
]


@dataclass
class Pipeline:
    spark: SparkSession
    warehouse: Warehouse
    tiers: list[TierSpec] = field(default_factory=lambda: list(DEFAULT_TIERS))

    # --- stage 1: ingest+flush ------------------------------------------
    def ingest(self, tokens_df: DataFrame, seed: int = 42,
               partitions: int | None = None, append: bool = False) -> DataFrame:
        # co-emit tier-1 partials (tier = -1 rows) so promotion never decodes
        chunks = flush(tokens_df, seed, partitions,
                       partial_window_us=self.tiers[0].window_us)
        chunks = with_p_day(chunks, "window_start")
        if append and self.warehouse.exists("chunks_tier0"):
            old = self.warehouse.read(self.spark, "chunks_tier0")
            chunks = old.unionByName(chunks)
            # appended series may carry windows below the promoted
            # watermarks; invalidate them → next promotion recomputes
            # (idempotent; a per-key MERGE is the large-scale refinement)
            for spec in self.tiers:
                self.warehouse.reset_watermark(spec.name)
        self.warehouse.write(chunks, "chunks_tier0", partition_by=("p_day",),
                             watermark_us=None,
                             op="append" if append else "ingest")
        return self.warehouse.read(self.spark, "chunks_tier0")

    # --- stage 2: promotion with checkpoint ------------------------------
    def promote_all(self, up_to_us: int | None = None) -> None:
        """Promote each tier from its source up to the source's complete
        windows. Idempotent: windows are recomputed deterministically from
        the immutable finer tier; the manifest watermark says where to
        resume. ``up_to_us`` caps promotion (for simulating partial runs)."""
        chunks = self.warehouse.read(self.spark, "chunks_tier0")
        data_max = chunks.filter(F.col("tier") == 0).agg(F.max("max_ts")).collect()[0][0]

        prev_df = None
        for i, spec in enumerate(self.tiers):
            if up_to_us is None:
                # final batch run: every window is complete (data is closed)
                complete = (data_max // spec.window_us + 1) * spec.window_us
            else:
                # incremental run: only windows fully below the horizon
                complete = (min(up_to_us, data_max) // spec.window_us) * spec.window_us
            already = self.warehouse.watermark(spec.name)
            if already is not None and already >= complete:
                prev_df = self.warehouse.read(self.spark, spec.name)
                continue
            if i == 0:
                has_partials = (
                    chunks.filter(F.col("tier") == -1).limit(1).count() > 0
                )
                if has_partials:
                    fresh = tier1_from_flush(chunks)
                else:
                    fresh = rollup_tier1(chunks.filter(F.col("tier") == 0),
                                         spec.window_us)
            else:
                fresh = promote(prev_df, spec.window_us)
            fresh = fresh.filter(F.col("window_start") < F.lit(complete))
            lo = already if already is not None else None
            if lo is not None:
                fresh_part = fresh.filter(F.col("window_start") >= F.lit(lo))
                old = self.warehouse.read(self.spark, spec.name).filter(
                    F.col("window_start") < F.lit(lo)
                ).drop("p_day")
                out = old.unionByName(fresh_part)
            else:
                out = fresh
            self.warehouse.write(with_p_day(out), spec.name, partition_by=("p_day",),
                                 watermark_us=int(complete), op=f"promote@{complete}")
            prev_df = self.warehouse.read(self.spark, spec.name)

    # --- stage 3: retention ----------------------------------------------
    def retain(self, now_us: int) -> list[dict]:
        out = []
        for spec in self.tiers:
            if spec.ttl_us is not None and self.warehouse.exists(spec.name):
                out.append(
                    apply_retention(self.warehouse, self.spark, spec.name, now_us, spec.ttl_us)
                )
        return out

    # --- one-shot ----------------------------------------------------------
    def run(self, tokens_df: DataFrame, seed: int = 42, now_us: int | None = None) -> None:
        self.ingest(tokens_df, seed)
        self.promote_all()
        if now_us is not None:
            self.retain(now_us)
