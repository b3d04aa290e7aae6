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

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.ingest import flush
from ..operators.retention import apply_retention
from ..operators.rollup import (
    WINDOW_1H_US,
    WINDOW_1M_US,
    promote,
    rollup_tier1,
    rollup_tiers,
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
    # co-emit tier-1 partial rows (tier = -1) at flush so promotion never
    # decodes a blob. OFF by default: the partials are a tier1-sized side
    # table riding every chunk write (~5× the blob bytes at a 1s tier), and
    # the decode-based tier1 (`rollup_tier1`) is vectorized CPU that scales
    # with cores while the extra write IO does not.
    emit_partials: bool = False
    # hash-bucket count for the chunk table (Iceberg ``bucket(doc_id, N)``
    # stand-in): snapshots are written hash-clustered by doc_id so that
    # same-session compaction / per-doc merges read the clustering from the
    # scan and need no exchange. Sized to local cores; a real cluster sizes
    # it to (table bytes / target task bytes).
    n_buckets: int = 32

    # --- stage 1: ingest+flush ------------------------------------------
    def ingest(self, tokens_df: DataFrame, seed: int = 42,
               partitions: int | None = None, append: bool = False) -> DataFrame:
        chunks = flush(tokens_df, seed, partitions,
                       partial_window_us=self.tiers[0].window_us
                       if self.emit_partials else None)
        chunks = with_p_day(chunks, "window_start")
        if append and self.warehouse.exists("chunks_tier0"):
            # manifest-add only: the existing snapshot is untouched and the
            # next promotion MERGEs just the appended docs' windows
            self.warehouse.append_segment(chunks, "chunks_tier0",
                                          partition_by=("p_day",), op="append")
        else:
            self.warehouse.write(chunks, "chunks_tier0", partition_by=("p_day",),
                                 watermark_us=None, op="ingest",
                                 bucket_by=("doc_id", self.n_buckets))
        return self.warehouse.read(self.spark, "chunks_tier0")

    # --- stage 2: promotion with checkpoint ------------------------------
    def promote_all(self, up_to_us: int | None = None,
                    collect_stats: bool = False) -> list[dict]:
        """Promote each tier up to its source's complete windows.

        Three regimes per tier, all deterministic and idempotent:
        - **full** (no watermark yet): compute every window;
        - **incremental** (watermark advance): keep rows below the
          watermark, compute only [watermark, complete) from the finer
          source filtered to that range (exact — a window's inputs all
          carry window_start ≥ watermark);
        - **merge** (pending appended segments): additionally recompute the
          windows of JUST the appended docs below the watermark and splice
          them over the kept rows (anti-join) — appends never trigger a
          full recompute (the reference's compaction-then-requery shape;
          per-key MERGE INTO on Iceberg).

        Returns a per-tier summary; with ``collect_stats`` it includes
        recomputed/kept row counts (extra count jobs — tests only)."""
        wh = self.warehouse
        chunks = wh.read(self.spark, "chunks_tier0")
        data_max = chunks.filter(F.col("tier") == 0).agg(F.max("max_ts")).collect()[0][0]
        pending = wh.pending_appends("chunks_tier0")
        dirty = None
        if pending:
            seg = wh.read_segment(self.spark, "chunks_tier0", pending[0])
            for s in pending[1:]:
                seg = seg.unionByName(wh.read_segment(self.spark, "chunks_tier0", s))
            dirty = seg.filter(F.col("tier") == 0).select("doc_id").distinct()
        has_partials = chunks.filter(F.col("tier") == -1).limit(1).count() > 0
        if has_partials and pending:
            # the decode path is always correct; the partials fast path is
            # only safe if the appended segments carried partials too
            seg_partials = seg.filter(F.col("tier") == -1).limit(1).count() > 0
            has_partials = has_partials and seg_partials

        def tier1_fresh(src):
            if has_partials:
                return tier1_from_flush(src)
            return rollup_tier1(src.filter(F.col("tier") == 0), self.tiers[0].window_us)

        # Fused full-mode fast path: no tier has a watermark yet and no
        # appends are pending → every tier is a fresh computation over the
        # same points, so one rollup_tiers() decode job can feed all of
        # them. Requires nested windows (each coarser tier an integer
        # multiple of the finer) for direct-from-points ≡ cascade equality.
        nested = all(
            self.tiers[j + 1].window_us % self.tiers[j].window_us == 0
            for j in range(len(self.tiers) - 1)
        )
        if (
            not pending
            and nested
            and len(self.tiers) > 1
            and not os.environ.get("SPARK_GRAFT_NO_FUSED_PROMOTE")
            and all(wh.watermark(spec.name) is None for spec in self.tiers)
        ):
            return self._promote_all_fused(chunks, data_max, up_to_us, collect_stats)

        summary: list[dict] = []
        prev_df = None
        for i, spec in enumerate(self.tiers):
            if up_to_us is None:
                # final batch run: every window is complete (data is closed)
                complete = (data_max // spec.window_us + 1) * spec.window_us
            else:
                # incremental run: only windows fully below the horizon
                complete = (min(up_to_us, data_max) // spec.window_us) * spec.window_us
            already = wh.watermark(spec.name)
            if already is not None and already >= complete and not pending:
                prev_df = wh.read(self.spark, spec.name)
                summary.append({"tier": spec.name, "mode": "noop"})
                continue
            source = chunks if i == 0 else prev_df
            fresh_of = tier1_fresh if i == 0 else (
                lambda src, w=spec.window_us: promote(src, w)
            )
            win = F.col("window_start")
            new_wm = int(complete)
            if already is None:
                out = fresh_of(source).filter(win < F.lit(complete))
                mode = "full"
                stats_dfs = {"recomputed": out}
            else:
                lo = int(already)
                # an append of old-only data can leave complete < watermark;
                # never regress the checkpoint
                new_wm = max(new_wm, lo)
                old = wh.read(self.spark, spec.name).drop("p_day").filter(win < F.lit(lo))
                # tail: windows in [lo, complete) — the finer source rows
                # that can contribute all carry window_start/min-ts ≥ lo
                if i == 0:
                    tail_src = chunks.filter(
                        F.col("window_start") >= F.lit(lo)
                        if has_partials
                        else (F.col("tier") == 0) & (F.col("max_ts") >= F.lit(lo))
                    )
                else:
                    tail_src = prev_df.filter(win >= F.lit(lo))
                fresh_tail = fresh_of(tail_src).filter(
                    (win >= F.lit(lo)) & (win < F.lit(complete))
                )
                if dirty is not None:
                    kept = old.join(F.broadcast(dirty), "doc_id", "left_anti")
                    dirty_src = source.join(F.broadcast(dirty), "doc_id", "left_semi")
                    fresh_dirty = fresh_of(dirty_src).filter(win < F.lit(lo))
                    out = kept.unionByName(fresh_dirty).unionByName(fresh_tail)
                    mode = "merge"
                    stats_dfs = {"kept": kept, "recomputed_dirty": fresh_dirty,
                                 "recomputed_tail": fresh_tail}
                else:
                    out = old.unionByName(fresh_tail)
                    mode = "incremental"
                    stats_dfs = {"kept": old, "recomputed": fresh_tail}
            entry = {"tier": spec.name, "mode": mode, "watermark_us": int(complete)}
            if collect_stats:
                # count BEFORE the write: the commit retires the old
                # snapshot these frames still read from
                entry.update({k: df.count() for k, df in stats_dfs.items()})
            wh.write(with_p_day(out), spec.name, partition_by=("p_day",),
                     watermark_us=new_wm, op=f"promote@{new_wm}:{mode}")
            prev_df = wh.read(self.spark, spec.name)
            summary.append(entry)
        if pending:
            wh.clear_pending("chunks_tier0")
        return summary

    def _promote_all_fused(self, chunks: DataFrame, data_max: int,
                           up_to_us: int | None,
                           collect_stats: bool) -> list[dict]:
        """All-tiers-fresh promotion as ONE decode job and ONE write job.

        The per-tier cascade costs a write + read-back per tier (a fixed
        ~0.5 s/job wall that does NOT shrink with cores — the dominant
        non-scaling component measured in BENCH.md). Here the fused
        ``rollup_tiers`` kernel decodes every chunk once and emits every
        tier's partials together; one write lands them partitioned by
        ``(tier, p_day)`` and ``Warehouse.write_slices`` renames each
        tier's partition dir into that tier table's snapshot (filesystem
        moves + per-table manifest swaps, no extra jobs). Same shape the
        bench headline uses; pytest asserts fused ≡ cascade outputs."""
        wh = self.warehouse
        completes: list[int] = []
        for spec in self.tiers:
            if up_to_us is None:
                completes.append((data_max // spec.window_us + 1) * spec.window_us)
            else:
                completes.append(
                    (min(up_to_us, data_max) // spec.window_us) * spec.window_us
                )
        # per-tier horizon applied inside the one fused frame
        horizon = F.when(F.col("tier") == 0, F.lit(int(completes[0])))
        for t in range(1, len(self.tiers)):
            horizon = horizon.when(F.col("tier") == t, F.lit(int(completes[t])))
        fused = rollup_tiers(
            chunks.filter(F.col("tier") == 0),
            [spec.window_us for spec in self.tiers],
        ).filter(F.col("window_start") < horizon)
        wh.write_slices(
            with_p_day(fused), "tier",
            {t: spec.name for t, spec in enumerate(self.tiers)},
            partition_by=("p_day",),
            watermarks={t: int(c) for t, c in enumerate(completes)},
            op="promote:full-fused",
        )
        summary = []
        for t, spec in enumerate(self.tiers):
            entry = {"tier": spec.name, "mode": "full",
                     "watermark_us": int(completes[t])}
            if collect_stats:
                entry["recomputed"] = wh.read(self.spark, spec.name).count()
            summary.append(entry)
        return summary

    # --- maintenance: compaction ------------------------------------------
    def compact(self, min_chunks: int = 2) -> dict:
        """Merge every series with ≥ ``min_chunks`` tier-0 chunks into one
        chunk (the reference's compaction stage; page-merge kernel: splice
        fast path for disjoint chunks, stable k-merge for overlap) and
        commit a consolidated snapshot. The point set is preserved exactly,
        so promoted tiers stay valid and are untouched. Refuses to run
        over un-promoted appends: the consolidating write would retire the
        pending-segment bookkeeping the next MERGE promotion needs."""
        from pyspark.sql import functions as F  # local: keep module header lean

        from ..operators.compaction import compact_chunks

        wh = self.warehouse
        if wh.pending_appends("chunks_tier0"):
            raise ValueError("promote_all() before compact(): pending appends")
        chunks = wh.read(self.spark, "chunks_tier0")
        t0 = chunks.filter(F.col("tier") == 0)
        multi = (
            t0.groupBy("doc_id").count()
            .filter(F.col("count") >= min_chunks)
            .select("doc_id")
        )
        n_multi = multi.count()
        if n_multi == 0:
            return {"compacted_docs": 0}
        merged = compact_chunks(t0.join(F.broadcast(multi), "doc_id", "left_semi"))
        # keep: single-chunk docs' tier-0 rows untouched, and ALL tier=-1
        # partial rows (they are per (doc, window) aggregates of the same
        # points — still valid after the merge)
        singles = t0.drop("p_day").join(F.broadcast(multi), "doc_id", "left_anti")
        partials = chunks.drop("p_day").filter(F.col("tier") == -1)
        out = singles.unionByName(merged).unionByName(partials)
        # re-cluster on write: the consolidated snapshot is bucketed again,
        # so the NEXT compaction/merge over it is exchange-free even after
        # appends broke the previous clustering
        wh.write(with_p_day(out), "chunks_tier0", partition_by=("p_day",),
                 watermark_us=None, op=f"compact:{n_multi}",
                 bucket_by=("doc_id", self.n_buckets))
        return {"compacted_docs": int(n_multi)}

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
