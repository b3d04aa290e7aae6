"""Training-corpus preparation over the pre-tokenized table: GPT-style
sequence packing (concat-and-chunk to a fixed context length) and the
corpus vocabulary histogram.

Both operate on the BASELINE.json input-hint shape
``(doc_id string, tokens array<int>, n_tok int, source string)`` — the
step that turns a curated corpus into fixed-length training sequences,
and the vocab-frequency profile used for tokenizer QA / coverage checks.

Scale design (100 TB):

``pack_sequences`` is a permutation of the whole corpus, so two
token-volume exchanges are inherent and exactly two happen: one to place
each doc at its global token offset (a window keyed by an order-preserving
``doc_id`` prefix — lexicographic prefix groups are contiguous ranges of
the global order, so per-group prefix sums + a tiny cumulative base table
compose to an exact global prefix sum with NO global sort and NO
single-partition pass over corpus rows), and one to assemble output
sequences (groupBy seq_id).  The cross-group base offsets live in an
aggregated n_groups-row frame (broadcast back); piece slicing and sequence
assembly are pure JVM expressions (explode + slice, sort_array + flatten)
— no Python worker touches the token stream.

``token_histogram`` pre-reduces each Arrow batch to vocab-sized partial
rows (np.bincount) before the only exchange, so shuffle volume is
O(n_batches × vocab), independent of corpus token count.  Per-doc distinct
counts are safe to sum because each doc's token array is one row, wholly
inside one batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, Window as W, functions as F


def _widen_prefix_for_skew(
    docs: DataFrame, id_prefix_len: int, max_group_docs: int
) -> tuple[DataFrame, int]:
    """Guard against doc_id-prefix skew: if any placement group holds more
    than ``max_group_docs`` docs (degenerate shared-prefix corpora collapse
    to few giant groups — a single-task sort per group), widen the prefix
    until groups are bounded. Each probe is one metadata-sized aggregation
    (count per group, max) — worth it only when skew is plausible, hence
    opt-in. The packed OUTPUT is invariant to the prefix length (any prefix
    of the sort key yields the same global offsets)."""
    plen = id_prefix_len
    while True:
        biggest = (
            docs.groupBy("grp").count().agg(F.max("count")).collect()[0][0]
        )
        if biggest is None or biggest <= max_group_docs or plen >= 64:
            return docs, plen
        plen += 2
        docs = docs.withColumn("grp", F.substring("doc_id", 1, plen))


def pack_sequences(toks: DataFrame, seq_len: int, id_prefix_len: int = 9,
                   max_group_docs: int | None = None) -> DataFrame:
    """Concatenate all docs' tokens in ``doc_id`` order and chunk the stream
    into back-to-back sequences of exactly ``seq_len`` tokens (documents may
    span sequence boundaries; the final partial sequence is dropped) — the
    standard pretraining pack.  Returns
    ``(seq_id long, tokens array<int>, n_docs long)`` where ``n_docs`` is
    the number of documents contributing to the sequence.

    ``id_prefix_len`` sets the placement-window group key
    ``substring(doc_id, 1, id_prefix_len)``: any prefix of the sort key is
    order-monotone, so groups are contiguous runs of the global doc order
    and per-group prefix sums + cumulative group bases equal the global
    prefix sum.  Pick it so groups hold ~10^4–10^6 docs: the per-group
    window sort is the parallel unit, and the group-base table (one row
    per group) must stay broadcastable.  ``max_group_docs`` (opt-in)
    probes group sizes and auto-widens the prefix when a shared-prefix
    corpus degenerates to few giant groups — the output is invariant to
    the prefix length, only the parallel decomposition changes.
    """
    docs = toks.filter(F.col("n_tok") > 0).withColumn(
        "grp", F.substring("doc_id", 1, id_prefix_len)
    )
    if max_group_docs is not None:
        docs, id_prefix_len = _widen_prefix_for_skew(
            docs, id_prefix_len, max_group_docs
        )
    # within-group token offset: exclusive running sum in doc_id order
    w_in = W.partitionBy("grp").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    # cross-group bases: n_groups rows — the one intentionally tiny
    # single-partition window in this operator (aggregated frame, not corpus)
    totals = docs.groupBy("grp").agg(F.sum("n_tok").alias("g_tok"))
    w_g = W.orderBy("grp").rowsBetween(W.unboundedPreceding, -1)
    bases = totals.select(
        "grp", F.coalesce(F.sum("g_tok").over(w_g), F.lit(0)).cast("long").alias("g_base")
    )
    placed = (
        docs.withColumn(
            "off_in_grp", F.coalesce(F.sum("n_tok").over(w_in), F.lit(0)).cast("long")
        )
        .join(F.broadcast(bases), "grp")
        .withColumn("off", F.col("g_base") + F.col("off_in_grp"))
    )
    lit_l = F.lit(seq_len).cast("long")
    end = F.col("off") + F.col("n_tok")  # exclusive global end of this doc
    pieces = (
        placed.withColumn(
            "s",
            F.explode(F.sequence(F.floor(F.col("off") / lit_l), F.floor((end - 1) / lit_l))),
        )
        .withColumn("p_start", F.greatest(F.col("s") * lit_l, F.col("off")))
        .withColumn("p_end", F.least((F.col("s") + 1) * lit_l, end))
        .select(
            F.col("s").alias("seq_id"),
            (F.col("p_start") - F.col("s") * lit_l).alias("sp"),
            F.slice(
                "tokens",
                (F.col("p_start") - F.col("off") + 1).cast("int"),
                (F.col("p_end") - F.col("p_start")).cast("int"),
            ).alias("piece"),
        )
    )
    # assemble: distinct docs have disjoint position ranges within a
    # sequence, so sorting the (sp, piece) structs by sp alone is total
    return (
        pieces.groupBy("seq_id")
        .agg(
            F.expr(
                "flatten(transform(sort_array(collect_list(struct(sp, piece))),"
                " x -> x.piece))"
            ).alias("tokens"),
            F.count("*").alias("n_docs"),
        )
        .filter(F.size("tokens") == seq_len)
    )


def pack_greedy_nosplit(
    toks: DataFrame, seq_len: int, id_prefix_len: int = 10
) -> DataFrame:
    """Greedy NO-SPLIT packing: walk docs in ``doc_id`` order and append
    each whole document to the current sequence, opening a new sequence
    when it would overflow ``seq_len`` — the SFT/instruction-tuning pack,
    where an example must never span a sequence boundary (contrast
    ``pack_sequences``, the pretraining concat-and-chunk that splits).
    A document longer than ``seq_len`` occupies a sequence alone
    (``oversize = true``); the rule is uniform: a new sequence opens iff
    the running fill is non-zero and would exceed ``seq_len``.

    Packing state is a sequential carry, so — like every production
    packer at scale — the unit of sequentiality is the SHARD: docs are
    grouped by the order-preserving ``substring(doc_id, 1,
    id_prefix_len)`` prefix and each group packs independently (no fill
    carries across groups). Groups collect and sort JVM-side
    (``sort_array(collect_list(struct))``, same pattern as
    variation_windows_delta); one Arrow kernel replays the fill for every
    complete group in a batch. The fill depends only on ``n_tok`` — the
    token arrays are never collected, so the shuffle carries ~20 bytes
    per doc regardless of document size (on a parquet source, column
    pruning keeps them out of the scan too).

    Returns one row per packed sequence:
    ``(grp, seq_in_grp, n_docs, tok_sum, pad, first_doc, last_doc,
    oversize)`` where ``pad = seq_len - tok_sum`` is the padding waste
    (negative only for oversize singletons).
    """
    d = toks.filter(F.col("n_tok") > 0).select(
        F.substring("doc_id", 1, id_prefix_len).alias("grp"),
        F.col("doc_id"),
        F.col("n_tok").cast("long").alias("n_tok"),
    )
    collected = d.groupBy("grp").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "n_tok"))).alias("ds")
    )

    def kern(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # Vectorized greedy fill — no per-doc Python loop, ids stay Arrow:
        # 1. prefix sums P over the batch's docs (all groups concatenated);
        # 2. next[i] = end of the sequence that starts at doc i, via ONE
        #    searchsorted (largest j with P[j] - P[i] <= seq_len), clamped
        #    to the doc's group end (no fill carries across groups) and to
        #    at least i+1 (an oversize doc occupies a sequence alone);
        # 3. sequence starts = every position reachable from a group start
        #    through next — enumerated with pointer doubling (J := J[J]),
        #    O(log max_seqs) numpy rounds, no per-element interpreter work;
        # 4. every output column is a vectorized gather off the starts.
        for b in batches:
            if b.num_rows == 0:
                continue
            ds = b.column("ds")
            if isinstance(ds, pa.ChunkedArray):
                ds = ds.combine_chunks()
            flat = ds.flatten()
            offs = ds.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            ids = flat.field("doc_id")
            ns = flat.field("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(ns)
            if n == 0:
                continue
            P = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(ns, out=P[1:])
            glen = np.diff(offs)
            gidx = np.repeat(np.arange(b.num_rows, dtype=np.int64), glen)
            gend = offs[1:][gidx]
            nxt = np.searchsorted(P, P[:n] + seq_len, side="right") - 1
            nxt = np.minimum(nxt, gend)
            np.maximum(nxt, np.arange(1, n + 1), out=nxt)
            orig_next = np.append(nxt, n)  # sentinel: next[n] = n
            # chain enumeration: group starts seed the doubling frontier
            S = offs[:-1][glen > 0]
            J = orig_next
            while True:
                S2 = np.unique(np.concatenate([S, J[S]]))
                if len(S2) == len(S):
                    break
                S = S2
                J = J[J]
            S = S[S < n]  # drop the sentinel (and nothing else: group ends
            #               coincide with the NEXT group's start, also a seed)
            e = orig_next[S]
            gS = gidx[S]
            tok_sum = P[e] - P[S]
            seq_in_grp = np.arange(len(S), dtype=np.int64) - np.searchsorted(
                S, offs[:-1]
            )[gS]
            idx = pa.array(S)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("grp").take(pa.array(gS)),
                    pa.array(seq_in_grp),
                    pa.array(e - S),
                    pa.array(tok_sum),
                    pa.array(seq_len - tok_sum),
                    ids.take(idx),
                    ids.take(pa.array(e - 1)),
                    pa.array(tok_sum > seq_len),
                ],
                names=["grp", "seq_in_grp", "n_docs", "tok_sum", "pad",
                       "first_doc", "last_doc", "oversize"],
            )

    return collected.mapInArrow(
        kern,
        schema=("grp string, seq_in_grp long, n_docs long, tok_sum long, "
                "pad long, first_doc string, last_doc string, oversize boolean"),
    )


HIST_PARTIAL_SCHEMA = "token long, n_occ long, n_docs long"


def histogram_partials_kernel(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """Arrow-batch kernel reducing corpus batches to vocab-sized partial
    histogram rows (token, n_occ, n_docs). Reused by ``token_histogram``
    (over an arbitrary DataFrame) and the registry's fused synthetic-source
    path (sources/synth.generate_tokens_mapped)."""
    for b in batches:
        tok = b.column("tokens")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        flat = tok.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            continue
        offs = tok.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lo = int(flat.min())
        width = int(flat.max()) - lo + 1
        lengths = np.diff(offs)
        doc_idx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        if width > (1 << 22):
            # sparse/outlier token-id range: a dense bincount of `width`
            # cells would allocate (or fail to) GBs off one stray id — the
            # operator is public API over arbitrary toks frames. Sort-based
            # fallback: identical (token, n_occ, n_docs) partials at
            # O(n log n) instead of O(width) memory.
            order = np.lexsort((doc_idx, flat))
            ft, fd = flat[order], doc_idx[order]
            toks_u, starts, occ_u = np.unique(
                ft, return_index=True, return_counts=True
            )
            newpair = np.ones(len(ft), dtype=np.int64)
            chg = (ft[1:] != ft[:-1]) | (fd[1:] != fd[:-1])
            newpair[1:] = chg.astype(np.int64)
            docs_u = np.add.reduceat(newpair, starts)
            yield pa.RecordBatch.from_arrays(
                [pa.array(toks_u), pa.array(occ_u.astype(np.int64)),
                 pa.array(docs_u)],
                names=["token", "n_occ", "n_docs"],
            )
            continue
        shifted = flat - lo
        occ = np.bincount(shifted, minlength=width)
        # distinct (doc, token) pairs -> per-token doc counts; exact
        # because a doc's whole array sits in this batch row
        pairs = np.unique(doc_idx * width + shifted)
        docs = np.bincount(pairs % width, minlength=width)
        nz = np.nonzero(occ)[0]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(nz + lo, type=pa.int64()),
                pa.array(occ[nz], type=pa.int64()),
                pa.array(docs[nz], type=pa.int64()),
            ],
            names=["token", "n_occ", "n_docs"],
        )


def histogram_topk(partials: DataFrame, top_k: int) -> DataFrame:
    """Reduce partial histogram rows to the deterministic top-k profile."""
    return (
        partials.groupBy("token")
        .agg(F.sum("n_occ").alias("n_occ"), F.sum("n_docs").alias("n_docs"))
        .orderBy(F.desc("n_occ"), F.asc("token"))
        .limit(top_k)
    )


def token_histogram(toks: DataFrame, top_k: int = 200) -> DataFrame:
    """Top-``top_k`` token ids by corpus frequency:
    ``(token long, n_occ long, n_docs long)`` ordered by
    (n_occ desc, token asc) — a total order, so the cutoff is deterministic.
    ``n_docs`` is the number of distinct documents containing the token.
    """
    part = toks.mapInArrow(histogram_partials_kernel, schema=HIST_PARTIAL_SCHEMA)
    return histogram_topk(part, top_k)
