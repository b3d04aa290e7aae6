"""Compaction page merge: combine per-series chunk blobs across flushes.

Re-expresses the reference's compaction-time compressed merge
(PersistUncompressingSorter, reference db/iotdb-core/tsfile/.../encoding/
sorter/PersistUncompressingSorter.java:42-206 — semantics only, no code):

- **Non-overlapping pages** (the common case once series are sorted): the
  merged stream is the concatenation of the pages' payload planes with ONE
  patched delta per page boundary — the first element of each later page
  stops being a raw value and becomes a delta against the previous page's
  last timestamp (reference sortPage fast path, :96-102). No decode of page
  interiors.
- **Overlapping pages**: k-way stable merge. The reference splices byte
  ranges across page boundaries; we decode, merge-order with a stable
  argsort keyed (ts, page_order), and re-encode — identical output (the
  canonical encode of the merged sequence), which the oracle asserts.

In the Spark pipeline this kernel runs per series inside `applyInPandas`
during tier compaction; page order = flush order, so stability gives
last-writer-wins determinism for duplicate timestamps.
"""

from __future__ import annotations

import numpy as np

from ..codecs.bytealigned import (
    ByteAlignedData,
    CLASS_WIDTH,
    _classify,
    _emit_payload,
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
    zigzag,
)


def _concat_bytealigned(parts: list[ByteAlignedData]) -> ByteAlignedData:
    vals = np.concatenate([p.vals for p in parts]) if parts else np.empty(0, np.uint8)
    codes = np.concatenate([p.codes for p in parts]) if parts else np.empty(0, np.uint8)
    return ByteAlignedData(vals, codes, sum(p.count for p in parts))


def merge_pages(
    time_pages: list[ByteAlignedData],
    value_pages: list[ByteAlignedData],
) -> tuple[ByteAlignedData, ByteAlignedData, dict]:
    """Merge sorted pages of one series. Returns (time, value, lineage)."""
    pages = [p for p in time_pages if p.count > 0]
    vpages = [v for t, v in zip(time_pages, value_pages) if t.count > 0]
    lineage = {"path": "empty", "pages": len(pages), "spliced_boundaries": 0}
    if not pages:
        return (
            ByteAlignedData(np.empty(0, np.uint8), np.empty(0, np.uint8), 0),
            ByteAlignedData(np.empty(0, np.uint8), np.empty(0, np.uint8), 0),
            lineage,
        )
    if len(pages) == 1:
        lineage["path"] = "single"
        return pages[0], vpages[0], lineage

    # decode only the boundary info first: last/first element of each page.
    decoded = [delta_decode(p) for p in pages]
    no_overlap = all(
        decoded[k][-1] <= decoded[k + 1][0] for k in range(len(decoded) - 1)
    )
    if no_overlap:
        # compressed-domain concat: splice planes, patch one delta per seam
        lineage["path"] = "splice"
        out_t = _concat_bytealigned(pages)
        out_v = _concat_bytealigned(vpages)
        # seam element index of page k+1 = cumulative count
        seam = 0
        for k in range(len(pages) - 1):
            seam += pages[k].count
            delta = decoded[k + 1][0] - decoded[k][-1]
            zz = zigzag(np.array([delta], dtype=np.int64))
            code = _classify(zz)[0]
            new_bytes = _emit_payload(zz, np.array([code], dtype=np.uint8))
            w = CLASS_WIDTH[out_t.codes]
            start = int(w[:seam].sum())
            old_w = int(w[seam])
            out_t.vals = np.concatenate(
                [out_t.vals[:start], new_bytes, out_t.vals[start + old_w:]]
            )
            out_t.codes[seam] = code
            lineage["spliced_boundaries"] += 1
        return out_t, out_v, lineage

    # overlap: stable k-way merge (page order breaks ties = flush order)
    lineage["path"] = "kmerge"
    all_ts = np.concatenate(decoded)
    all_vs = np.concatenate([varint_decode(v) for v in vpages])
    order = np.argsort(all_ts, kind="stable")
    return delta_encode(all_ts[order]), varint_encode(all_vs[order]), lineage
