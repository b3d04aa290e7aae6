"""Sequence packing (concat-and-chunk) and token histogram oracles.

Reference semantics: concatenate every doc's tokens in doc_id order into
one stream, cut it into back-to-back seq_len windows, drop the final
partial window — the standard pretraining pack.  The numpy reference here
does exactly that on the collected corpus; the operator must match it for
any partitioning of the input.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from pyspark.sql import functions as F

from sorting_compressed_time_series_spark.operators.packing import (
    pack_sequences,
    token_histogram,
)

L = 16


def _toks_df(spark, rows):
    return spark.createDataFrame(
        [(d, t, len(t), s) for d, t, s in rows],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )


def _rows(seed=7, n_docs=40):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        # length mix exercises: shorter than L, exactly L, spanning many seqs
        n = int(rng.choice([0, 3, L, L + 1, 5 * L + 7]))
        toks = rng.integers(-100, 100, size=n).astype(int).tolist()
        rows.append((f"doc{i:06d}", toks, "web" if i % 3 else "code"))
    return rows


def _reference_pack(rows, seq_len):
    stream, doc_of = [], []
    for d, toks, _s in sorted(rows):
        stream.extend(toks)
        doc_of.extend([d] * len(toks))
    out = {}
    for s in range(len(stream) // seq_len):
        seg = stream[s * seq_len : (s + 1) * seq_len]
        out[s] = (seg, len(set(doc_of[s * seq_len : (s + 1) * seq_len])))
    return out


def test_pack_matches_numpy_reference(spark):
    rows = _rows()
    got = {
        r["seq_id"]: (list(r["tokens"]), r["n_docs"])
        for r in pack_sequences(_toks_df(spark, rows), L).collect()
    }
    want = _reference_pack(rows, L)
    assert set(got) == set(want)
    for s in want:
        assert got[s][0] == want[s][0], f"seq {s} token mismatch"
        assert got[s][1] == want[s][1], f"seq {s} n_docs mismatch"


def test_pack_partition_invariance(spark):
    rows = _rows(seed=11)
    df = _toks_df(spark, rows)
    a = pack_sequences(df.repartition(7), L).collect()
    b = pack_sequences(df.coalesce(1), L).collect()
    ka = {r["seq_id"]: list(r["tokens"]) for r in a}
    kb = {r["seq_id"]: list(r["tokens"]) for r in b}
    assert ka == kb


def test_pack_drops_final_partial(spark):
    rows = [("doc0", list(range(L + 3)), "web")]
    out = pack_sequences(_toks_df(spark, rows), L).collect()
    assert len(out) == 1
    assert list(out[0]["tokens"]) == list(range(L))


def test_pack_prefix_grouping_exact(spark):
    """id_prefix_len shorter than the full id: multiple prefix groups, the
    cross-group base offsets must stitch the stream exactly."""
    rows = _rows(seed=13, n_docs=60)
    got = {
        r["seq_id"]: (list(r["tokens"]), r["n_docs"])
        for r in pack_sequences(_toks_df(spark, rows), L, id_prefix_len=8).collect()
    }  # 'doc0000xx' -> groups of 10 docs
    want = _reference_pack(rows, L)
    assert got == {s: (t, n) for s, (t, n) in want.items()}


def test_pack_broadcasts_group_bases(spark):
    plan = pack_sequences(
        _toks_df(spark, _rows()), L
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_token_histogram_matches_counter(spark):
    rows = _rows(seed=23)
    occ, docs = Counter(), Counter()
    for d, toks, _s in rows:
        occ.update(toks)
        docs.update(set(toks))
    got = token_histogram(_toks_df(spark, rows).repartition(5), top_k=50).collect()
    want = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert [(r["token"], r["n_occ"]) for r in got] == want
    for r in got:
        assert r["n_docs"] == docs[r["token"]], f"token {r['token']} doc count"


def _reference_nosplit(rows, seq_len, prefix_len):
    """Plain-python greedy no-split fill, grouped by doc_id prefix."""
    out = {}
    by_grp = {}
    for d, toks, _s in sorted(rows):
        if len(toks) == 0:
            continue
        by_grp.setdefault(d[:prefix_len], []).append((d, len(toks)))
    for grp, docs in by_grp.items():
        cur, seq = 0, 0
        for d, n in docs:
            if cur > 0 and cur + n > seq_len:
                seq += 1
                cur = 0
            cur += n
            key = (grp, seq)
            nd, ts, fd, _ld = out.get(key, (0, 0, d, d))
            out[key] = (nd + 1, ts + n, fd, d)
    return {
        k: (nd, ts, seq_len - ts, fd, ld, ts > seq_len)
        for k, (nd, ts, fd, ld) in out.items()
    }


def test_pack_nosplit_matches_reference(spark):
    from sorting_compressed_time_series_spark.operators.packing import (
        pack_greedy_nosplit,
    )

    rows = _rows(seed=31, n_docs=60)  # lengths 0/3/L/L+1/5L+7: oversize + zero
    got = {
        (r["grp"], r["seq_in_grp"]): (
            r["n_docs"], r["tok_sum"], r["pad"],
            r["first_doc"], r["last_doc"], r["oversize"],
        )
        for r in pack_greedy_nosplit(
            _toks_df(spark, rows).repartition(7), L, id_prefix_len=8
        ).collect()
    }
    assert got == _reference_nosplit(rows, L, 8)
    # no multi-doc sequence may exceed seq_len; oversize iff singleton > L
    for (_g, _s), (nd, ts, _p, _f, _l, ov) in got.items():
        assert ov == (ts > L)
        if nd > 1:
            assert ts <= L


def test_pack_nosplit_exact_fit_and_oversize_edges(spark):
    from sorting_compressed_time_series_spark.operators.packing import (
        pack_greedy_nosplit,
    )

    rows = [
        ("a00", [1] * 10, "web"),   # 10
        ("a01", [1] * 6, "web"),    # 10+6 = 16 == L: exact fit, same seq
        ("a02", [1] * 1, "web"),    # overflow -> seq 1
        ("a03", [1] * (L + 5), "web"),  # oversize -> rolls to seq 2, alone
        ("a04", [1] * 2, "web"),    # after oversize -> seq 3
    ]
    out = sorted(
        (r["seq_in_grp"], r["n_docs"], r["tok_sum"], r["oversize"])
        for r in pack_greedy_nosplit(
            _toks_df(spark, rows), L, id_prefix_len=1
        ).collect()
    )
    assert out == [(0, 2, 16, False), (1, 1, 1, False),
                   (2, 1, L + 5, True), (3, 1, 2, False)]


def test_pack_nosplit_prunes_token_arrays(spark, tmp_path):
    """On a parquet source the fill must read only (doc_id, n_tok): the
    scan's ReadSchema and the collect_list struct must exclude the token
    arrays — the property that keeps the shuffle ~20 bytes/doc at corpus
    scale."""
    from sorting_compressed_time_series_spark.operators.packing import (
        pack_greedy_nosplit,
    )

    p = str(tmp_path / "toks.parquet")
    _toks_df(spark, _rows(seed=5, n_docs=20)).write.parquet(p)
    plan = (
        pack_greedy_nosplit(spark.read.parquet(p), L)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and all("tokens" not in ln for ln in scan), scan
    assert "collect_list" in plan and "tokens" not in plan.split("Scan")[0]


def test_pack_nosplit_long_chain_many_groups(spark):
    """Stress the vectorized fill's pointer-doubling chain enumeration:
    one group packing into >200 sequences (many doubling rounds), plus
    uneven sibling groups in the same Arrow batch — boundary alignment
    between groups must hold for every output column."""
    from sorting_compressed_time_series_spark.operators.packing import (
        pack_greedy_nosplit,
    )

    rows = []
    # group 'g0': 500 docs of 7 tokens -> floor(16/7)=2 docs/seq, 250 seqs
    rows += [(f"g0_{i:04d}", [1] * 7, "web") for i in range(500)]
    # group 'g1': single doc
    rows += [("g1_0000", [1] * 3, "web")]
    # group 'g2': alternating oversize / tiny
    rows += [(f"g2_{i:04d}", [1] * (L + 1 if i % 2 else 2), "web")
             for i in range(9)]
    got = {
        (r["grp"], r["seq_in_grp"]): (
            r["n_docs"], r["tok_sum"], r["pad"],
            r["first_doc"], r["last_doc"], r["oversize"],
        )
        for r in pack_greedy_nosplit(
            _toks_df(spark, rows).repartition(5), L, id_prefix_len=2
        ).collect()
    }
    assert got == _reference_nosplit(rows, L, 2)
    assert len([k for k in got if k[0] == "g0"]) == 250


def test_pack_sequences_skewed_prefix_autowiden(spark):
    """Planted skew: every doc_id shares the first 12 chars, so the
    default 9-char prefix yields ONE giant group. With max_group_docs the
    prefix auto-widens until groups are bounded, and the packed output is
    identical to the unguarded run (global offsets are invariant to the
    prefix length)."""
    from sorting_compressed_time_series_spark.operators.packing import (
        _widen_prefix_for_skew,
        pack_sequences,
    )

    rows = [(f"tenantAAABBB{i:05d}", [i % 50] * 7, "web") for i in range(200)]
    df = _toks_df(spark, rows).repartition(5)
    plain = {
        (r["seq_id"],): (tuple(r["tokens"]), r["n_docs"])
        for r in pack_sequences(df, L, id_prefix_len=9).collect()
    }
    guarded = {
        (r["seq_id"],): (tuple(r["tokens"]), r["n_docs"])
        for r in pack_sequences(
            df, L, id_prefix_len=9, max_group_docs=50
        ).collect()
    }
    assert guarded == plain and len(plain) > 0
    # the widening itself bounds the max group size
    from pyspark.sql import functions as SF

    docs = df.filter(SF.col("n_tok") > 0).withColumn(
        "grp", SF.substring("doc_id", 1, 9)
    )
    widened, plen = _widen_prefix_for_skew(docs, 9, 50)
    assert plen > 9
    biggest = widened.groupBy("grp").count().agg(SF.max("count")).collect()[0][0]
    assert biggest <= 50


def test_token_histogram_sparse_width_fallback(spark):
    """An outlier token id (width ≫ 2^22) must not blow up the dense
    bincount — the sort-based fallback yields identical partials."""
    from sorting_compressed_time_series_spark.operators.packing import (
        token_histogram,
    )

    rows = [
        ("d0", [5, 5, 7, 1 << 30], "web"),
        ("d1", [5, 7, 7], "web"),
    ]
    out = {
        r["token"]: (r["n_occ"], r["n_docs"])
        for r in token_histogram(_toks_df(spark, rows), top_k=10).collect()
    }
    assert out == {5: (3, 2), 7: (3, 2), 1 << 30: (1, 1)}
