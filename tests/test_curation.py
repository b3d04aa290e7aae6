"""Curation-stage oracles beyond the SQL gate: planted-contamination
detection, exact md5-key sample recomputation, and a pandas reference for
the histogram-cutoff top-p filter (incl. boundary tie-break)."""

import hashlib
import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from sorting_compressed_time_series_spark.operators import curation as CUR
from sorting_compressed_time_series_spark.operators import textstats as TXT

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_decontaminate_planted(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, bench_text, "bench"),                       # benchmark doc
        (1, bench_text, "corp"),                        # exact copy: ratio 1.0
        (2, "alpha beta gamma nine ten eleven twelve", "corp"),  # 1 of 5 shingles
        (3, "one two three four five six seven", "corp"),        # disjoint
        (4, "xx", "corp"),                               # < n words: 0 shingles
    ]
    docs = _mk_docs(spark, rows)
    out = (
        CUR.decontaminate(docs, docs.filter("doc_id = 0"), n=3, tau=0.5)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3, 4]  # benchmark doc excluded
    assert out.loc[1, "contamination"] == 1.0 and bool(out.loc[1, "contaminated"])
    assert out.loc[2, "n_shingles"] == 5 and out.loc[2, "n_hit"] == 1
    assert out.loc[2, "contamination"] == 0.2 and not out.loc[2, "contaminated"]
    assert out.loc[3, "n_hit"] == 0 and out.loc[3, "contamination"] == 0.0
    assert out.loc[4, "n_shingles"] == 0 and out.loc[4, "contamination"] == 0.0


def test_decontaminate_counts_distinct_shingles_once(spark):
    # repeated shingle in the corpus doc counts once (shingle SETS)
    rows = [
        (0, "a b c d", "bench"),
        (1, "a b c a b c a b c", "corp"),
    ]
    docs = _mk_docs(spark, rows)
    out = CUR.decontaminate(docs, docs.filter("doc_id = 0"), n=3).toPandas()
    row = out[out.doc_id == 1].iloc[0]
    # distinct shingles of doc 1: {a b c, b c a, c a b, ...} = 3; only 'a b c' hits
    assert row.n_shingles == 3 and row.n_hit == 1


def _py_sample_key(doc_id: int) -> int:
    return int(hashlib.md5(f"sample:{doc_id}".encode()).hexdigest()[:8], 16)


def test_stratified_sample_exact_membership(spark, docs):
    rates = {"src0": 0.8, "src1": 0.5, "src2": 0.25}
    out = CUR.stratified_sample(docs, rates, default_rate=0.1).toPandas()
    ref = docs.select("doc_id", "source").toPandas()
    ref["skey"] = ref.doc_id.map(_py_sample_key)
    ref["thr"] = ref.source.map(lambda s: min(int(rates.get(s, 0.1) * 2**32), 2**32))
    kept = ref[ref.skey < ref.thr]
    assert set(out.doc_id) == set(kept.doc_id)
    assert dict(zip(out.doc_id, out.skey)) == dict(zip(kept.doc_id, kept.skey))


def test_stratified_sample_deterministic_and_rate(spark, docs):
    rates = {"src0": 1.0}
    a = CUR.stratified_sample(docs, rates, default_rate=0.0).toPandas()
    b = CUR.stratified_sample(docs, rates, default_rate=0.0).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)
    n_src0 = docs.filter("source = 'src0'").count()
    assert len(a) == n_src0  # rate 1.0 keeps the whole stratum, 0.0 nothing else


def test_quality_topp_matches_pandas_reference(spark, docs):
    pct = 40
    out = CUR.quality_topp_filter(docs, TXT.quality_expr(), keep_percent=pct).toPandas()
    scored = (
        docs.select("doc_id", F.col("source").alias("stratum"),
                    TXT.quality_expr().alias("quality"))
        .toPandas()
    )
    keep = []
    for s, g in scored.groupby("stratum"):
        k = (len(g) * pct + 99) // 100
        g = g.sort_values(["quality", "doc_id"], ascending=[False, True])
        keep.append(g.head(k))
    ref = pd.concat(keep)
    assert len(out) == len(ref)
    got = out.sort_values("doc_id").reset_index(drop=True)[["doc_id", "stratum", "quality"]]
    want = ref.sort_values("doc_id").reset_index(drop=True)[["doc_id", "stratum", "quality"]]
    pd.testing.assert_frame_equal(got, want)


def test_quality_topp_boundary_tiebreak(spark):
    # 5 docs, all the same quality, one stratum, keep 40% -> K = 2, smallest ids
    rows = [(i, "same words here exactly alike", "s") for i in range(5)]
    docs = _mk_docs(spark, rows)
    out = CUR.quality_topp_filter(docs, TXT.quality_expr(), keep_percent=40).toPandas()
    assert sorted(out.doc_id) == [0, 1]


def test_quality_topp_k_is_integer_exact(spark):
    # n=25, pct=40 -> K must be exactly 10 (a float 0.4*25 could round to 11)
    rows = [(i, f"w{i} " * (i + 1), "s") for i in range(25)]
    docs = _mk_docs(spark, rows)
    out = CUR.quality_topp_filter(docs, TXT.quality_expr(), keep_percent=40)
    assert out.count() == 10
    assert math.ceil(25 * 40 / 100) == 10


def test_curate_pipeline_stage_order_planted(spark):
    # 100 distinct alnum words -> quality exactly 1.0 (len_sat = distinct =
    # alpha = 1.0); junk docs land far below. K = ceil(40% * 10) = 4 keeps
    # exactly the four quality-1.0 docs, so each later stage's effect is
    # attributable: dedup drops 3 (dup of 2, larger id), decontamination
    # drops 4 (its text IS the benchmark doc), sampling at rate 1.0 keeps
    # the rest.
    w = lambda p: " ".join(f"{p}{i}" for i in range(100))
    bench = _mk_docs(spark, [(1000, w("c"), "bench")])
    corpus = _mk_docs(
        spark,
        [(1, w("a"), "s"), (2, w("b"), "s"), (3, w("b"), "s"), (4, w("c"), "s")]
        + [(i, "junk junk", "s") for i in range(5, 11)],
    )
    out = (
        CUR.curate(corpus, bench, TXT.quality_expr(), {"s": 1.0},
                   default_rate=0.0, keep_percent=40, n=3, tau=0.1)
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(out.doc_id) == [1, 2]
    assert list(out.quality) == [1.0, 1.0]
    assert list(out.stratum) == ["s", "s"]
    assert list(out.skey) == [_py_sample_key(1), _py_sample_key(2)]


def test_curate_dedup_runs_on_quality_survivors(spark):
    # A dup group whose smallest id FAILED the quality bar: the kept doc of
    # the group must be the smallest SURVIVING id (doc 6), not the corpus-wide
    # min (doc 1) — i.e. dedup composes after the quality stage, matching a
    # staged pipeline.
    w = lambda p: " ".join(f"{p}{i}" for i in range(100))
    dup = w("d")
    bench = _mk_docs(spark, [(1000, w("z"), "bench")])
    corpus = _mk_docs(
        spark,
        # doc 1: dup text TRUNCATED below the len_sat=1.0 bar (40 words) so
        # it loses the quality cut; docs 6,7 are full-quality dups
        [(1, " ".join(f"d{i}" for i in range(40)), "s"),
         (6, dup, "s"), (7, dup, "s"), (2, w("a"), "s"), (3, w("b"), "s"),
         (4, w("e"), "s")]
        + [(i, "junk junk", "s") for i in range(8, 13)],
    )
    # 11 corpus docs -> K = ceil(4.4) = 5: quality-1.0 docs {2,3,4,6,7} win;
    # doc 1 (quality < 1.0) is squeezed out by the five 1.0s
    out = (
        CUR.curate(corpus, bench, TXT.quality_expr(), {"s": 1.0},
                   default_rate=0.0, keep_percent=40, n=3, tau=0.1)
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(out.doc_id) == [2, 3, 4, 6]  # 7 deduped against 6; 1 never seen


# -- repetition signals -------------------------------------------------------


def test_repetition_planted_exact_fracs(spark):
    rows = [
        # 8 words, "spam" x4 -> top_word 4/8; bigram "spam spam" 3/7
        (1, "spam spam spam spam a b c d", "s"),
        # no repetition: 4 distinct words -> top_word 1/4, top_bigram 1/3
        (2, "alpha beta gamma delta", "s"),
        # single word: bigram array empty -> frac 0.0 by definition
        (3, "solo", "s"),
        # case/whitespace normalization folds "The  the" into one word
        (4, "The  the THE x", "s"),
    ]
    out = (
        TXT.repetition_stats(_mk_docs(spark, rows))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "top_word_frac"] == round(4 / 8, 6)
    assert out.loc[1, "top_bigram_frac"] == round(3 / 7, 6)
    assert bool(out.loc[1, "flagged"])  # 0.5 > 0.20
    assert out.loc[2, "top_word_frac"] == 0.25
    assert out.loc[2, "top_bigram_frac"] == round(1 / 3, 6)
    # very short docs trip the bigram cutoff (1/3 > 0.18) — threshold
    # semantics, same reason the published filters gate on doc length first
    assert bool(out.loc[2, "flagged"])
    assert out.loc[3, "n_words"] == 1
    assert out.loc[3, "top_bigram_frac"] == 0.0
    assert out.loc[4, "top_word_frac"] == 0.75  # the/the/the folded


def test_repetition_flag_thresholds(spark):
    # 10 distinct words -> top_word 0.1, top_bigram 1/9 ~ 0.111: both clear
    clean = " ".join(f"w{i}" for i in range(10))
    # 10 words, one word 3x -> top_word 0.3 > 0.20: flagged on words only
    wordy = "x x x " + " ".join(f"w{i}" for i in range(7))
    out = (
        TXT.repetition_stats(_mk_docs(spark, [(1, clean, "s"), (2, wordy, "s")]))
        .toPandas()
        .set_index("doc_id")
    )
    assert not bool(out.loc[1, "flagged"])
    assert bool(out.loc[2, "flagged"])


def test_repetition_plan_is_shuffle_free(spark, docs):
    from tests.test_plans import plan_of

    plan = plan_of(TXT.repetition_stats(docs))
    assert "Exchange" not in plan, plan


# -- PII scrubbing ------------------------------------------------------------


def test_pii_scrub_planted_counts_and_redaction(spark):
    import duckdb

    rows = [
        (1, "mail me at jane.doe+x@example.co and bob@test.org thanks", "s"),
        (2, "server 10.0.255.7 then call +1 415 555 0199 now", "s"),
        # the email's digits must NOT also count as a phone (order matters)
        (3, "a12345678901@host.com", "s"),
        (4, "nothing sensitive here", "s"),
    ]
    sdf = (
        TXT.pii_scrub(_mk_docs(spark, rows))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert sdf.loc[1, "n_email"] == 2 and sdf.loc[1, "n_phone"] == 0
    assert sdf.loc[2, "n_ipv4"] == 1 and sdf.loc[2, "n_phone"] == 1
    assert sdf.loc[3, "n_email"] == 1 and sdf.loc[3, "n_phone"] == 0
    assert (
        sdf.loc[4, ["n_email", "n_ipv4", "n_phone"]].sum() == 0
    )
    # cross-engine parity on the planted text: DuckDB (RE2) must produce the
    # exact same counts and scrubbed-text md5 as Spark (Java regex)
    from sorting_compressed_time_series_spark.queries import _pii_oracle_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t, _ in rows)
        + ") AS t(doc_id, text)"
    )
    odf = con.execute(_pii_oracle_sql()).df().set_index("doc_id").sort_index()
    pd.testing.assert_frame_equal(
        sdf.reset_index(), odf.reset_index(), check_dtype=False
    )


def test_pii_scrub_plan_is_shuffle_free(spark, docs):
    from tests.test_plans import plan_of

    plan = plan_of(TXT.pii_scrub(docs))
    assert "Exchange" not in plan, plan
