"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure Spark column expressions (JVM-side,
whole-stage codegen) — formulas intentionally simple enough to be mirrored
exactly in the SQL oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
ES_STOPWORDS = ["el", "la", "de", "y", "que", "en", "un", "es"]

def _words():
    return F.split(F.expr("lower(regexp_replace(trim(text), '\\\\s+', ' '))"), " ")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish unit estimate (≈ chars/4, the common
    subword heuristic) + average word length."""
    w = _words()
    return docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        (F.length(F.trim("text")) / 4).cast("bigint").alias("n_bpe_est"),
        F.col("n_chars").alias("n_chars"),
    )


def quality_expr() -> F.Column:
    """The 6-dp-rounded composite quality column over a `text` column:
    length saturation + vocabulary diversity + alphanumeric density.
    Deterministic closed-form; shared by quality_score and the curation
    top-p filter (and mirrored verbatim in both DuckDB oracles)."""
    w = _words()
    n_words = F.size(w)
    distinct_ratio = F.size(F.array_distinct(w)) / n_words
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", "")) / F.length("text")
    )
    len_sat = F.least(n_words / F.lit(100.0), F.lit(1.0))
    return F.round(0.4 * len_sat + 0.3 * distinct_ratio + 0.3 * alpha_ratio, 6)


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite quality heuristic per doc (see quality_expr)."""
    return docs.select("doc_id", quality_expr().alias("quality"))


def language_id(docs: DataFrame) -> DataFrame:
    """n-gram/stopword-hit heuristic: count marker-word hits per language,
    argmax with a minimum-evidence threshold."""
    w = _words()
    en = F.size(F.filter(w, lambda x: x.isin(*EN_STOPWORDS)))
    es = F.size(F.filter(w, lambda x: x.isin(*ES_STOPWORDS)))
    pred = (
        F.when((en >= 2) & (en >= es), F.lit("en"))
        .when((es >= 2) & (es > en), F.lit("es"))
        .otherwise(F.lit("unk"))
    )
    return docs.select("doc_id", pred.alias("pred_lang"), en.alias("en_hits"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive rolling polynomial hash over words (mod 1e9+7, no
    overflow under ANSI mode): fp = fold(fp*1000003 + wordsig) — a
    content-defined document id for near-dup triage."""
    w = _words()
    wordsig = lambda x: F.length(x) * 131 + F.coalesce(
        F.ascii(F.substring(x, 1, 1)), F.lit(0)
    )
    fp = F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 1000003 + wordsig(x)) % 1000000007,
    )
    return docs.select("doc_id", fp.alias("fp"))
