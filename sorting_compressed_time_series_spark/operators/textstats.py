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


def _max_run(arr: F.Column) -> F.Column:
    """Length of the longest run of equal adjacent elements.  Over a SORTED
    array this equals the max term frequency — computed row-locally with a
    single HOF fold (struct accumulator), so per-doc term statistics never
    explode into a corpus-sized shuffle."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = (
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(arr, acc0, step, lambda acc: acc["best"])


def repetition_stats(
    docs: DataFrame,
    max_word_frac: float = 0.20,
    max_bigram_frac: float = 0.18,
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021 §A1.1
    repetition filters, re-derived for a single-line corpus at word level):

    - ``top_word_frac``   — fraction of word occurrences taken by the most
      frequent word;
    - ``top_bigram_frac`` — fraction of word-bigram occurrences taken by the
      most frequent bigram;
    - ``flagged``         — True when either exceeds its threshold (defaults
      follow the published 0.20 / 0.18 duplication cutoffs).

    Scale design: everything is row-local (bigram array + sort + one fold per
    doc, whole-stage codegen) — the naive explode(bigram)→groupBy(doc, gram)
    plan shuffles a corpus-sized gram table; this plan shuffles NOTHING.
    """
    w = _words()
    base = docs.select("doc_id", w.alias("ws"))
    ws = F.col("ws")
    n_words = F.size(ws)
    bigrams = (
        F.when(
            n_words >= 2,
            F.transform(
                F.sequence(F.lit(1), n_words - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(ws, i), F.element_at(ws, i + 1)
                ),
            ),
        )
        .otherwise(F.slice(ws, 1, 0))
    )
    top_w = F.round(_max_run(F.array_sort(ws)) / n_words, 6)
    top_b = (
        F.when(
            n_words >= 2,
            F.round(_max_run(F.array_sort(bigrams)) / (n_words - 1), 6),
        )
        .otherwise(F.lit(0.0))
    )
    return base.select(
        "doc_id",
        n_words.alias("n_words"),
        top_w.alias("top_word_frac"),
        top_b.alias("top_bigram_frac"),
    ).withColumn(
        "flagged",
        (F.col("top_word_frac") > max_word_frac)
        | (F.col("top_bigram_frac") > max_bigram_frac),
    )


# Redaction patterns restricted to constructs with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): classes, bounded quantifiers, \b.
# Order matters: emails before phones (digits in a local-part must not be
# phone-matched), IPs before phones (dotted quads contain digit runs).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\b\+?\d[\d -]{7,14}\d\b"),
]


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII redaction stage: replace email / IPv4 / phone-shaped spans with
    ``<EMAIL>``/``<IPV4>``/``<PHONE>`` tokens, counting matches per class.
    Counts are taken on the progressively-scrubbed text in PII_PATTERNS
    order so one span is only ever counted once.  Emits the md5 of the
    scrubbed text (not the text itself) so downstream joins and the
    correctness gate stay fixed-width.  Pure column expressions — map-only,
    zero shuffle, whole-stage codegen."""
    cleaned = F.col("text")
    cols = [F.col("doc_id")]
    for name, pat in PII_PATTERNS:
        cols.append(F.size(F.regexp_extract_all(cleaned, F.lit(pat), 0)).alias(f"n_{name}"))
        cleaned = F.regexp_replace(cleaned, pat, f"<{name.upper()}>")
    cols.append(F.md5(F.encode(cleaned, "UTF-8")).alias("clean_md5"))
    return docs.select(*cols)
