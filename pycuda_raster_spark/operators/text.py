"""Text-analysis operators for the documents table — all JVM-side built-ins
(no UDFs at all): the whole module survives whole-stage codegen, and every
operator has an exact ANSI-SQL oracle (see __spark_entry__.oracle_sql).

* ``with_token_count``   — whitespace + BPE-ish regex token counts.
* ``with_quality``       — length / punctuation / stopword / uppercase
                           ratios + a composite quality score.
* ``with_lang_id``       — n-gram-free heuristic language ID (stopword hit
                           rate over a small English function-word list).
* ``with_fingerprint``   — md5 document fingerprint over normalized text
                           (md5 exists in both Spark and DuckDB → exact
                           cross-engine oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small function-word list: enough signal for the heuristic, tiny enough to
# inline into both Spark and DuckDB SQL
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# multilingual function-word profiles (VERDICT r3 #8): the highest hit rate
# wins (ties -> earlier language in this dict's order), 'unk' below the
# threshold. Pure JVM set-membership counting — same shape as the English
# heuristic, and each profile inlines into the DuckDB oracle unchanged.
LANG_STOPWORDS = {
    "en": EN_STOPWORDS,
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "los", "las", "es", "no", "con", "una", "para", "por", "como"],
}


def _tokens(text_col):
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens: whitespace tokens; n_bpe_ish: sub-word-ish pieces split on
    word boundaries/punct/digits (a cheap stand-in for BPE vocab growth)."""
    return df.withColumn(
        "n_tokens", F.size(_tokens(F.col(text_col)))
    ).withColumn(
        "n_bpe_ish",
        F.size(
            F.filter(
                F.split(F.col(text_col), r"[^A-Za-z0-9]+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=[0-9])"),
                lambda t: t != F.lit(""),
            )
        ),
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: mean word length, punctuation density, stopword
    ratio, and a composite score in [0, 1]."""
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    mean_wl = (n_chars - n_tok + 1).cast("double") / F.greatest(n_tok, F.lit(1))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1))
    score = (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_word_len", mean_wl)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


def with_lang_id(df: DataFrame, text_col: str = "text", threshold: float = 0.05) -> DataFrame:
    """lang_pred: 'en' when the stopword hit rate clears the threshold,
    else 'unk'. Deliberately simple + SQL-portable; a production system
    would swap in a character-n-gram model behind the same column."""
    toks = _tokens(F.col(text_col))
    rate = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS))).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    )
    return df.withColumn(
        "lang_pred", F.when(rate >= threshold, F.lit("en")).otherwise(F.lit("unk"))
    )


def with_lang_id_multi(df: DataFrame, text_col: str = "text",
                       threshold: float = 0.05) -> DataFrame:
    """Multilingual language ID over the ``LANG_STOPWORDS`` profiles:
    per-language function-word hit rates (``rate_<lang>`` columns) and
    ``lang_pred`` = argmax rate (ties -> earlier profile; 'unk' when the
    best rate is below ``threshold``). All rates are exact small-integer
    ratios, so the DuckDB oracle reproduces every double bit-for-bit; the
    argmax is expressed as greatest + equality CASE so both engines share
    one tie-break definition. Still zero UDFs — codegen end to end."""
    toks = _tokens(F.col(text_col))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    out = df
    rates = []
    def member_of(words):
        # NOTE: a `lambda t, w=words:` default would NOT work here —
        # F.filter treats a second lambda parameter as the array INDEX
        return lambda t: t.isin(words)

    for lang, words in LANG_STOPWORDS.items():
        r = F.size(F.filter(toks, member_of(words))).cast("double") / n_tok
        out = out.withColumn(f"rate_{lang}", r)
        rates.append(f"rate_{lang}")
    best = F.greatest(*[F.col(c) for c in rates])
    pred = F.when(best < F.lit(float(threshold)), F.lit("unk"))
    for lang in LANG_STOPWORDS:
        pred = pred.when(F.col(f"rate_{lang}") == best, F.lit(lang))
    return out.withColumn("lang_pred", pred)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of lowercase text with all
    non-alphanumerics stripped (normalization catches whitespace/punct
    variants of the same content)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    return df.withColumn("fingerprint", F.md5(norm))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     top_share_max: float = 0.125) -> DataFrame:
    """Gopher-style repetition signals per document (the rules large-scale
    training-data pipelines apply before training; Rae et al. 2021 §A1.1):

    * ``n_tokens`` / ``n_distinct_tokens`` — duplicate-token pressure;
    * ``top2`` / ``top2_n`` — the most frequent word 2-gram (ties broken
      lexicographically, so both engines pick the same gram) and its count;
    * ``top2_share`` — fraction of the doc's 2-grams that are that gram;
    * ``repetitive`` — flag: ``top2_share > top_share_max`` (default 0.125,
      a binary fraction so the literal is exact in both engines).

    Plan shape: the 2-gram build is a per-row JVM array transform (no
    Python), then ONE explode + groupBy on (doc, gram) — the standard
    scalable shape for arbitrarily long documents (per-doc state never
    materializes on one executor beyond its own gram counts, and AQE can
    split a skewed mega-doc's key range). Counts are integers and the
    share is a single double division, so the DuckDB twin matches
    bit-for-bit. Docs with < 2 tokens carry zero 2-grams and surface with
    ``top2 = NULL, top2_share = 0``.
    """
    toks = _tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        # guard: sequence(0, -1) would be DESCENDING in Spark, so a
        # 1-token doc must short-circuit to an empty gram list
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                      F.element_at(toks, i + 2)),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("grams"),
    )
    counts = (
        base.select(id_col, "n_tokens", "n_distinct_tokens",
                    F.explode_outer("grams").alias("gram"))
        .groupBy(id_col, "n_tokens", "n_distinct_tokens", "gram")
        .agg(F.count(F.lit(1)).alias("gram_n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("gram").isNull().asc(),  # real grams before the empty-doc row
        F.col("gram_n").desc(), F.col("gram").asc())
    top = counts.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") == 1)
    n_grams = F.greatest(F.col("n_tokens") - 1, F.lit(1)).cast("double")
    share = F.when(F.col("gram").isNull(), F.lit(0.0)).otherwise(
        F.col("gram_n").cast("double") / n_grams)
    return top.select(
        F.col(id_col),
        "n_tokens", "n_distinct_tokens",
        F.col("gram").alias("top2"),
        F.when(F.col("gram").isNull(), F.lit(0))
         .otherwise(F.col("gram_n")).cast("long").alias("top2_n"),
        share.alias("top2_share"),
        (share > F.lit(float(top_share_max))).alias("repetitive"),
    )
