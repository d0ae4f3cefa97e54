"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are JVM-side (split / higher-order array functions /
md5 / pure arithmetic) — no Python in the loop; every formula is chosen to
be bit-reproducible in DuckDB for the oracle cross-check.

Operators: token counting, quality scoring, language-ID heuristic,
document fingerprinting (md5 canonical + winnowing rolling-hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("the", "a")

# language -> marker words (a tiny deterministic language-ID heuristic;
# a real system would plug a model UDF into the same shape).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "das", "und"),
    "en": ("the", "a"),
    "es": ("el", "los", "y"),
    "fr": ("le", "la", "et"),
    "zh": ("的",),
}


def _tokens(col: str = "text"):
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_m) — whitespace tokenization, JVM split."""
    return docs.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_m"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, quality) — length/stopword heuristic.

    quality = min(1, n_tokens/100) * (1 - stop_ratio), pure arithmetic so
    Spark and DuckDB agree exactly (rounded to 4 decimals).
    """
    toks = _tokens()
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(F.expr(
        f"filter(split(lower(trim(text)), '\\\\s+'), x -> x in ({stop_list}))"
    )).cast("double")
    stop_ratio = F.round(n_stop / n_tok, 4)
    quality = F.round(F.least(F.lit(1.0), n_tok / 100.0) * (1 - n_stop / n_tok), 4)
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


def _lang_score(lang: str):
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return F.size(F.expr(
        f"filter(split(lower(trim(text)), '\\\\s+'), x -> x in ({markers}))"
    ))


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — marker-word language ID.

    Decision rule (shared verbatim with the oracle SQL): evaluate languages
    in alphabetical order; the first whose score strictly exceeds the max of
    all the others wins; otherwise 'en'.
    """
    langs = sorted(LANG_MARKERS)
    scores = {lg: _lang_score(lg).alias(f"s_{lg}") for lg in langs}
    scored = docs.select("doc_id", *scores.values())
    pred = F.lit("en")
    for lg in reversed([lg for lg in langs if lg != "en"]):
        others = [F.col(f"s_{o}") for o in langs if o != lg]
        pred = F.when(F.col(f"s_{lg}") > F.greatest(*others), lg).otherwise(pred)
    return scored.select("doc_id", pred.alias("pred_lang"))


def lang_id_oracle_sql_case() -> str:
    """The identical decision rule as a SQL CASE chain (for the oracle)."""
    langs = sorted(LANG_MARKERS)
    clauses = []
    for lg in langs:
        if lg == "en":
            continue
        others = ", ".join(f"s_{o}" for o in langs if o != lg)
        clauses.append(f"WHEN s_{lg} > GREATEST({others}) THEN '{lg}'")
    return "CASE " + " ".join(clauses) + " ELSE 'en' END"


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — canonical md5 fingerprint of normalized text."""
    return docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))


def winnow_fingerprints(docs: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """(doc_id, fp[]) — winnowing: min rolling-hash per window of k-gram
    hashes (Schleimer et al. 2003), all JVM higher-order functions.

    Shingle hash = first 8 hex chars of md5 (engine-portable); windows of w
    consecutive shingle hashes, min per window, distinct mins per doc.
    """
    toks = "split(lower(trim(text)), '\\\\s+')"
    shingles = (
        f"transform(sequence(1, greatest(size({toks}) - {k} + 1, 1)), "
        f"i -> concat_ws(' ', slice({toks}, i, {k})))"
    )
    hashes = (f"transform({shingles}, "
              f"s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint))")
    windows = (
        f"transform(sequence(1, greatest(size({hashes}) - {w} + 1, 1)), "
        f"i -> array_min(slice({hashes}, i, {w})))"
    )
    return docs.select(
        "doc_id",
        F.expr(f"array_sort(array_distinct({windows}))").alias("fp"),
    )
