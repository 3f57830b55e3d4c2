"""Text analysis operators for training-data pipelines (north-star
extension): token statistics, quality scoring, language ID, fingerprinting.

All pure DataFrame expressions (no Python in the row path); each has a
DuckDB-oracle twin registered in plans/q_llm.py. Regex classes stay ASCII
(\\w, \\s) where Java regex and RE2 agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the heuristic language ID.
# Order matters: ties resolve to the first language in this list.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "de", "los", "y", "que"),
    "fr": ("le", "les", "des", "et", "une", "dans"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}

# BPE-ish pre-tokenization: word runs or single non-space punctuation.
TOKEN_REGEX = r"\w+|[^\w\s]"


def words(c: Column) -> Column:
    return F.split(c, " ")


def stopword_hits(c: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of words that are in the given stopword set (array filter —
    no explode, no shuffle)."""
    arr = ", ".join(f"'{w}'" for w in stopwords)
    return F.size(F.filter(words(c), lambda w: w.isin(*stopwords))).cast("int")


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace + regex token counts, char counts, mean token length."""
    t = F.col(text_col)
    n_ws = F.size(words(t)).cast("int")
    return df.select(
        F.col(id_col),
        n_ws.alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)).cast("int")
        .alias("n_re_tokens"),
        F.length(t).cast("int").alias("n_chars"),
        (F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double") / n_ws)
        .alias("mean_tok_len"))


def quality_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality features + composite score in [0, ~1]:
    stopword ratio (fluency proxy), punctuation/digit density, length band.
    Deterministic double arithmetic, fixed evaluation order."""
    t = F.col(text_col)
    n_ws = F.size(words(t)).cast("int")
    n_chars = F.length(t).cast("int")
    n_stop = stopword_hits(t, LANG_STOPWORDS["en"])
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    stop_ratio = n_stop.cast("double") / n_ws
    punct_ratio = n_punct.cast("double") / n_chars
    digit_ratio = n_digit.cast("double") / n_chars
    len_ok = F.when((n_ws >= 10) & (n_ws <= 100000), 1.0).otherwise(0.0)
    score = (stop_ratio * 0.4 + (F.lit(1.0) - punct_ratio) * 0.3
             + (F.lit(1.0) - digit_ratio) * 0.1 + len_ok * 0.2)
    return df.select(
        F.col(id_col), n_ws.alias("n_words"),
        stop_ratio.alias("stop_ratio"), punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"), score.alias("quality_score"))


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: stopword-profile hit counts, first-max wins
    in LANG_STOPWORDS order (deterministic tie-break)."""
    t = F.col(text_col)
    scores = {lang: stopword_hits(t, sw) for lang, sw in LANG_STOPWORDS.items()}
    langs = list(LANG_STOPWORDS)
    pred = F.lit(langs[0])
    best = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best
        pred = F.when(is_better, F.lit(lang)).otherwise(pred)
        best = F.when(is_better, scores[lang]).otherwise(best)
    cols = [F.col(id_col)] + \
        [scores[lang].alias(f"score_{lang}") for lang in langs] + \
        [pred.alias("pred_lang")]
    return df.select(*cols)


def fingerprints(df: DataFrame, text_col: str, id_col: str,
                 n: int = 5) -> DataFrame:
    """Document fingerprints over word n-gram shingles:
    - fp_md5: lexicographic min of md5(shingle) — portable (oracle-checkable)
    - fp_xx:  min xxhash64(shingle) — the cheap engine-native variant
    Equal fingerprints => near-certain shared content prefix window."""
    from mapreduce_wsi_spark.operators.dedup import word_shingles
    sh = word_shingles(df, text_col, id_col, n)
    return (sh.groupBy(F.col("id").alias(id_col))
            .agg(F.min(F.md5(F.col("shingle"))).alias("fp_md5"),
                 F.min(F.xxhash64(F.col("shingle"))).alias("fp_xx")))
