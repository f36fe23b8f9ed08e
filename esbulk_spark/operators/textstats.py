"""Text-analysis operators for training-data pipelines.

Language-ID (marker-word heuristic), quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions (JVM-side,
whole-stage codegen) with exact DuckDB-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker words per language for the n-gram/marker heuristic; deterministic
# and deliberately tiny — the point is the OPERATOR SHAPE (vectorized
# count-of-matches + argmax), not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "los", "y", "es"),
    "zh": ("de", "shi", "le", "he"),
}

STOP_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _count_word(text_col, w: str):
    # word-boundary occurrences, case-insensitive
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(rf"\b{w}\b"), 0))


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Predicted language = argmax of marker-word hit counts (ties break
    alphabetically on language code)."""
    # struct sort compares fields in order: (hits, tie) — tie = -index so
    # that equal hit counts resolve to the alphabetically FIRST language
    scores = F.array(
        *[
            F.struct(
                sum(_count_word(F.col(text_col), w) for w in ws).alias("hits"),
                F.lit(-i).alias("tie"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, ws) in enumerate(sorted(LANG_MARKERS.items()))
        ]
    )
    best = F.sort_array(scores, asc=False)[0]
    return df.select(
        F.col(id_col).alias("id"), best["lang"].alias("pred_lang"), best["hits"].alias("marker_hits")
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features and a
    boolean keep flag (the usual pre-training corpus filter shape)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    mean_word_len = F.when(n_words > 0, (F.length(F.concat_ws("", words)) / n_words)).otherwise(F.lit(0.0))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), 0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_hits = sum(
        F.size(F.regexp_extract_all(F.lower(t), F.lit(rf"\b{w}\b"), 0)) for w in STOP_EN
    )
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    keep = (
        (n_words >= 5)
        & (punct_ratio < 0.3)
        & (mean_word_len >= 2.0)
        & (mean_word_len <= 12.0)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        keep.cast("int").alias("keep"),
    )


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish subword count (letter runs, digit runs,
    single punctuation marks — the standard pre-tokenizer regex)."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != ""))
    bpe = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    return df.select(
        F.col(id_col).alias("id"), ws.alias("ws_tokens"), bpe.alias("bpe_tokens")
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Normalized-content fingerprint: lowercase, collapse whitespace,
    md5. Stable under reformatting — the standard near-exact dedup key."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col).alias("id"), F.md5(norm).alias("fp"))


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    public): hash every char k-gram of the normalized text, then keep
    the MINIMUM hash of each sliding window of ``window`` consecutive
    k-grams — the selected minima are the fingerprints that make
    partial-overlap detection robust to insertion/reordering, at
    ~1/window the density of all k-grams.

    Pure Catalyst: substr with a column offset inside transform (no
    Python), array_min over slices for the windows. Returns one row per
    distinct (id, fp). At corpus scale this feeds the same
    inverted-fingerprint join as dedup.jaccard_pairs."""
    from esbulk_spark.operators.dedup import md5_int

    from functools import reduce

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    n_grams = F.length(norm) - F.lit(k) + 1
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: md5_int(norm.substr(i, F.lit(k))),
    )
    n_windows = n_grams - F.lit(window) + 1
    # Sliding-window minima as an elementwise least() over `window`
    # SHIFTED slices of the hash array. NOT array_min(slice(...)) inside
    # a transform: Catalyst's projection collapse would inline the whole
    # k-gram/md5 pipeline PER WINDOW ELEMENT -> O(len^2) hashing. Here
    # `hashes` is referenced exactly `window` times (constant).
    L = F.greatest(n_windows, F.lit(1))
    shifted = [F.slice(hashes, i + 1, L) for i in range(window)]
    mins = reduce(lambda a, b: F.zip_with(a, b, lambda x, y: F.least(x, y)), shifted)
    fps = F.when(n_windows >= 1, F.array_distinct(mins)).otherwise(
        F.when(n_grams >= 1, F.array_distinct(hashes)).otherwise(
            F.slice(hashes, 1, 0)  # typed empty array<long>
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(fps).alias("fp"))
        .distinct()
    )
