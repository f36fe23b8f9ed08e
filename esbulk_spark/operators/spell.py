"""ES phrase-suggester analog: whole-phrase "did you mean" correction.

ES's phrase suggester generates per-token candidates from the index
terms (edit-distance bounded, like the term suggester) and re-ranks
whole candidate phrases with a Laplace-smoothed n-gram language model
built from the index's shingle field. This is the same design as a
noisy-channel spelling model (Kernighan, Church & Gale 1990, public):

    score(phrase) = log P_LM(phrase) + n_edits * log(p_error)

re-expressed over DataFrames: the LM is the corpus's add-alpha bigram
model (the machinery of textstats.lm_bigram_perplexity — ES's shingle
field is exactly an indexed bigram table), candidate generation is the
same length-band + prefix + levenshtein dictionary filter the fuzzy
query uses, and phrase composition is a chain of tiny broadcast cross
joins (<= per_slot+1 candidates per token, ES default-like caps).

Scale shape: the two LM aggs are one corpus pass each (shareable /
precomputable); candidate generation scans the VOCABULARY (not the
corpus) with a cheap band prefilter; the combo table is bounded by
per_slot^n_tokens rows (n_tokens capped); each count table narrows to
the combos' keys via a broadcast semi join before the outer scoring
join, so no corpus-sized table is ever built or shuffled per query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esbulk_spark.operators.textstats import _bigram_pairs, _ws_words

MAX_TOKENS = 5


def phrase_suggest(
    df: DataFrame,
    text_col: str,
    query: str,
    max_edits: int = 2,
    prefix_length: int = 1,
    per_slot: int = 5,
    k: int = 3,
    alpha: float = 0.5,
    p_error: float = 0.1,
) -> DataFrame:
    """Top-k corrected phrases for `query` as (suggestion, n_edits,
    score). The original token is always a candidate with 0 edits, so
    "no correction" competes on LM probability like any other phrase."""
    # one corpus tokenize feeds both count tables; uni and bi persist
    # (vocabulary-sized) because _suggest_over references uni once per
    # slot candidate set + self-row anti join + totals + per-position
    # narrows, and bi once per adjacent pair — each reference would
    # otherwise re-run the corpus explode+agg from scratch (guide §5;
    # the prebuilt-LM path below is the materialized form of the same
    # idea).
    words = df.select(_ws_words(text_col).alias("w"))
    uni = (
        words.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c1"))
        .persist()
    )
    bi = (
        words.filter(F.size("w") >= 2)
        .select(F.explode(_bigram_pairs()).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .persist()
    )
    totals = uni.agg(
        F.sum("c1").alias("tt"), F.count("*").alias("vsz")
    )  # one row -> broadcast
    return _suggest_over(
        uni, bi, totals, query, max_edits, prefix_length, per_slot, k,
        alpha, p_error,
    )


def _suggest_over(
    uni: DataFrame,
    bi: DataFrame,
    totals: DataFrame,
    query: str,
    max_edits: int,
    prefix_length: int,
    per_slot: int,
    k: int,
    alpha: float,
    p_error: float,
) -> DataFrame:
    """Candidate generation + noisy-channel scoring over (uni, bi,
    totals) count tables — shared by the corpus-pass and prebuilt-LM
    entry points."""
    toks = [w for w in query.lower().split() if w]
    if not toks:
        raise ValueError("empty query")
    if len(toks) > MAX_TOKENS:
        raise ValueError(f"phrase suggester caps at {MAX_TOKENS} tokens")

    def slot_candidates(i: int, tok: str) -> DataFrame:
        pref = tok[:prefix_length]
        band = (
            (F.length("t") >= len(tok) - max_edits)
            & (F.length("t") <= len(tok) + max_edits)
            & F.col("t").startswith(pref)
        )
        cand = (
            uni.filter(band)
            .withColumn("e", F.levenshtein(F.col("t"), F.lit(tok)))
            .filter(F.col("e") <= max_edits)
        )
        # the original token always competes, even out-of-vocabulary
        self_row = uni.sparkSession.createDataFrame(
            [(tok, 0, 0)], "t string, c1 long, e int"
        ).join(uni.filter(F.col("t") == tok), ["t"], "anti").select(
            "t", F.lit(0).cast("long").alias("c1"), F.lit(0).alias("e")
        )
        cand = cand.unionByName(self_row)
        # DirectSpellChecker-style rank: distance asc, freq desc, term
        # asc. Only the top per_slot+1 rows survive, so orderBy+limit
        # (TakeOrderedAndProject: per-partition heaps + driver merge)
        # instead of a global row_number window, which would funnel the
        # whole band-filtered vocabulary through one partition.
        return (
            cand.orderBy(F.asc("e"), F.desc("c1"), F.asc("t"))
            .limit(per_slot + 1)
            .select(
                F.col("t").alias(f"w{i}"), F.col("e").alias(f"e{i}")
            )
        )

    combos = slot_candidates(0, toks[0])
    for i, tok in enumerate(toks[1:], start=1):
        combos = combos.crossJoin(F.broadcast(slot_candidates(i, tok)))

    # LM score: log P(w0) + sum_i log P(w_{i+1} | w_i), add-alpha.
    # Outer joins cannot broadcast their preserved side, so the scale
    # move is: narrow each corpus-sized count table to the combos' keys
    # with a broadcast SEMI join (combos is per_slot^n rows), then the
    # left join's build side is that narrowed, combo-sized table.
    def _narrow(model: DataFrame, keys: list[str]) -> DataFrame:
        return model.join(
            F.broadcast(combos.select(*keys).distinct()), keys, "semi"
        )

    scored = combos.crossJoin(F.broadcast(totals)).join(
        F.broadcast(_narrow(
            uni.select(F.col("t").alias("w0"), F.col("c1").alias("p0")),
            ["w0"],
        )),
        ["w0"],
        "left",
    )
    score = F.log(
        (F.coalesce(F.col("p0"), F.lit(0)) + F.lit(alpha))
        / (F.col("tt") + F.lit(alpha) * F.col("vsz"))
    )
    n_edits = F.col("e0")
    for i in range(len(toks) - 1):
        b = bi.select(
            F.col("w1").alias(f"w{i}"),
            F.col("w2").alias(f"w{i + 1}"),
            F.col("c12").alias(f"b{i}"),
        )
        u = uni.select(
            F.col("t").alias(f"w{i}"), F.col("c1").alias(f"u{i}")
        )
        scored = scored.join(
            F.broadcast(_narrow(b, [f"w{i}", f"w{i + 1}"])),
            [f"w{i}", f"w{i + 1}"],
            "left",
        )
        scored = scored.join(
            F.broadcast(_narrow(u, [f"w{i}"])), [f"w{i}"], "left"
        )
        score = score + F.log(
            (F.coalesce(F.col(f"b{i}"), F.lit(0)) + F.lit(alpha))
            / (F.coalesce(F.col(f"u{i}"), F.lit(0)) + F.lit(alpha) * F.col("vsz"))
        )
        n_edits = n_edits + F.col(f"e{i + 1}")

    out = scored.select(
        F.concat_ws(" ", *[F.col(f"w{i}") for i in range(len(toks))]).alias(
            "suggestion"
        ),
        n_edits.alias("n_edits"),
        (score + n_edits * F.lit(math.log(p_error))).alias("score"),
    )
    return out.orderBy(F.desc("score"), F.asc("suggestion")).limit(k)


def build_lm(df: DataFrame, text_col: str, out_dir: str) -> dict:
    """Materialize the suggester's language model (unigram + bigram
    count tables + totals) to parquet. A deployment builds this once
    per index build; suggest-time work then drops from two corpus
    passes per query to joins against two count tables — the ES
    analogy is the shingle FIELD being indexed up front.

    Layout: <out_dir>/uni (t, c1), <out_dir>/bi (w1, w2, c12),
    <out_dir>/lm_meta.json {tt, vsz}."""
    import json
    import os

    words = df.select(_ws_words(text_col).alias("w"))
    uni = (
        words.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c1"))
    )
    bi = (
        words.filter(F.size("w") >= 2)
        .select(F.explode(_bigram_pairs()).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    uni.write.mode("overwrite").parquet(os.path.join(out_dir, "uni"))
    bi.write.mode("overwrite").parquet(os.path.join(out_dir, "bi"))
    spark = df.sparkSession
    tt, vsz = spark.read.parquet(os.path.join(out_dir, "uni")).agg(
        F.sum("c1"), F.count("*")
    ).first()
    meta = {"tt": int(tt), "vsz": int(vsz)}
    with open(os.path.join(out_dir, "lm_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


class PrebuiltLM:
    """Handle over a materialized LM directory for suggest-time reuse."""

    def __init__(self, spark, lm_dir: str):
        import json
        import os

        self.spark = spark
        self.uni = spark.read.parquet(os.path.join(lm_dir, "uni"))
        self.bi = spark.read.parquet(os.path.join(lm_dir, "bi"))
        with open(os.path.join(lm_dir, "lm_meta.json")) as f:
            self.meta = json.load(f)


def phrase_suggest_lm(
    lm: PrebuiltLM,
    query: str,
    max_edits: int = 2,
    prefix_length: int = 1,
    per_slot: int = 5,
    k: int = 3,
    alpha: float = 0.5,
    p_error: float = 0.1,
) -> DataFrame:
    """phrase_suggest against a PrebuiltLM: identical scoring, zero
    corpus passes (candidate scan over the uni table + count joins)."""
    totals = lm.uni.sparkSession.createDataFrame(
        [(lm.meta["tt"], lm.meta["vsz"])], "tt long, vsz long"
    )
    return _suggest_over(
        lm.uni, lm.bi, totals, query, max_edits, prefix_length,
        per_slot, k, alpha, p_error,
    )
