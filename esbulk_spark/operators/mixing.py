"""Deterministic data-mixture sampling (per-source sampling rates).

Training pipelines mix sources at tuned rates ("sample web at 30%,
wiki at 3 epochs worth, code at 100%") — the public practice from the
GPT-3 / Pile / Llama dataset mixture tables. At 100 TB the sampler must
be a pure per-row decision: no shuffle, no global state, reproducible
across reruns and resume boundaries. This one keys the keep/drop coin
on a hash of the stable document id, so the SAME rows survive on every
run, on any partitioning, and membership can be audited after the fact
(rate changes re-flip only the affected margin, not the whole sample —
the "salting" property systematic-sampling literature calls permanent
random numbers, public survey-sampling technique).

``spark.sample()``/``sampleBy()`` are NOT that: seeded per-partition
RNGs change membership whenever partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esbulk_spark.operators.dedup import md5_int

# keep-decision resolution: u in [0, 1e6) compared against rate * 1e6.
# Rates are honored to 6 decimal places — plenty for mixture weights.
_RESOLUTION = 1_000_000


def mixture_hash(id_col, salt: str = "mix") -> "F.Column":
    """Permanent random number u in [0, _RESOLUTION) for a doc id:
    md5 of 'id:salt' (md5_int is the repo's cross-engine hash — the
    DuckDB oracle computes the identical value)."""
    return F.pmod(
        md5_int(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
        F.lit(_RESOLUTION),
    )


def sample_mixture(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Keep each row with its source's probability, deterministically:
    row survives iff hash(id) < rate(source) * resolution. Pure
    Catalyst per-row filter — no shuffle, no RNG state, identical
    output for any partitioning or rerun. Keys absent from ``rates``
    use ``default_rate``; rate 0 drops the source, rate 1 keeps it
    whole. Rates outside [0, 1] are rejected (upsampling is the
    packer's job, not the sampler's)."""
    for k, r in list(rates.items()) + [("default", default_rate)]:
        if not (0.0 <= float(r) <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0, 1]: {r}")
    rate = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(key_col) == key, F.lit(float(r))).otherwise(rate)
    u = mixture_hash(id_col, salt)
    return df.filter(u < rate * _RESOLUTION)


def _hashed_ngram_buckets(df: DataFrame, text_col: str, id_col, n_buckets: int):
    """(id, bucket, c) hashed unigram+bigram bag per doc — the DSIR
    feature map. Tokens are lowercased whitespace words (the repo's LM
    tokenization); n-grams hash through md5_int so the DuckDB oracle
    reproduces the buckets exactly."""
    from esbulk_spark.operators.textstats import _bigram_pairs, _ws_words

    toks = df.select(
        F.col(id_col).alias("id"), _ws_words(text_col).alias("w")
    ).filter(F.size("w") >= 1)
    uni = toks.select("id", F.explode("w").alias("g"))
    bi = (
        toks.filter(F.size("w") >= 2)
        .select("id", F.explode(_bigram_pairs()).alias("p"))
        .select("id", F.concat_ws(" ", "p.w1", "p.w2").alias("g"))
    )
    return (
        uni.unionByName(bi)
        .select("id", F.pmod(md5_int(F.col("g")), F.lit(n_buckets)).alias("b"))
        .groupBy("id", "b")
        .agg(F.count("*").alias("c"))
    )


def dsir_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1024,
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", public): estimate
    log w(x) = log p_target(x) - log p_raw(x) under hashed-n-gram
    bag-of-words models (unigrams + bigrams -> n_buckets via the
    cross-engine md5 hash, add-1 smoothing). Selection keeps the
    highest-weight raw docs (the paper resamples with Gumbel noise; the
    deterministic top-k variant is what a reproducible pipeline grades).

    Returns (id, n_grams, log_weight) for every raw doc with >= 1 token.

    Scale shape: the two models are B-row aggregates (B = n_buckets,
    constant) — they and the one-row totals broadcast to the scoring
    join, so nothing shuffles at corpus width except the feature
    hash-aggs and the final groupBy(id) (the output itself). The raw
    feature table feeds both r_model and the scoring join; at 100 TB
    persist/checkpoint it (or pass a precomputed table) so the corpus
    tokenizes once — the lazy plan recomputes branches."""
    # the raw feature table feeds r_model, the totals and the scoring
    # join; the lazy plan would tokenize + md5-hash the corpus once per
    # branch (3x) — persist it so the corpus featurizes ONCE (guide §5:
    # reuse > recompute; this is the docstring's own 100-TB advice,
    # applied). The two B-row models persist too: each is referenced by
    # its totals agg and again by the broadcast scoring join.
    feats = _hashed_ngram_buckets(raw_df, text_col, id_col, n_buckets).persist()
    if target_ids is not None:
        # DSIR's usual shape: target = a selected SUBSET of the raw
        # corpus (the paper's trusted slice). Its model is then a plain
        # re-aggregation of the already-persisted raw features — no
        # second tokenize+md5 pass over the target text (the md5 hash
        # is the measured cost of this operator: ~9 s per pass at 50k
        # docs x ~600 grams). `target_ids` must be (id) rows drawn from
        # raw_df's ids; target_df is ignored in this mode.
        t_model = (
            feats.join(
                F.broadcast(target_ids.select(F.col(target_ids.columns[0]).alias("id"))),
                ["id"],
                "semi",
            )
            .groupBy("b")
            .agg(F.sum("c").alias("ct"))
            .persist()
        )
    else:
        t_model = (
            _hashed_ngram_buckets(target_df, text_col, id_col, n_buckets)
            .groupBy("b")
            .agg(F.sum("c").alias("ct"))
            .persist()
        )
    r_model = feats.groupBy("b").agg(F.sum("c").alias("cr")).persist()
    totals = t_model.agg(F.sum("ct").alias("tt")).crossJoin(
        r_model.agg(F.sum("cr").alias("tr"))
    )  # one row -> broadcast

    lp_t = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
        / (F.col("tt") + F.lit(float(n_buckets)))
    )
    lp_r = F.log(
        (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1.0))
        / (F.col("tr") + F.lit(float(n_buckets)))
    )
    return (
        feats.join(F.broadcast(t_model), ["b"], "left")
        .join(F.broadcast(r_model), ["b"], "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * (lp_t - lp_r)).alias("log_weight"),
        )
    )
