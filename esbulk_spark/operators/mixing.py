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
