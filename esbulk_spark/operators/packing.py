"""Training-sequence packing (concat-and-chunk, GPT-style pretraining).

A 100 TB training pipeline's last mile: documents are tokenized,
concatenated in a deterministic order, and cut into fixed-size training
sequences (budget tokens each); a document may straddle a sequence
boundary (standard causal-LM packing — Brown et al. 2020 "Language
Models are Few-Shot Learners" §2.3 describes exactly this layout).
This operator computes each document's placement in that global token
stream WITHOUT materializing the stream: per-doc token counts + an
exclusive prefix sum give (start offset, first/last sequence id,
offset within the first sequence).

Scale design: the prefix sum is the same two-pass pattern as doc-id
assignment (operators/docids.py) — a global ``sum() OVER (ORDER BY
...)`` window collapses to ONE reducer and is fatal at 10^12 rows, so
instead:

  1. range-repartition (doc_id) + sort within partitions;
  2. one tiny job: per-partition token-count sums -> driver-side
     exclusive prefix offsets (one row per partition, metadata);
  3. per-PARTITION window cumsum (parallel — partitionBy(pid) keeps
     every partition independent) + broadcast offset join.

Cost: one range shuffle of (doc_id, n_tok) pairs — 12 bytes/doc, not
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark import StorageLevel

from esbulk_spark.functions.analyzer import tokens_col


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    num_partitions: int | None = None,
) -> DataFrame:
    """pack_sequences_pinned without the cache handle — convenient for
    one-shot use; a pipeline calling this repeatedly should use the
    pinned variant and ``unpersist()`` after materializing, or the
    per-call MEMORY_AND_DISK intermediates accumulate for the session
    (same contract as docids.assign_doc_ids_pinned)."""
    return pack_sequences_pinned(df, text_col, id_col, budget, num_partitions)[0]


def pack_sequences_pinned(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Assign each document its slice of the packed training stream;
    returns (result, pinned) where ``pinned`` is the internally
    persisted range-partitioned (id, n_tok) DataFrame the result plan
    depends on — callers unpersist exactly that cache once the result
    is materialized.

    Documents are ordered by ``id_col`` (must be unique), tokenized with
    the standard analyzer, and conceptually concatenated; sequences are
    consecutive ``budget``-token windows of that stream. Returns one row
    per document:

      (id_col, n_tok, start, seq_first, seq_last, off_in_seq)

    - ``start``: exclusive prefix sum of token counts (global offset);
    - ``seq_first`` / ``seq_last``: ids of the sequences holding the
      doc's first/last token (empty docs occupy no token: seq_last is
      pinned to seq_first so the row stays well-formed);
    - ``off_in_seq``: the doc's offset inside seq_first.

    The actual token materialization (one row per sequence with the
    gathered token ids) is a downstream ``groupBy(seq_id)`` over ranges
    this table defines; placement is the part that needs global
    coordination, and it moves 12 bytes per document.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    # NULL text -> 0 tokens (size() yields NULL under ANSI, -1 legacy)
    toks = df.select(
        F.col(id_col),
        F.greatest(
            F.coalesce(F.size(tokens_col(F.col(text_col))), F.lit(0)),
            F.lit(0),
        ).alias("n_tok"),
    )
    if num_partitions:
        parted = toks.repartitionByRange(num_partitions, id_col)
    else:
        parted = toks.repartitionByRange(id_col)
    parted = parted.sortWithinPartitions(id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # pass 1 (metadata job): per-partition token sums -> exclusive
    # prefix offsets on the driver, one row per partition
    counts = (
        parted.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.sum("n_tok").alias("toksum"))
        .collect()
    )
    by_pid = {r["__pid"]: int(r["toksum"] or 0) for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "__pid int, __offset long",
    )
    # pass 2: per-partition cumsum (parallel — every partition is an
    # independent window) + the broadcast partition offset
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (
        F.col("__offset")
        + F.sum("n_tok").over(w)
        - F.col("n_tok")
    ).cast("long")
    out = (
        parted.withColumn("__pid", F.spark_partition_id())
        .join(F.broadcast(offset_df), "__pid")
        .withColumn("start", start)
        .withColumn(
            "seq_first", F.floor(F.col("start") / budget).cast("long")
        )
        .withColumn(
            "seq_last",
            F.floor(
                (F.col("start") + F.greatest(F.col("n_tok"), F.lit(1)) - 1)
                / budget
            ).cast("long"),
        )
        .withColumn("off_in_seq", (F.col("start") % budget).cast("long"))
        .select(id_col, "n_tok", "start", "seq_first", "seq_last", "off_in_seq")
    )
    return out, parted
