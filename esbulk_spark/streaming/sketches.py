"""Streaming sketch maintenance: approximate distinct counts and
frequencies over an unbounded stream.

The merge property of the sketches in operators/sketch.py (HLL: union +
re-max; CMS: union + sum) makes streaming maintenance trivial and
exactly-once: each micro-batch writes its OWN sketch segment named by
batch_id (a replayed batch finds the directory complete and skips — the
same idempotence contract as streaming/incremental.py), and the current
sketch/estimate is the lazy merge of all segments. No read-modify-write
state, no lost updates on crash, and compaction is optional (merge N
segments into one) because the estimate is identical either way —
sketch-of-union == merge-of-sketches, pytest-pinned in test_sketch.py.

At scale each segment is <= m (HLL) or d*w (CMS) rows per group: a day
of micro-batches over 100 TB of events still merges in milliseconds."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (callers' exprs)

from esbulk_spark.operators import sketch as S


class StreamingSketch:
    """foreachBatch sink maintaining an HLL or CMS sketch on disk."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        value_col: str,
        group_cols: list[str],
        kind: str = "hll",
        p: int = 10,
        d: int = 4,
        w: int = 4096,
    ):
        if kind not in ("hll", "cms"):
            raise ValueError("kind must be 'hll' or 'cms'")
        self.spark = spark
        self.base_dir = base_dir
        self.value_col = value_col
        self.group_cols = list(group_cols)
        self.kind = kind
        self.p, self.d, self.w = p, d, w
        os.makedirs(base_dir, exist_ok=True)

    def _seg_dir(self, batch_id: int) -> str:
        return os.path.join(self.base_dir, f"sk_{batch_id}")

    def _seg_dirs(self) -> list[str]:
        return sorted(
            os.path.join(self.base_dir, n)
            for n in os.listdir(self.base_dir)
            if n.startswith("sk_")
            and os.path.exists(os.path.join(self.base_dir, n, "_SUCCESS"))
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Idempotent per batch_id: a completed segment is never
        rewritten (checkpoint-replay safety)."""
        seg = self._seg_dir(batch_id)
        if os.path.exists(os.path.join(seg, "_SUCCESS")):
            return
        if self.kind == "hll":
            sk = S.hll_sketch(batch_df, self.value_col, self.group_cols, self.p)
        else:
            sk = S.cms_sketch(
                batch_df, self.value_col, self.group_cols, self.d, self.w
            )
        sk.write.mode("overwrite").parquet(seg)

    def sketch(self) -> DataFrame:
        dirs = self._seg_dirs()
        if not dirs:
            raise FileNotFoundError(f"no sketch segments under {self.base_dir}")
        parts = [self.spark.read.parquet(d) for d in dirs]
        merge = S.hll_merge if self.kind == "hll" else S.cms_merge
        return merge(*parts)

    def estimate(self, candidates: DataFrame | None = None) -> DataFrame:
        """HLL: per-group cardinality estimates. CMS: point-frequency
        estimates for `candidates` (required)."""
        if self.kind == "hll":
            return S.hll_estimate(self.sketch(), self.group_cols, self.p)
        if candidates is None:
            raise ValueError("cms estimate needs a candidates DataFrame")
        return S.cms_estimate(
            self.sketch(), candidates, self.value_col, self.d, self.w,
            group_cols=self.group_cols,
        )
