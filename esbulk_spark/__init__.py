"""esbulk_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch re-expression of the capabilities of miku/esbulk
(reference: /root/reference, a Go bulk-indexer that delegates the actual
full-text machinery to Elasticsearch). This engine internalizes that
contract: it builds the inverted index itself (term-partitioned,
delta+varint-compressed posting lists with per-block max-score metadata,
doc-range shards, segment merge) and serves BM25 (k1=1.2, b=0.75) top-k
queries with block-max-WAND pruning, rank-identical to a full-scan oracle.

Layout:
    functions/  analyzer (code-aware tokenizer), codec (delta+varint),
                text statistics, json helpers
    operators/  doc-id assignment, postings build, segment merge,
                op-type MERGE semantics, dedup, similarity, multimodal
    sources/    NDJSON/stdin-style source with esbulk flag parity,
                table IO (parquet dirs; Iceberg when available)
    plans/      index build driver, BM25 full-scan oracle, block-max
                WAND executor, checkpoint/resume manifest
    streaming/  incremental index maintenance (Structured Streaming)
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
