"""Index configuration — flag-parity with the reference CLI.

Reference flag surface: /root/reference/cmd/esbulk/main.go:37-62 and
run.go:109-135 (validation/defaults). Flags that configure Elasticsearch
transport (servers, auth, TLS) have no analog here; flags that configure
the *pipeline* map directly:

  -index       -> IndexConfig.index_dir (the table set we create)
  -purge       -> overwrite (DROP-and-recreate, run.go:160-165)
  -id a.b,c    -> id_spec (sources/ndjson.py extraction) / id_col
  -optype      -> operators/optype.py MERGE semantics
  -skipbroken  -> sources/ndjson.py skip_broken
  -size        -> Arrow maxRecordsPerBatch (session.py)
  -w           -> parallelism (local[N] / shuffle partitions)
  -mapping/-c  -> analyzer/index spec persisted in stats.json
  -p pipeline  -> IndexConfig.pipeline (a named DataFrame transform
                  applied before tokenization, indexing.go:270-272)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, asdict, field
from typing import Callable, Optional

from esbulk_spark import K1, B
from esbulk_spark.functions.analyzer import ANALYZER_VERSION


@dataclass
class IndexConfig:
    index_dir: str
    # identity: use an existing unique long column, or assign dense ids
    # over the total order of sort_keys (operators/docids.py)
    id_col: Optional[str] = None
    sort_keys: tuple[str, ...] = ("repo", "path", "commit")
    text_col: str = "content"

    # physical layout
    n_buckets: int = 32          # term-hash partitions (dictionary/postings)
    n_shards: Optional[int] = None  # doc-range shards; default from target
    target_shard_docs: int = 4_000_000  # at 10^12 docs -> ~250k shards,
                                        # bounding any (term, shard) group
                                        # (even a stopword) to ~4M postings
    chunk_cap: int = 1 << 17     # max postings per stored chunk row
    block_size: int = 128        # postings per skip block

    # scoring
    k1: float = K1
    b: float = B

    # behavior parity
    overwrite: bool = True       # esbulk -purge
    store_content: bool = True   # keep content in docs table for _source
                                 # serving; False = sha-only docs table
                                 # (the 10^12-file mode: content stays in
                                 # the source table, postings read it
                                 # from there)
    pipeline: Optional[Callable] = None  # esbulk -p: pre-tokenize transform
    analyzer: str = ANALYZER_VERSION

    # positional index (opt-in): write a positions table (term, doc_id,
    # positions over the ANALYZED token stream), bucket-partitioned like
    # the postings, enabling phrase queries (reader.search_phrase).
    # Parquet's own columnar encoding handles the int arrays — no custom
    # codec; the read is bucket+term pruned exactly like postings.
    store_positions: bool = False

    # large-build plan: split the corpus into N contiguous doc-id waves,
    # build each wave as an independent segment index (per-wave token
    # shuffle covers only its slice), then metadata-refresh merge
    # (operators/merge.py). The regime where a single global (term,
    # shard) token shuffle is too big — shuffle volume per wave drops
    # N-fold and the merge moves index-sized data only. None/0 = the
    # single-pass build.
    segmented: Optional[int] = None

    def fingerprint(self, input_sig: str) -> str:
        d = asdict(self)
        d.pop("pipeline", None)
        d.pop("overwrite", None)
        d["input_sig"] = input_sig
        return hashlib.sha256(json.dumps(d, sort_keys=True, default=str).encode()).hexdigest()[:16]
