"""Command-line surface with esbulk flag parity (SURVEY.md §3.1).

Reference CLI: /root/reference/cmd/esbulk/main.go:37-62. Transport flags
(servers, auth, TLS) have no analog — the "server" is the index table
set on the filesystem/catalog. Everything pipeline-shaped maps 1:1:

  esbulk -index I -purge -id a.b,c -optype index -size N -w W file.ldj
  ->
  python -m esbulk_spark.cli index --index-dir I [--purge/--no-purge]
      --id-spec a.b,c --optype index --batch-size N -w W --input file.ldj

Plus query/search/merge subcommands the reference exercises through its
integration tests' `_search` calls (run_test.go:300-320).
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("-w", "--workers", type=int, default=None,
                   help="parallelism (esbulk -w; local[N] cores)")
    p.add_argument("--batch-size", type=int, default=10000,
                   help="Arrow batch size (esbulk -size)")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="esbulk-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_index = sub.add_parser("index", help="build the inverted index")
    p_index.add_argument("--input", required=True,
                         help="parquet dir (corpus table) or .jsonl/.ldj file")
    p_index.add_argument("--index-dir", required=True, help="esbulk -index")
    p_index.add_argument("--purge", action=argparse.BooleanOptionalAction,
                         default=False, help="esbulk -purge (drop + recreate)")
    p_index.add_argument("--id-spec", default=None,
                         help="esbulk -id: NDJSON id field spec (a.b,c)")
    p_index.add_argument("--id-col", default=None,
                         help="existing unique long column to use as doc_id")
    p_index.add_argument("--text-col", default="content")
    p_index.add_argument("--sort-keys", default="repo,path,commit")
    p_index.add_argument("--skip-broken", action="store_true",
                         help="esbulk -skipbroken (NDJSON input only)")
    p_index.add_argument("--optype", choices=["index", "create", "update"],
                         default="index", help="esbulk -optype")
    p_index.add_argument("--n-buckets", type=int, default=32)
    p_index.add_argument("--n-shards", type=int, default=None)
    _add_common(p_index)

    p_search = sub.add_parser("search", help="BM25 top-k query")
    p_search.add_argument("--index-dir", required=True)
    p_search.add_argument("--query", required=True)
    p_search.add_argument("-k", type=int, default=10)
    p_search.add_argument("--mode", choices=["wand", "fullscan", "and"], default="wand")
    _add_common(p_search)

    p_merge = sub.add_parser("merge", help="merge segment indexes")
    p_merge.add_argument("--segments", required=True, help="comma-separated index dirs")
    p_merge.add_argument("--index-dir", required=True)
    p_merge.add_argument("--n-buckets", type=int, default=32)
    p_merge.add_argument("--n-shards", type=int, default=None)
    _add_common(p_merge)

    args = ap.parse_args(argv)

    from esbulk_spark.session import get_spark

    spark = get_spark(app_name=f"esbulk-{args.cmd}", cpus=args.workers)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(args.batch_size)
    )

    try:
        if args.cmd == "index":
            rc = _cmd_index(spark, args)
        elif args.cmd == "search":
            rc = _cmd_search(spark, args)
        else:
            rc = _cmd_merge(spark, args)
    finally:
        spark.stop()
    return rc


def _load_input(spark, args):
    from esbulk_spark.sources import ndjson

    if args.input.endswith((".jsonl", ".ldj", ".json", ".ndjson", ".gz")):
        lines = ndjson.drop_blank(ndjson.read_ndjson_lines(spark, args.input))
        if args.skip_broken:
            lines = ndjson.skip_broken(lines)
        if args.id_spec:
            lines = ndjson.extract_id(lines, args.id_spec, out_col="_doc_key")
        return lines.withColumnRenamed("value", args.text_col), True
    return spark.read.parquet(args.input), False


def _cmd_index(spark, args) -> int:
    import time

    from esbulk_spark.config import IndexConfig
    from esbulk_spark.plans.build import build_index

    docs, is_ndjson = _load_input(spark, args)
    cfg = IndexConfig(
        index_dir=args.index_dir,
        id_col=args.id_col,
        sort_keys=tuple(args.sort_keys.split(",")) if not is_ndjson else (args.text_col,),
        text_col=args.text_col,
        n_buckets=args.n_buckets,
        n_shards=args.n_shards,
        overwrite=args.purge,
    )
    t0 = time.monotonic()
    stats = build_index(spark, docs, cfg, input_sig=args.input)
    dt = time.monotonic() - t0
    # esbulk's throughput epilogue (run.go:358-365)
    rate = stats["n_docs"] / dt if dt else 0.0
    print(
        f"{stats['n_docs']} docs in {dt:.1f}s at {rate:.1f} docs/s "
        f"({stats['total_postings']} postings)",
        file=sys.stderr,
    )
    print(json.dumps(stats))
    return 0


def _cmd_search(spark, args) -> int:
    from esbulk_spark.plans.reader import IndexReader

    r = IndexReader(spark, args.index_dir)
    if args.mode == "and":
        df = r.search_and(args.query, k=args.k)
    else:
        df = r.search(args.query, k=args.k, prune=(args.mode == "wand"))
    rows = df.collect()
    for rank, row in enumerate(rows, 1):
        print(json.dumps({"rank": rank, "doc_id": row.doc_id, "score": row.score}))
    print(f"{len(rows)} hits", file=sys.stderr)
    return 0


def _cmd_merge(spark, args) -> int:
    from esbulk_spark.config import IndexConfig
    from esbulk_spark.operators.merge import merge_segments

    cfg = IndexConfig(
        index_dir=args.index_dir,
        id_col="doc_id",
        n_buckets=args.n_buckets,
        n_shards=args.n_shards,
    )
    stats = merge_segments(spark, args.segments.split(","), cfg)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
