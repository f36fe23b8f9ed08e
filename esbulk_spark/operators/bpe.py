"""Distributed BPE (byte-pair-encoding) vocabulary training.

Tokenizer training is the step a large-scale training-data pipeline runs
right after dedup/quality filtering — and the classic Sennrich BPE
algorithm is exactly map-reduce shaped: it never needs the corpus, only
the WORD-FREQUENCY table (distinct words with counts), which is many
orders of magnitude smaller than 100 TB of text. The Spark plan:

  1. one corpus pass: whitespace words -> hash-agg word counts
     (map-side partial agg; the only stage that touches the corpus);
  2. per merge iteration over the persisted words table:
     a. adjacent symbol pairs via zip_with over shifted slices (JVM),
        explode -> hash-agg weighted pair counts -> driver argmax
        (count desc, then lexicographic pair — the determinism contract);
     b. apply the merge to every word's symbol array with a single
        aggregate() fold (greedy leftmost-first, the BPE contract).

Each iteration is one tiny agg + one narrow transform of the words
table; lineage is cut periodically (localCheckpoint) so 10k-merge
vocabularies don't accumulate a 10k-deep plan. No Python touches
per-word data — the fold and pair extraction are Catalyst HOFs.

Reference semantics: Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units" (ACL 2016) — the public
BPE algorithm; words end with an explicit </w> symbol. Verified against
an independent pure-Python implementation (bpe_train_local below) in
tests and in the graded entry's oracle.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker (Sennrich BPE)

_CHECKPOINT_EVERY = 16  # cut fold-transform lineage periodically


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over whitespace-split words, blanks dropped — the
    only corpus-sized pass of BPE training."""
    w = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    return (
        df.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(wf: DataFrame) -> DataFrame:
    """word -> (syms array<string>, cnt): characters + </w>."""
    return wf.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
        "cnt",
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """(left, right, total) adjacent-pair counts weighted by word count.
    Pairs come from zip_with over the two shifted slices of each symbol
    array — all JVM, no explode of characters, only of pairs."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice(F.col("syms"), F.lit(1), n - 1),
        F.slice(F.col("syms"), F.lit(2), n - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        syms.filter(n >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("cnt").alias("total"))
    )


def _apply_merge(syms_col, left: str, right: str, merged: str):
    """Greedy leftmost-first merge of (left, right) -> merged inside one
    symbol array, as a single aggregate() fold: append each symbol,
    except when the accumulator's tail is `left` and the symbol is
    `right` — then replace the tail with the merged symbol. After a
    replacement the tail IS the merged string, which cannot equal
    `left` again (merged = left+right, right non-empty), so merges
    never overlap — the BPE contract."""
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _triple_bounds(syms: DataFrame, cand: list) -> dict:
    """For each candidate pair (l, r): the max weighted count over
    adjacent TRIPLES (u, l, r) and (l, r, v) — an exact upper bound on
    any single pair that merging (l, r) -> lr can create, since every
    created (u, lr) adjacency consumes one (u, l, r) triple and every
    (lr, v) one (l, r, v). One filtered hash-agg over the words table;
    the filter keeps only triples whose first or last bigram is a
    candidate, so the agg output is candidate-sized."""
    n = F.size("syms")
    t12 = F.zip_with(
        F.slice(F.col("syms"), F.lit(1), n - 2),
        F.slice(F.col("syms"), F.lit(2), n - 2),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    tri = F.zip_with(
        t12,
        F.slice(F.col("syms"), F.lit(3), n - 2),
        lambda p, c: F.struct(
            p["a"].alias("a"), p["b"].alias("b"), c.alias("c")
        ),
    )
    sep = "\x00"
    keys = [r["left"] + sep + r["right"] for r in cand]
    k12 = F.concat_ws(sep, F.col("t.a"), F.col("t.b"))
    k23 = F.concat_ws(sep, F.col("t.b"), F.col("t.c"))
    exploded = (
        syms.filter(n >= 3)
        .select("cnt", F.explode(tri).alias("t"))
        .filter(k12.isin(keys) | k23.isin(keys))
        .groupBy(F.col("t.a").alias("a"), F.col("t.b").alias("b"),
                 F.col("t.c").alias("c"))
        .agg(F.sum("cnt").alias("total"))
    )
    bounds = {k: 0 for k in keys}
    for row in exploded.collect():
        t = int(row["total"])
        for key in (row["a"] + sep + row["b"], row["b"] + sep + row["c"]):
            if key in bounds:
                bounds[key] = max(bounds[key], t)
    return {
        (r["left"], r["right"]): bounds[r["left"] + sep + r["right"]]
        for r in cand
    }


def _admit_batch(
    snapshot: list, bounds: dict, batch: int, min_freq: int
) -> list:
    """Select a PREFIX of the (count desc, lex asc)-ordered pair
    snapshot that is provably order-equivalent to running the merges
    one at a time. Merging (a, b) -> ab changes the count of exactly
    three old-pair families — (u, a), (b, v), (a, b), all decreases —
    and creates pairs (u, ab) / (ab, v) bounded by the triple counts
    in ``bounds``. So candidate j = (l, r) is admitted while:

    - it is UNAFFECTED by every earlier admitted merge i: r != l_i and
      l != r_i (and neither symbol string-equals a created merged_i) —
      its snapshot count is still exact. We STOP at the first affected
      candidate rather than skip it: its decreased count might still
      win its sequential round, which only the next full recount can
      decide;
    - its count strictly exceeds ub_new, the running max of the
      admitted merges' created-pair bounds, so no created pair can
      out-rank it (ties lose to creation order uncertainty, hence
      strict).

    Old pairs ranked behind j only keep or lower their counts and
    already lose the (count, lex) tie-break, so at every step inside
    the batch the true sequential argmax IS the next admitted
    candidate: batched == sequential, merge for merge."""
    admitted: list = []
    lefts: set[str] = set()
    rights: set[str] = set()
    created: set[str] = set()
    ub_new = 0
    for row in snapshot:
        total = int(row["total"])
        if total < min_freq:
            break
        if admitted and total <= ub_new:
            break
        left, right = row["left"], row["right"]
        if (
            right in lefts
            or left in rights
            or left in created
            or right in created
        ):
            break
        admitted.append(row)
        if len(admitted) >= batch:
            break
        lefts.add(left)
        rights.add(right)
        created.add(left + right)
        ub_new = max(ub_new, bounds.get((left, right), total))
    return admitted


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    min_freq: int = 2,
    batch: int = 8,
) -> list[dict]:
    """Train a BPE merge table over ``df[text_col]``.

    Returns the ordered merge list: [{iteration, left, right, merged,
    pair_count}]. Deterministic: argmax ties break lexicographically on
    (left, right). Stops early when no pair reaches ``min_freq``.

    Each ROUND is one Spark pair-count aggregation from which up to
    ``batch`` merges are admitted (see _admit_batch — the admitted
    prefix is provably identical to the one-merge-at-a-time sequence),
    so a 32k-merge production vocabulary costs ~32k/batch job rounds
    instead of 32k. ``batch=1`` recovers the classic loop exactly."""
    from pyspark import StorageLevel

    if batch < 1:
        raise ValueError("batch must be >= 1")
    wf = word_counts(df, text_col)
    syms = _initial_symbols(wf).persist(StorageLevel.MEMORY_AND_DISK)
    merges: list[dict] = []
    prev = syms
    done = 0
    try:
        while len(merges) < n_merges:
            want = min(batch, n_merges - len(merges))
            snapshot = (
                _pair_counts(prev)
                .orderBy(F.desc("total"), F.asc("left"), F.asc("right"))
                .limit(max(16, 2 * want))
                .collect()
            )
            # admission scans at most want+1 snapshot rows, so triple
            # bounds (the second, candidate-sized agg of the round) are
            # only needed for that prefix
            bounds = (
                _triple_bounds(prev, snapshot[: want + 1])
                if want > 1 and snapshot
                else {}
            )
            admitted = _admit_batch(snapshot, bounds, want, min_freq)
            if not admitted:
                break
            col = F.col("syms")
            for row in admitted:
                left, right = row["left"], row["right"]
                merged = left + right
                merges.append(
                    {
                        "iteration": len(merges),
                        "left": left,
                        "right": right,
                        "merged": merged,
                        "pair_count": int(row["total"]),
                    }
                )
                col = _apply_merge(col, left, right, merged)
            nxt = prev.select(col.alias("syms"), "cnt")
            done += len(admitted)
            if done >= _CHECKPOINT_EVERY:
                # cut the fold-transform lineage; eager so the old cache
                # can drop immediately
                nxt = nxt.localCheckpoint(eager=True)
                done = 0
            else:
                nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            prev.unpersist()
            prev = nxt
    finally:
        prev.unpersist()
    return merges


def apply_bpe(
    df: DataFrame, text_col: str, merges: list[dict], out_col: str = "bpe_tokens"
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: split to words,
    then chars + </w>, then replay the merges in training order (the
    standard BPE encoder). All Catalyst HOFs — the merge list becomes a
    chain of aggregate() folds over each word's symbol array."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    word_syms = F.transform(
        F.filter(words, lambda w: w != ""),
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW))),
    )
    out = df.withColumn("__ws", word_syms)
    col = F.col("__ws")

    def merge_step(m):
        # closure factory, NOT a default arg: Spark derives HOF arity
        # from the lambda signature, so a bound default would turn this
        # into the (element, index) form
        return lambda syms: _apply_merge(syms, m["left"], m["right"], m["merged"])

    for m in merges:
        col = F.transform(col, merge_step(m))
    return out.withColumn(out_col, F.flatten(col)).drop("__ws")


# ------------------------------------------------------------------
# Independent reference implementation (pure Python) — the oracle for
# tests and the graded entry. Same algorithm, same determinism contract,
# zero shared code with the Spark path.
# ------------------------------------------------------------------


def local_word_counts(texts: list[str]) -> dict[str, int]:
    c: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                c[w] += 1
    return dict(c)


def bpe_train_local(
    wcounts: dict[str, int], n_merges: int = 50, min_freq: int = 2
) -> list[dict]:
    """Pure-Python Sennrich BPE over a word-frequency dict."""
    vocab = {tuple(list(w) + [EOW]): c for w, c in wcounts.items()}
    merges: list[dict] = []
    for it in range(n_merges):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for j in range(len(syms) - 1):
                pc[(syms[j], syms[j + 1])] += c
        if not pc:
            break
        (left, right), total = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if total < min_freq:
            break
        merged = left + right
        merges.append(
            {
                "iteration": it,
                "left": left,
                "right": right,
                "merged": merged,
                "pair_count": int(total),
            }
        )
        nv = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges
