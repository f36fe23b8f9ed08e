"""Block-max pruned BM25 top-k scoring (SURVEY.md B8-B11).

The reference's tests assert on Elasticsearch `_score`/`max_score`
(/root/reference/run_test.go:416-465); the engine behind those numbers is
Lucene's BM25 + block-max WAND (Ding & Suel 2011). Here the same pruning
idea is re-expressed in a *vectorized, shard-parallel* form that fits
Spark's execution model:

  * The index is doc-range sharded; one applyInPandas group = one
    (query, shard). Shards run as independent tasks across the cluster;
    a global top-k merge of the tiny per-shard winners finishes the job.
  * Within a group, candidate doc space is partitioned into ELEMENTARY
    RANGES — the refinement of all posting-block boundaries of the
    query's terms. Each range has an exact upper bound
        UB(range) = sum_t idf_t * block_max_tfnorm(covering block of t)
    computed from block metadata only (nothing decoded yet).
  * Ranges are processed in UB-descending batches; docs in a batch are
    exact-scored (vectorized decode + bincount-accumulate), the running
    threshold theta = k-th best score rises, and processing stops when
    the next range's UB < theta. Every skipped range provably contains
    no top-k doc: per term, score_t = idf*tfnorm <= idf*block_max_tfnorm
    (IEEE multiply and add are monotone), so exact <= UB holds in float,
    not just in math — pruning is exact, giving rank-identical results
    vs the full-scan oracle. Ties: ranges with UB == theta are still
    processed, so equal-score/smaller-doc_id winners are never lost.

This is block-max WAND's skipping logic reorganized from a doc-at-a-time
cursor walk (pointer-chasing, per-doc Python cost) into a range-at-a-time
vectorized sweep — same bounds, same skips, numpy throughput.

``prune=False`` decodes and scores everything — the index-backed
full-scan oracle; tests assert it matches both the pruned path and the
raw-corpus DataFrame oracle (plans/score.py).
"""

from __future__ import annotations

import numpy as np

from esbulk_spark.functions.codec import varint_decode, delta_decode

RESULT_SCHEMA = "qid string, shard int, doc_id long, score double"

# score_group groups at or under this many postings take the dense
# decode-all path instead of the elementary-range WAND sweep
DENSE_GROUP_MAX = 1 << 19


def idf(df: int | np.ndarray, n_docs: int) -> float | np.ndarray:
    """Lucene BM25 idf (public formula): ln(1 + (N - df + .5)/(df + .5))."""
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def not_in_sorted(ids: np.ndarray, excl: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: True where ``ids`` is NOT in the sorted int64
    array ``excl`` (vectorized searchsorted membership — the tombstone
    filter for soft-deleted docs)."""
    pos = np.searchsorted(excl, ids)
    inb = pos < excl.size
    hit = np.zeros(ids.size, dtype=bool)
    hit[inb] = excl[pos[inb]] == ids[inb]
    return ~hit


class _TermCursor:
    """Decoded-on-demand view over one term's chunk rows within a shard."""

    # chunks at or under this many postings decode WHOLE on first touch
    # (3 vectorized varint calls amortized over every later block hit);
    # bigger chunks keep per-block skip-decode, where WAND selectivity
    # pays for the per-call overhead. 32k ≈ 4 ms full decode.
    FULL_DECODE_MAX = 1 << 15

    __slots__ = ("idf", "blk_start", "blk_end", "blk_ub", "blk_row", "blk_j",
                 "blk_n", "rows", "cache", "chunk_cache", "k1", "b", "avgdl",
                 "bs")

    def __init__(self, term_idf: float, rows: list, block_size: int,
                 k1: float, b: float, avgdl: float):
        # rows: list of pdf row tuples sorted by min_doc
        self.idf = term_idf
        self.rows = rows
        self.cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        self.chunk_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.bs = block_size
        starts, ends, ubs, rix, jix, ns = [], [], [], [], [], []
        for ri, r in enumerate(rows):
            block_last = np.asarray(r["block_last"], dtype=np.int64)
            bmax = np.asarray(r["block_max_tfnorm"], dtype=np.float64)
            nb = block_last.size
            s = np.empty(nb, dtype=np.int64)
            s[0] = r["min_doc"]
            s[1:] = block_last[:-1] + 1
            starts.append(s)
            ends.append(block_last)
            ubs.append(term_idf * bmax)
            rix.append(np.full(nb, ri, dtype=np.int64))
            jix.append(np.arange(nb, dtype=np.int64))
            n = int(r["n"])
            cnt = np.full(nb, block_size, dtype=np.int64)
            cnt[-1] = n - (nb - 1) * block_size
            ns.append(cnt)
        self.blk_start = np.concatenate(starts)
        self.blk_end = np.concatenate(ends)
        self.blk_ub = np.concatenate(ubs)
        self.blk_row = np.concatenate(rix)
        self.blk_j = np.concatenate(jix)
        self.blk_n = np.concatenate(ns)

    def _decode_chunk(self, ri: int) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, contribs) of ALL postings in chunk row ri; cached."""
        hit = self.chunk_cache.get(ri)
        if hit is not None:
            return hit
        r = self.rows[ri]
        n = int(r["n"])
        ids = delta_decode(varint_decode(r["blob_ids"], count=n)).astype(np.int64)
        tfs = varint_decode(r["blob_tfs"], count=n).astype(np.float64)
        dls = varint_decode(r["blob_dls"], count=n).astype(np.float64)
        tfn = (tfs * (self.k1 + 1.0)) / (
            tfs + self.k1 * (1.0 - self.b + self.b * (dls / self.avgdl))
        )
        out = (ids, self.idf * tfn)
        self.chunk_cache[ri] = out
        return out

    def decode(self, bi: int) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, contribs) of global block bi; cached."""
        key = (int(self.blk_row[bi]), int(self.blk_j[bi]))
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        r = self.rows[key[0]]
        j = key[1]
        if int(r["n"]) <= self.FULL_DECODE_MAX:
            ids, contrib = self._decode_chunk(key[0])
            s = j * self.bs
            e = s + int(self.blk_n[bi])
            out = (ids[s:e], contrib[s:e])
            self.cache[key] = out
            return out
        n_in = int(self.blk_n[bi])
        off_ids = r["off_ids"]
        base = int(r["block_last"][j - 1]) if j > 0 else 0
        ids = delta_decode(
            varint_decode(r["blob_ids"], offset=int(off_ids[j]), count=n_in),
            base=base,
        ).astype(np.int64)
        tfs = varint_decode(r["blob_tfs"], offset=int(r["off_tfs"][j]), count=n_in).astype(np.float64)
        dls = varint_decode(r["blob_dls"], offset=int(r["off_dls"][j]), count=n_in).astype(np.float64)
        tfn = (tfs * (self.k1 + 1.0)) / (tfs + self.k1 * (1.0 - self.b + self.b * (dls / self.avgdl)))
        contrib = self.idf * tfn
        out = (ids, contrib)
        self.cache[key] = out
        return out


def score_group(
    pdf,
    n_docs: int,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int,
    prune: bool = True,
    batch_ranges: int = 64,
    dense_max: int | None = None,
    exclude: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Score one (query, shard) group of postings-chunk rows.

    Per-term df rides in as a column (broadcast-joined from the
    dictionary); idf is computed here. Returns (top_doc_ids, top_scores),
    sorted by (score desc, doc_id asc), at most k entries.

    ``exclude`` (sorted int64 doc_ids) is the soft-delete tombstone set:
    excluded docs are masked out BEFORE top-k selection, so a deleted
    doc never occupies a winner slot (Lucene liveDocs semantics). Block
    upper bounds may still include deleted docs — they stay valid (just
    less tight) for the live docs, so pruning remains exact."""
    if exclude is not None and not exclude.size:
        exclude = None
    cursors: list[_TermCursor] = []
    for term, grp in pdf.groupby("term", sort=True):
        t_idf = float(idf(int(grp["df"].iloc[0]), n_docs))
        rows = [grp.iloc[i] for i in np.argsort(grp["min_doc"].values, kind="stable")]
        cursors.append(_TermCursor(t_idf, rows, block_size, k1, b, avgdl))
    if not cursors:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)

    # dense path for small groups: below ~half a million postings,
    # decoding everything (3 vectorized varint calls per chunk) and one
    # bincount beats the per-candidate-block WAND loop (~30 us of numpy
    # small-op overhead per block) — WAND's pruning only pays once the
    # group is large enough that skipped decode outweighs loop overhead.
    # Exact either way; rank-identity asserted in tests/test_rank_fuzz.
    total_n = sum(int(r["n"]) for c in cursors for r in c.rows)
    if total_n <= (DENSE_GROUP_MAX if dense_max is None else dense_max):
        ids_parts, contrib_parts = [], []
        for c in cursors:
            for ri in range(len(c.rows)):
                i_arr, c_arr = c._decode_chunk(ri)
                ids_parts.append(i_arr)
                contrib_parts.append(c_arr)
        all_ids = np.concatenate(ids_parts)
        all_contrib = np.concatenate(contrib_parts)
        if exclude is not None:
            keep = not_in_sorted(all_ids, exclude)
            all_ids, all_contrib = all_ids[keep], all_contrib[keep]
        u, inv = np.unique(all_ids, return_inverse=True)
        scores = np.bincount(inv, weights=all_contrib)
        sel = np.lexsort((u, -scores))[:k]
        return u[sel], scores[sel]

    # ---- elementary ranges via boundary events ----
    pos_list, delta_list = [], []
    for c in cursors:
        pos_list.append(c.blk_start)
        delta_list.append(c.blk_ub)
        pos_list.append(c.blk_end + 1)
        delta_list.append(-c.blk_ub)
    pos = np.concatenate(pos_list)
    dlt = np.concatenate(delta_list)
    order = np.argsort(pos, kind="stable")
    pos, dlt = pos[order], dlt[order]
    bounds, first_idx = np.unique(pos, return_index=True)
    # cumulative UB after all events at each unique boundary
    cum = np.cumsum(dlt)
    seg_ub = cum[np.append(first_idx[1:] - 1, dlt.size - 1)]
    # ranges: [bounds[i], bounds[i+1]-1] with ub seg_ub[i]; last bound ends all
    r_lo = bounds[:-1]
    r_hi = bounds[1:] - 1
    r_ub = seg_ub[:-1]
    live = r_ub > 1e-18  # ranges covered by no block have ub ~ 0
    r_lo, r_hi, r_ub = r_lo[live], r_hi[live], r_ub[live]

    ub_order = np.argsort(-r_ub, kind="stable")

    top_ids = np.zeros(0, dtype=np.int64)
    top_scores = np.zeros(0, dtype=np.float64)
    theta = -np.inf

    i = 0
    n_ranges = ub_order.size
    while i < n_ranges:
        take = ub_order[i: i + batch_ranges] if prune else ub_order
        if prune:
            take = take[r_ub[take] >= theta] if np.isfinite(theta) else take
            if take.size == 0:
                break
        lo_b, hi_b = r_lo[take], r_hi[take]
        sel = np.argsort(lo_b, kind="stable")
        lo_b, hi_b = lo_b[sel], hi_b[sel]

        ids_parts, contrib_parts = [], []
        for c in cursors:
            # blocks overlapping any selected range
            bi_cand = np.flatnonzero(
                (c.blk_start <= hi_b.max()) & (c.blk_end >= lo_b.min())
            )
            for bi in bi_cand:
                # quick reject: does block [s,e] overlap any selected range?
                s, e = c.blk_start[bi], c.blk_end[bi]
                j = np.searchsorted(lo_b, e, side="right") - 1
                if j < 0 or hi_b[j] < s:
                    # the range starting at or before e doesn't reach s; check
                    # whether any later range starts within [s, e]
                    j2 = np.searchsorted(lo_b, s, side="left")
                    if j2 >= lo_b.size or lo_b[j2] > e:
                        continue
                ids, contrib = c.decode(int(bi))
                # keep only postings whose doc lies in a selected range
                ridx = np.searchsorted(lo_b, ids, side="right") - 1
                ok = (ridx >= 0) & (ids <= hi_b[np.clip(ridx, 0, hi_b.size - 1)])
                if exclude is not None:
                    ok &= not_in_sorted(ids, exclude)
                if np.any(ok):
                    ids_parts.append(ids[ok])
                    contrib_parts.append(contrib[ok])
        if ids_parts:
            all_ids = np.concatenate(ids_parts)
            all_contrib = np.concatenate(contrib_parts)
            u, inv = np.unique(all_ids, return_inverse=True)
            scores = np.bincount(inv, weights=all_contrib)
            # merge into running top-k
            m_ids = np.concatenate([top_ids, u])
            m_scores = np.concatenate([top_scores, scores])
            sel2 = np.lexsort((m_ids, -m_scores))[:k]
            top_ids, top_scores = m_ids[sel2], m_scores[sel2]
            if prune and top_ids.size >= k:
                theta = top_scores[-1]
        if not prune:
            break
        i += batch_ranges
    return top_ids, top_scores


def make_group_scorer(
    n_docs: int,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int,
    prune: bool = True,
    dense_max: int | None = None,
    exclude_bc=None,
):
    """applyInPandas((qid, shard) group) -> top-k rows for that shard.
    ``exclude_bc``: optional Spark broadcast of the sorted tombstone
    doc_id array (one copy per executor, not per task)."""
    import pandas as pd

    def fn(key, pdf):
        qid, shard = key[0], int(key[1])
        ids, scores = score_group(
            pdf, n_docs, k, k1, b, avgdl, block_size, prune,
            dense_max=dense_max,
            exclude=exclude_bc.value if exclude_bc is not None else None,
        )
        return pd.DataFrame(
            {"qid": qid, "shard": shard, "doc_id": ids, "score": scores}
        )

    return fn
