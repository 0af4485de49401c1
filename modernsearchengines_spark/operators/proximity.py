"""Min-span proximity scoring (SURVEY O-53).

The reference computes, per candidate doc, the minimal window covering one
position from each matched original-query term via a k-way heap scan
(/root/reference/retrieval.py:177-209), scored ``1 / (span / n_lists)`` and
0.0 for ≤1 term.  There is no relational equivalent, so this stays a
vectorized pandas UDF over ``array<array<int>>`` — O(Σ|P|·log q) per doc,
Arrow-batched (no per-row Python in the plan).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def min_span_score(lists: list[list[int]]) -> float:
    """Same observable contract as the reference heap scan: pop the global
    min, measure (current_max − min + 1), advance that list, stop when any
    list is exhausted; normalize span by list count; invert."""
    if lists is None or len(lists) <= 1:
        return 0.0
    heap = [(positions[0], i, 0) for i, positions in enumerate(lists) if len(positions)]
    if not heap:
        return 0.0
    heapq.heapify(heap)
    current_max = max(item[0] for item in heap)
    min_span = float("inf")
    while heap:
        cur_min, li, pi = heapq.heappop(heap)
        min_span = min(min_span, current_max - cur_min + 1)
        if pi + 1 < len(lists[li]):
            nxt = lists[li][pi + 1]
            heapq.heappush(heap, (nxt, li, pi + 1))
            current_max = max(current_max, nxt)
        else:
            break
    norm = min_span / len(lists)
    return 1.0 / norm if norm > 0 else 0.0


@F.pandas_udf(DoubleType())
def min_span_score_udf(lists: pd.Series) -> pd.Series:
    return lists.map(
        lambda arrs: min_span_score(
            [list(a) for a in arrs] if arrs is not None else []
        )
    )


@F.pandas_udf(DoubleType())
def min_span_score_vb_udf(blobs: pd.Series) -> pd.Series:
    """Min-span over varbyte-compressed position blobs (array<binary>).

    The persisted postings table stores ONLY the delta+varbyte blob (the raw
    int array would double position storage at 10^12 docs); decoding inside
    the scoring UDF keeps decode+scan a single Arrow crossing instead of a
    separate decode UDF stage shipping the inflated arrays back through the
    JVM.  Char-offset positions are emitted in increasing order, so the
    decoded (sorted) list IS the appearance order the heap scan expects.
    """
    from .codec import varbyte_decode

    return blobs.map(
        lambda bs: min_span_score(
            [varbyte_decode(bytes(b)) for b in bs if b is not None]
            if bs is not None
            else []
        )
    )


# ---------------------------------------------------------------------------
# Heavy reranking payload: multi-scale positional language model
# ---------------------------------------------------------------------------
PLM_SIGMAS = (25.0, 50.0, 100.0, 200.0, 400.0)
PLM_MAX_POSITIONS = 4096
# Sound upper bound for WAND pruning: each term's kernel mass is clipped to
# 1 per evaluation point, the per-point score averages over the term lists,
# and the multi-scale combination averages over sigmas — so plm ≤ 1.0.
PLM_MAX = 1.0


def plm_score(lists: list[list[int]]) -> float:
    """Multi-scale positional-language-model proximity (Lv & Zhai, SIGIR
    2009, "Positional Language Models for Information Retrieval"; multi-σ
    per the paper's smoothing-scale tuning).  For every occurrence position
    c of any query term, a Gaussian kernel propagates each term's
    occurrences to c; the per-point score is the average (clipped per term)
    kernel mass across query terms, and the doc score is the best point
    averaged over the σ ladder — i.e. "does some passage contain all query
    terms densely, at any granularity".

    This is the genuinely expensive per-doc payload the pruned retrieval
    path exists for: O(σ·n²) kernel evaluations per doc over n = Σ|positions|
    (vs the min-span heap scan's O(n log q)); bench.py measures its
    exhaustive-vs-pruned crossover.  Deterministic; positions capped at
    PLM_MAX_POSITIONS per doc.
    """
    lists = [l for l in lists if l]
    if len(lists) <= 1:
        return 0.0
    arrs = [np.asarray(l, dtype=np.float64) for l in lists]
    pos_all = np.concatenate(arrs)
    if pos_all.size > PLM_MAX_POSITIONS:
        # deterministic stride subsample, preserves order statistics
        stride = int(np.ceil(pos_all.size / PLM_MAX_POSITIONS))
        arrs = [a[::stride] for a in arrs]
        arrs = [a for a in arrs if a.size]
        if len(arrs) <= 1:
            return 0.0
        pos_all = np.concatenate(arrs)
    centers = pos_all[:, None]  # (m, 1)
    n_lists = len(arrs)
    best = 0.0
    acc = np.zeros(centers.shape[0])
    for sigma in PLM_SIGMAS:
        acc[:] = 0.0
        inv = -0.5 / (sigma * sigma)
        for a in arrs:
            d = centers - a[None, :]  # (m, n_t)
            k = np.exp(inv * (d * d)).sum(axis=1)
            np.minimum(k, 1.0, out=k)  # clip per-term mass
            acc += k
        best += float(acc.max()) / n_lists
    return best / len(PLM_SIGMAS)


@F.pandas_udf(DoubleType())
def plm_score_vb_udf(blobs: pd.Series) -> pd.Series:
    """PLM over varbyte-compressed position blobs (array<binary>) — same
    decode-inside-the-UDF single-Arrow-crossing contract as
    :func:`min_span_score_vb_udf`."""
    from .codec import varbyte_decode

    return blobs.map(
        lambda bs: plm_score(
            [varbyte_decode(bytes(b)) for b in bs if b is not None]
            if bs is not None
            else []
        )
    )
