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
