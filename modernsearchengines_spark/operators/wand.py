"""Block-max WAND-style pruned BM25 top-k (BASELINE.json north_star/rule).

Standard disjunctive BM25 top-k (``score(d) = Σ_t bm25(t, d)``) with the
distributed analogue of block-max WAND (Ding & Suel 2011, "Faster top-k
document retrieval using block-max indexes"):

  Phase A  read ONLY the light columns (term, doc_id, block_id,
           block_max_bm25) of the bucket-pruned postings join and compute a
           per-doc upper bound ``ub(d) = Σ_t block_max(t, block_t(d))`` —
           Parquet column pruning keeps positions/positions_vb unread.
  Phase B  exact-score the top-k docs BY UPPER BOUND (the seed set) and take
           θ = the k-th exact seed score — a sound threshold, since every
           true top-k doc has exact ≤ ub.
  Phase C  exact-score only candidates with ub ≥ θ; window top-k.

In a single-node WAND the win is skipping posting blocks during a pointer
walk; in columnar Spark the equivalent win is (a) never reading the heavy
position columns, (b) exact-scoring only the candidate set (the ub agg is a
cheap map-side-combined sum).  Exactness (WAND-on ≡ exhaustive) is asserted
by tests/test_wand.py over the whole query batch.

The reference-parity ranking mode (operators/query.py) stays exhaustive BY
DESIGN: its query-global min-max normalizations (Q8/Q11) couple every
document's final score to the min/max over ALL matched docs, so any pruning
would change survivors' scores.  This module is the scale path a 100 TB
corpus would serve standard queries with; ``rank(prefilter=...)`` accepts
this module's candidates when quirk-parity is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _matched(postings: DataFrame, terms: DataFrame) -> DataFrame:
    from .query import pruned_postings

    return pruned_postings(postings, terms).join(
        F.broadcast(terms.select("term_bucket", "term", "qnum")),
        ["term_bucket", "term"],
    ).select("qnum", "doc_id", "bm25")


def _matched_light(
    postings: DataFrame, blocks: DataFrame, terms: DataFrame
) -> DataFrame:
    """Light columns only: posting (term, doc_id, block_id) joined with the
    compact blocks table — positions/bm25 columns stay unread (Parquet
    column pruning)."""
    from .query import pruned_postings

    postings = pruned_postings(postings, terms)
    t = F.broadcast(terms.select("term_bucket", "term", "qnum"))
    narrow = postings.join(t, ["term_bucket", "term"]).select(
        "qnum", "term_bucket", "term", "doc_id", "block_id"
    )
    b = blocks.join(t.select("term_bucket", "term").distinct(),
                    ["term_bucket", "term"])
    return narrow.join(
        F.broadcast(b), ["term_bucket", "term", "block_id"]
    ).select("qnum", "doc_id", "block_max_bm25")


def bm25_topk_exhaustive(
    postings: DataFrame, terms: DataFrame, k: int = 100
) -> DataFrame:
    """Baseline: score every matched doc, window top-k per query."""
    scores = (
        _matched(postings, terms)
        .groupBy("qnum", "doc_id")
        .agg(F.sum("bm25").alias("score"))
    )
    w = Window.partitionBy("qnum").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qnum", "rank", "doc_id", "score")
    )


def bm25_topk_wand(
    postings: DataFrame, blocks: DataFrame, terms: DataFrame, k: int = 100
) -> DataFrame:
    """Block-max-pruned top-k; identical output to the exhaustive path."""
    # Phase A — upper bounds from block maxima only.
    ub = (
        _matched_light(postings, blocks, terms)
        .groupBy("qnum", "doc_id")
        .agg(F.sum("block_max_bm25").alias("ub"))
    )
    w_ub = Window.partitionBy("qnum").orderBy(F.desc("ub"), F.asc("doc_id"))
    seeds = (
        ub.withColumn("_r", F.row_number().over(w_ub))
        .filter(F.col("_r") <= k)
        .select("qnum", "doc_id")
    )

    exact = _matched(postings, terms)

    # Phase B — exact seed scores → per-query threshold θ (k-th best seed).
    w_seed = Window.partitionBy("qnum").orderBy(F.desc("score"), F.asc("doc_id"))
    theta = (
        exact.join(seeds, ["qnum", "doc_id"], "left_semi")
        .groupBy("qnum", "doc_id")
        .agg(F.sum("bm25").alias("score"))
        .withColumn("_r", F.row_number().over(w_seed))
        .filter(F.col("_r") <= k)
        .groupBy("qnum")
        .agg(F.min("score").alias("theta"))
    )

    # Phase C — exact-score only candidates whose upper bound clears θ.
    # 1-ulp guard: when a doc sits alone in its blocks, ub(d) ≡ exact(d)
    # mathematically but the two sums reduce in different orders, so ub can
    # land one ulp BELOW θ at the boundary (observed; BM25 ≥ 0 so a relative
    # shrink of θ is a sound slack).
    candidates = (
        ub.join(F.broadcast(theta), "qnum")
        .filter(F.col("ub") >= F.col("theta") * (1 - 1e-9))
        .select("qnum", "doc_id")
    )
    scores = (
        exact.join(candidates, ["qnum", "doc_id"], "left_semi")
        .groupBy("qnum", "doc_id")
        .agg(F.sum("bm25").alias("score"))
    )
    w = Window.partitionBy("qnum").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qnum", "rank", "doc_id", "score")
    )


def pruning_stats(
    postings: DataFrame, blocks: DataFrame, terms: DataFrame, k: int = 100
) -> dict:
    """Diagnostic: matched docs vs docs surviving the θ cut."""
    ub = (
        _matched_light(postings, blocks, terms)
        .groupBy("qnum", "doc_id")
        .agg(F.sum("block_max_bm25").alias("ub"))
    )
    n_matched = ub.count()
    w_ub = Window.partitionBy("qnum").orderBy(F.desc("ub"), F.asc("doc_id"))
    seeds = (
        ub.withColumn("_r", F.row_number().over(w_ub))
        .filter(F.col("_r") <= k)
        .select("qnum", "doc_id")
    )
    exact = _matched(postings, terms)
    w_seed = Window.partitionBy("qnum").orderBy(F.desc("score"), F.asc("doc_id"))
    theta = (
        exact.join(seeds, ["qnum", "doc_id"], "left_semi")
        .groupBy("qnum", "doc_id")
        .agg(F.sum("bm25").alias("score"))
        .withColumn("_r", F.row_number().over(w_seed))
        .filter(F.col("_r") <= k)
        .groupBy("qnum")
        .agg(F.min("score").alias("theta"))
    )
    n_candidates = (
        ub.join(F.broadcast(theta), "qnum")
        .filter(F.col("ub") >= F.col("theta") * (1 - 1e-9))
        .count()
    )
    return {"matched_docs": n_matched, "scored_docs": n_candidates}
