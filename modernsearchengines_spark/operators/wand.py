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
walk; in columnar Spark the analogue is PROCESSING pruning: the cheap
upper-bound pass (narrow columns, map-side-combined sum) cuts the set of
docs that reach the expensive scoring stage (payload decode + heap scan +
collect_list shuffle) by the pruning ratio (~3× on the bench fixture).  It
is NOT a storage-bytes win — the candidate semi-join runs after the scan —
so the dispatch criterion in :func:`bm25_topk_auto` is the payload-to-scan
cost ratio, with the measured crossover documented there.  Exactness
(pruned ≡ exhaustive, both scoring modes) is asserted by tests/test_wand.py
over the whole query batch.

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


TOPK_SALT = 16


def _topk_per_qnum(
    scores: DataFrame, k: int, value_col: str = "score",
    salt: int = TOPK_SALT,
) -> DataFrame:
    """Per-query exact top-k WITHOUT a one-reducer-per-query window.

    ``Window.partitionBy("qnum")`` funnels each query's full matched set
    (hundreds of thousands of rows) into a single sorted partition — 2
    queries ⇒ 2 busy cores of 32.  Two-level instead: per-(qnum, salt)
    partial top-k in parallel (the global top-k is a subset of the union of
    per-salt top-ks), then the exact window over the ≤ k·salt survivors.
    """
    vc, w_cols = F.col(value_col), [F.desc(value_col), F.asc("doc_id")]
    w1 = Window.partitionBy("qnum", "_s").orderBy(*w_cols)
    w2 = Window.partitionBy("qnum").orderBy(*w_cols)
    return (
        scores.withColumn("_s", F.pmod(F.xxhash64("doc_id"), F.lit(salt)))
        .withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("qnum", "rank", "doc_id", vc.alias(value_col))
    )


def _theta_literal(scores_for_seeds: DataFrame, k: int) -> DataFrame:
    """θ per qnum, COLLECTED eagerly and re-inlined as a literal frame.

    θ is one double per query.  Leaving it lazy makes the final action
    re-evaluate the whole ub+seed subtree a second time (Spark shares no
    work across branches of one DAG without an explicit materialization);
    collecting the per-query minimum splits the computation into two jobs
    that each evaluate every subtree once.  Driver traffic: nq rows.
    """
    spark = scores_for_seeds.sparkSession
    rows = (
        _topk_per_qnum(scores_for_seeds, k)
        .groupBy("qnum")
        .agg(F.min("score").alias("theta"))
        .collect()
    )
    return spark.createDataFrame(
        [(r.qnum, float(r.theta)) for r in rows] or [(None, None)],
        "qnum int, theta double",
    )


def bm25_topk_exhaustive(
    postings: DataFrame, terms: DataFrame, k: int = 100
) -> DataFrame:
    """Baseline: score every matched doc, salted two-level top-k per query."""
    scores = (
        _matched(postings, terms)
        .groupBy("qnum", "doc_id")
        .agg(F.sum("bm25").alias("score"))
    )
    return _topk_per_qnum(scores, k)


def bm25_topk_wand(
    postings: DataFrame, blocks: DataFrame, terms: DataFrame, k: int = 100
) -> DataFrame:
    """Block-max-pruned top-k; identical output to the exhaustive path.

    Evaluation discipline: the ub pass is materialized ONCE
    (localCheckpoint — on a cluster this pins the 3-column frame to
    executor storage; recompute-on-failure is lost, which is the right
    trade for a subsecond-recomputable frame), and θ is collected eagerly
    (see _theta_literal), so phases A/B/C each run exactly one job.
    """
    # Phase A — upper bounds from block maxima only.
    ub = (
        _matched_light(postings, blocks, terms)
        .groupBy("qnum", "doc_id")
        .agg(F.sum("block_max_bm25").alias("ub"))
        .localCheckpoint(eager=False)
    )
    seeds = _topk_per_qnum(ub, k, value_col="ub").select("qnum", "doc_id")

    exact = _matched(postings, terms)

    # Phase B — exact seed scores → per-query threshold θ (k-th best seed).
    theta = _theta_literal(
        exact.join(F.broadcast(seeds), ["qnum", "doc_id"], "left_semi")
        .groupBy("qnum", "doc_id")
        .agg(F.sum("bm25").alias("score")),
        k,
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
    return _topk_per_qnum(scores, k)


PROX_ALPHA = 10.0
# Sound upper bound on min_span_score: positions are distinct char offsets,
# so a window covering one position from each of n lists spans ≥ n chars ⇒
# normalized span ≥ 1 ⇒ score = 1/norm ≤ 1.0 (proximity.min_span_score).
PROX_MAX = 1.0


def _payload_scores(matched_payload: DataFrame, alpha: float) -> DataFrame:
    """(qnum, doc_id, bm25, positions_vb) rows → payload-refined score:
    Σ bm25 + α · min_span(decoded positions).  The blob decode + heap scan
    happen INSIDE one Arrow UDF (proximity.min_span_score_vb_udf) — this is
    the expensive per-doc work the pruned path avoids for non-candidates."""
    from .proximity import min_span_score_vb_udf

    return (
        matched_payload.groupBy("qnum", "doc_id")
        .agg(
            F.sum("bm25").alias("bm25_sum"),
            F.collect_list("positions_vb").alias("_lists"),
        )
        .withColumn(
            "score",
            F.col("bm25_sum")
            + F.lit(alpha) * min_span_score_vb_udf("_lists"),
        )
        .select("qnum", "doc_id", "score")
    )


def _matched_payload(postings: DataFrame, terms: DataFrame) -> DataFrame:
    from .query import pruned_postings

    return pruned_postings(postings, terms).join(
        F.broadcast(terms.select("term_bucket", "term", "qnum")),
        ["term_bucket", "term"],
    ).select("qnum", "doc_id", "bm25", "positions_vb")


def bm25_prox_topk_exhaustive(
    postings: DataFrame, terms: DataFrame, k: int = 100,
    alpha: float = PROX_ALPHA,
) -> DataFrame:
    """Payload-refined top-k, exhaustive: decode positions and run the
    min-span heap scan for EVERY matched doc.  score = Σ bm25 + α·prox
    (Q13-style proximity accumulation as a first-class scale operator)."""
    scores = _payload_scores(_matched_payload(postings, terms), alpha)
    return _topk_per_qnum(scores, k)


def bm25_prox_topk_wand(
    postings: DataFrame, blocks: DataFrame, terms: DataFrame, k: int = 100,
    alpha: float = PROX_ALPHA,
) -> DataFrame:
    """Payload-refined top-k with block-max candidate pruning — identical
    output to :func:`bm25_prox_topk_exhaustive` (tests/test_wand.py).

    This is where distributed WAND actually pays: the per-doc work is no
    longer an 8-byte sum but a varbyte decode + k-way heap scan in Python,
    so cutting the scored set ~3× (pruning_stats on the bench fixture) cuts
    the expensive stage's input rows, Arrow transfer, and collect_list
    shuffle by the same factor.  Upper bound: ub(d) = Σ_t block_max(t,
    block(d)) + α·PROX_MAX ≥ score(d); θ = k-th exact payload score of the
    top-k-by-ub seeds; only candidates with ub ≥ θ are payload-scored.
    """
    ub = (
        _matched_light(postings, blocks, terms)
        .groupBy("qnum", "doc_id")
        .agg(
            (F.sum("block_max_bm25") + F.lit(alpha * PROX_MAX)).alias("ub")
        )
        .localCheckpoint(eager=False)
    )
    seeds = _topk_per_qnum(ub, k, value_col="ub").select("qnum", "doc_id")

    payload = _matched_payload(postings, terms)
    theta = _theta_literal(
        _payload_scores(
            payload.join(F.broadcast(seeds), ["qnum", "doc_id"], "left_semi"),
            alpha,
        ),
        k,
    )

    # Same 1-ulp relative guard as the pure-BM25 path (ub ≥ score holds
    # mathematically; float reduction order can land one ulp under θ).
    candidates = (
        ub.join(F.broadcast(theta), "qnum")
        .filter(F.col("ub") >= F.col("theta") * (1 - 1e-9))
        .select("qnum", "doc_id")
    )
    scores = _payload_scores(
        payload.join(candidates, ["qnum", "doc_id"], "left_semi"), alpha
    )
    return _topk_per_qnum(scores, k)


def bm25_topk_auto(
    postings: DataFrame,
    blocks: DataFrame,
    terms: DataFrame,
    k: int = 100,
    payload: bool = False,
    payload_cost_ratio: float = 2.0,
    alpha: float = PROX_ALPHA,
) -> DataFrame:
    """Cost-based dispatch between exhaustive and block-max-pruned top-k.

    Measured cost model (BENCH/BASELINE.md, 400k docs, 32 cores; S = one
    scan+join pass over the matched posting rows, P = payload scoring over
    them, r = pruning ratio from :func:`pruning_stats`, ~3.1× on the bench
    fixture):

        exhaustive ≈ S + P·[payload]
        pruned     ≈ 2.7·S + P/r·[payload]

    so pruning pays iff P·(1 − 1/r) > 1.7·S ⟺ P/S ≳ 2.5 at r≈3.  The
    pruned path's saving is PROCESSING — it payload-scores (varbyte decode
    + heap scan + collect_list shuffle) r× fewer docs — not storage bytes:
    the candidate semi-join runs after the scan, and the extra narrow ub
    pass ADDS bytes (bench's strategy-bytes table: ub 117 MB, payload scan
    216 MB on the 400k index), so a cold object store favors pruning LESS,
    not more.  The built-in min-span payload measures P ≈ 2.0·S here
    (payload 6.7s vs light 2.2s warm) — just under the crossover, hence
    the default dispatches exhaustive for it.  Callers with genuinely
    heavy per-doc scoring (model-based reranking, long-position proximity
    at larger average doc length) pass their estimated ``P/S`` as
    ``payload_cost_ratio``; above 2.5 the pruned plan is selected.
    """
    if payload and payload_cost_ratio > 2.5:
        return bm25_prox_topk_wand(postings, blocks, terms, k, alpha)
    if payload:
        return bm25_prox_topk_exhaustive(postings, terms, k, alpha)
    # Light scoring has P = 0 — the single pass always wins.
    return bm25_topk_exhaustive(postings, terms, k)


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
