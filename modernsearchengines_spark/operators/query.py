"""BM25 top-k query engine (SURVEY.md §3.2 rebuild lifecycle).

One Spark job ranks the whole query batch (not one job per query): compiled
query terms become a small DataFrame that is BROADCAST against the bucketed
postings table (O-24 — the core retrieval join; with Iceberg this is
bucket-pruned on term, with the Parquet stand-in the ``term_bucket`` filter
prunes partitions), then per-(qnum, doc) hash aggregation applies the
reference weight ladder (Q13), +100 Tübingen boost, ``s·log1p(m)``,
query-scoped min-max normalizations (Q8/Q11 — per-query window aggregates),
the min-span proximity UDF (O-53), the α=0.8 blend, and a per-query window
top-k with deterministic (−score, doc_id) tie order (Q16 decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .expansion import TUEBINGEN_TERMS, CompiledQuery, compile_query
from .indexer import DEFAULT_TERM_BUCKETS
from .proximity import min_span_score_vb_udf

ALPHA = 0.8
TOP_K = 100
BOOST = 100.0

# Q13 weight ladder (reference retrieval.py:233-251).
#   original ∧ tueb     → 0.5·bm25, match +0.2
#   original ∧ ¬tueb    → 6.0·bm25, match +1.0
#   ¬original ∧ tueb    → 0.5·bm25, match +0.0
#   ¬original ∧ ¬tueb   → 4.0·bm25, match +0.5


def query_terms_df(
    spark: SparkSession,
    queries: list[CompiledQuery],
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    index: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Flatten compiled queries into (qnum, term, is_original, is_tueb,
    term_bucket) rows — the broadcast side of the retrieval join.

    Everything driver-computable IS computed driver-side, in zero or one
    Spark jobs (warm-latency item, VERDICT r4 item 4 — the per-batch prep
    previously cost ~6 jobs before the first real stage):

    * ``term_bucket`` via the vendored :func:`xxhash64_str` (JVM-parity
      locked by tests/test_hashing.py) instead of a ``withColumn`` the
      executors evaluate;
    * with ``index`` on a deferred-scoring (tf, dl) layout, (idf, avgdl)
      are fused INTO the created rows — one literal-pruned scan of the
      bucketed terms table for idf (the only job), avgdl cached on the
      index dict across batches.  INNER semantics: a query term absent
      from the terms table (df-pruned, O-19) is dropped here, so its
      postings — which MAY exist on disk under the pipelined unpruned
      segment layout — never enter the retrieval join; identical results
      to pruned storage (same matched rows, match_count, scores);
    * the distinct (term_bucket, term) pairs ride along as
      ``df._pruning_pairs`` so :func:`pruned_postings` never needs a
      ``distinct().collect()`` job to recover what the driver already
      knew.
    """
    from ..functions.hashing import xxhash64_str

    tueb = set(TUEBINGEN_TERMS)
    rows = []
    for q in queries:
        originals = set(q.original_terms)
        for term in q.terms:
            rows.append(
                (
                    q.qnum,
                    term,
                    term in originals,
                    term in tueb,
                    xxhash64_str(term) % term_buckets,
                )
            )
    schema = (
        "qnum int, term string, is_original boolean, is_tueb boolean, "
        "term_bucket int"
    )
    if index is not None and "bm25" not in index["postings"].columns:
        pairs = sorted({(r[4], r[1]) for r in rows})
        idf_map = _idf_lut(index, pairs)
        avgdl = _cached_avgdl(index)
        rows = [
            r + (idf_map[r[1]], avgdl) for r in rows if r[1] in idf_map
        ]
        schema += ", idf double, avgdl double"
    df = spark.createDataFrame(rows, schema)
    df._pruning_pairs = sorted({(r[4], r[1]) for r in rows})
    return df


def _idf_lut(
    index: dict[str, DataFrame], pairs: list[tuple[int, str]]
) -> dict[str, float]:
    """idf per query term from ONE literal-pruned scan of the bucketed
    terms table, collected driver-side — O(#query terms) rows, the same
    "small side stays driver-resident" discipline as query compilation."""
    buckets = sorted({b for b, _ in pairs})
    term_list = sorted({t for _, t in pairs})
    rows = (
        index["terms"]
        .filter(
            F.col("term_bucket").isin(buckets)
            & F.col("term").isin(term_list)
        )
        .select("term", "idf")
        .collect()
    )
    return {r.term: float(r.idf) for r in rows}


def _cached_avgdl(index: dict[str, DataFrame]) -> float:
    """corpus avg_doc_len, collected once per index dict (a scalar that
    cannot change under the read index; repeated query batches previously
    paid one job per batch re-reading it)."""
    if "_avgdl" not in index:
        index["_avgdl"] = float(
            index["corpus_stats"].select("avg_doc_len").collect()[0][0]
        )
    return index["_avgdl"]


def attach_scoring_stats(
    terms: DataFrame, index: dict[str, DataFrame]
) -> DataFrame:
    """Attach (idf, avgdl) to an ARBITRARY query-terms frame for
    deferred-scoring (tf, dl) postings layouts (see indexer.bm25_expr),
    with the df>5 inner-join semantics documented in
    :func:`query_terms_df` (which fuses these columns driver-side and is
    the fast path — this broadcast-join form remains for terms frames not
    built by it)."""
    rows = pruned_postings(index["terms"], terms).select("term", "idf").collect()
    spark = terms.sparkSession
    lut = spark.createDataFrame(
        [(r.term, float(r.idf)) for r in rows], "term string, idf double"
    )
    return terms.join(F.broadcast(lut), "term", "inner").withColumn(
        "avgdl", F.lit(_cached_avgdl(index))
    )


def pruned_postings(postings: DataFrame, terms: DataFrame) -> DataFrame:
    """Static pushdown for the retrieval scan: the compiled query terms are
    driver-side and tiny, so emit literal ``term_bucket IN (...)`` and
    ``term IN (...)`` filters.  The bucket predicate prunes partition
    directories (the Iceberg bucket-pruning equivalent); the term predicate
    hits parquet row-group min/max stats.  Relying on runtime DPP for this
    is fragile — the literal filters make the pruning unconditional.

    The pair list comes free from ``terms._pruning_pairs`` when the frame
    was built by :func:`query_terms_df` (zero jobs); the
    ``distinct().collect()`` fallback covers frames from other sources."""
    pairs = getattr(terms, "_pruning_pairs", None)
    if pairs is None:
        pairs = [
            (r.term_bucket, r.term)
            for r in terms.select("term_bucket", "term").distinct().collect()
        ]
    buckets = sorted({b for b, _ in pairs})
    term_list = sorted({t for _, t in pairs})
    return postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(term_list)
    )


def score_cols(postings: DataFrame) -> list[str]:
    """The columns a scoring scan must read: the materialized bm25 on
    legacy layouts, the (tf, dl) pair under deferred scoring."""
    return ["bm25"] if "bm25" in postings.columns else ["tf", "dl"]


def ensure_bm25(matched: DataFrame) -> DataFrame:
    """Materialize bm25 on a postings⨝query-terms frame when the layout
    defers scoring (indexer.bm25_expr over tf/dl/idf/avgdl, all present
    post-join via attach_scoring_stats); pass-through when the postings
    already carry bm25.  Scratch columns are dropped either way."""
    from .indexer import bm25_expr

    if "bm25" not in matched.columns:
        matched = matched.withColumn(
            "bm25", bm25_expr("idf", "tf", "dl", "avgdl")
        )
    return matched.drop("tf", "dl", "idf", "avgdl")


def _with_minmax(df: DataFrame, col: str, lo: str, hi: str) -> DataFrame:
    """Attach per-query min/max of ``col`` as columns ``lo``/``hi``.

    NOT a ``Window.partitionBy(qnum)``: that exchange funnels every row of a
    query into one partition (worst-case skew — a query matching 10^9 docs
    lands on one reducer).  A groupBy aggregate gets map-side partial
    min/max and the tiny per-query stats broadcast back."""
    stats = df.groupBy("qnum").agg(
        F.min(col).alias(lo), F.max(col).alias(hi)
    )
    return df.join(F.broadcast(stats), "qnum")


def _qnum_literal_cols(df: DataFrame, aggs: dict[str, object]) -> DataFrame:
    """Attach per-query aggregate values as LITERAL map lookups instead of
    a broadcast join: one collect of the (O(#queries)-row) stats frame,
    then ``map(qnum -> value)[qnum]`` literal expressions.

    Used on the materialized rank() path where ``df`` is already cached:
    the collect is a fast scan, and it replaces a broadcast-exchange
    build job + hash join per stats site — on the bench box each such
    build cost 0.5-1 s of per-batch fixed latency (warm-latency item,
    VERDICT r4 item 4).  The broadcast-join form (:func:`_with_minmax`)
    remains for the lazy path, where an extra eager collect would defeat
    ``materialize=False``'s purpose.
    """
    rows = df.groupBy("qnum").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    ).collect()
    out = df
    for name in aggs:
        entries = []
        for r in rows:
            val = r[name]
            entries += [
                F.lit(int(r["qnum"])),
                F.lit(float(val)) if val is not None
                else F.lit(None).cast("double"),
            ]
        col = (
            F.create_map(*entries)[F.col("qnum")]
            if entries
            else F.lit(None).cast("double")
        )
        out = out.withColumn(name, col)
    return out


def rank(
    postings: DataFrame,
    terms: DataFrame,
    doc_stats: DataFrame,
    top_k: int = TOP_K,
    alpha: float = ALPHA,
    prefilter: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Rank the query batch → (qnum, rank, doc_id, url, score, bm25_sum,
    match_count).

    ``prefilter`` (optional) is a (qnum, doc_id) DataFrame from the block-max
    WAND stage (wand.py) restricting exact scoring to surviving candidates.

    ``materialize=False`` skips the two persist/count sites and the
    literal-stats collects (keeping the whole plan lazy) — used by the
    plan-shape tests to assert pushdown/broadcast on the full logical plan;
    production callers keep the default.  Measured rationale (r5): without
    materialization the min-max stats passes re-evaluate the
    scan+join+bm25 and agg+prox-UDF subtrees, and with a LAZY
    localCheckpoint (the r4 shape) the stats broadcast build and the main
    pass race as concurrent jobs that EACH compute the unmaterialized
    subtree — two ~4 s twin jobs per stats site per warm batch, the bulk
    of the 13 s warm parity latency.  Eager persist()+materialize runs each
    subtree exactly once; every later branch scans the cached blocks.

    CACHE LIFECYCLE (closes the r4 ADVICE): the two persisted frames ride
    on the returned DataFrame as ``result._cached_frames``; call
    :func:`release` after consuming the result to unpersist them.  A
    caller that skips release() leaks two small cached frames (blob-free
    scalar columns) per batch until the session ends — bounded, disclosed,
    and reclaimable.  persist() (not localCheckpoint) keeps lineage, so an
    executor loss on a real cluster recomputes instead of failing the job.
    """
    # O-24: broadcast-hash equi join, bucket-pruned on term_bucket via the
    # static literal filters of pruned_postings.  The fat positions column
    # is NOT read here — only original-query terms need positions (Q13 tail
    # note), so a second narrow join below reads them for that small term
    # subset only (columnar IO win).
    postings = pruned_postings(postings, terms)
    matched = ensure_bm25(
        postings.select(
            "term_bucket", "term", "doc_id", *score_cols(postings)
        ).join(F.broadcast(terms), ["term_bucket", "term"], "inner")
    )
    if prefilter is not None:
        matched = matched.join(prefilter, ["qnum", "doc_id"], "left_semi")

    # Q8 needs per-query min/max BEFORE the weight ladder, and the stats
    # aggregate plus the main pass would otherwise each evaluate the
    # scan+join+bm25 subtree (Spark shares no work across branches of one
    # DAG).  Materialize the narrow matched frame once, EAGERLY (docstring
    # rationale — a lazy checkpoint lets the stats build and the main pass
    # race to compute the subtree twice).  Only the columns the ladder
    # reads are stored: term/term_bucket are join keys, dead after the
    # join — keeping the term strings roughly doubled the cached bytes,
    # which both stats passes then re-read (DRAM-bound on this box).
    matched = matched.select(
        "qnum", "doc_id", "bm25", "is_original", "is_tueb"
    )
    cached_frames = []
    if materialize:
        matched = matched.persist()
        cached_frames.append(matched)

    # Q8: min-max normalize ALL fetched bm25 values per query; silently
    # skipped when max == min (reference retrieval.py:58-67).  On the
    # materialized path the per-query extrema become literal map lookups
    # (one collect over the cached frame) instead of a broadcast join —
    # fewer fixed-latency jobs per batch (_qnum_literal_cols docstring).
    if materialize:
        # this collect doubles as the eager cache materialization: the
        # aggregate scan over the just-persisted frame caches every
        # partition it reads, so no separate count() job is needed
        matched = _qnum_literal_cols(
            matched, {"_blo": F.min("bm25"), "_bhi": F.max("bm25")}
        )
    else:
        matched = _with_minmax(matched, "bm25", "_blo", "_bhi")
    matched = matched.withColumn(
        "nbm25",
        F.when(
            F.col("_bhi") > F.col("_blo"),
            (F.col("bm25") - F.col("_blo")) / (F.col("_bhi") - F.col("_blo")),
        ).otherwise(F.col("bm25")),
    )

    w_col = (
        F.when(F.col("is_tueb"), 0.5)
        .when(F.col("is_original"), 6.0)
        .otherwise(4.0)
    )
    mw_col = (
        F.when(F.col("is_original") & F.col("is_tueb"), 0.2)
        .when(F.col("is_original"), 1.0)
        .when(F.col("is_tueb"), 0.0)
        .otherwise(0.5)
    )

    per_doc = (
        matched.withColumn("w_bm25", w_col * F.col("nbm25"))
        .withColumn("mw", mw_col)
        .groupBy("qnum", "doc_id")
        .agg(
            F.sum("w_bm25").alias("s_raw"),
            F.sum("mw").alias("match_count"),
            F.max(F.col("is_tueb").cast("int")).alias("has_tueb"),
        )
        .withColumn(
            "bm25_sum",
            F.col("s_raw") + F.when(F.col("has_tueb") == 1, BOOST).otherwise(0.0),
        )
        .withColumn("combined", F.col("bm25_sum") * F.log1p("match_count"))
    )

    # Positions for original-query terms only (narrow term subset); the
    # stored form is the varbyte blob — collected as-is and decoded inside
    # the scoring UDF (single Arrow crossing, blobs stay compressed through
    # the shuffle).
    orig_terms = terms.filter(F.col("is_original")).select(
        "term_bucket", "term", "qnum"
    )
    prox_src = postings.select(
        "term_bucket", "term", "doc_id", "positions_vb"
    ).join(F.broadcast(orig_terms), ["term_bucket", "term"])
    if prefilter is not None:
        prox_src = prox_src.join(prefilter, ["qnum", "doc_id"], "left_semi")
    prox_df = prox_src.groupBy("qnum", "doc_id").agg(
        F.collect_list("positions_vb").alias("prox_lists")
    )
    per_doc = per_doc.join(prox_df, ["qnum", "doc_id"], "left")

    # Q11: per-query min-max for BOTH normalization sites (combined and
    # prox) in ONE stats pass: prox is computed first, then a single
    # groupBy(qnum) aggregate produces all four extrema and broadcasts
    # back.  (Three separate _with_minmax rounds each re-walked the per-doc
    # lineage; fusing them halves the post-aggregation passes — the bm25
    # min-max above cannot fuse, Q8 requires it before the weight ladder.)
    per_doc = per_doc.withColumn(
        "prox", min_span_score_vb_udf("prox_lists")
    ).drop("prox_lists")
    # Same double-evaluation hazard as the matched frame above, but worse:
    # without a materialization the stats pass below re-runs BOTH
    # aggregations AND the min-span decode UDF over every per-doc row a
    # second time.  Materialize after dropping the blob lists so the
    # stored frame is a dozen scalar columns; eager for the same reason as
    # the matched site (the stats and topk broadcast builds otherwise race
    # to compute this subtree twice).
    if materialize:
        per_doc = per_doc.persist()
        cached_frames.append(per_doc)
        per_doc = _qnum_literal_cols(
            per_doc,
            {
                "_clo": F.min("combined"),
                "_chi": F.max("combined"),
                "_plo": F.min("prox"),
                "_phi": F.max("prox"),
            },
        )
    else:
        stats = per_doc.groupBy("qnum").agg(
            F.min("combined").alias("_clo"),
            F.max("combined").alias("_chi"),
            F.min("prox").alias("_plo"),
            F.max("prox").alias("_phi"),
        )
        per_doc = per_doc.join(F.broadcast(stats), "qnum")
    per_doc = per_doc.withColumn(
        "norm_combined",
        F.when(F.col("_chi") == F.col("_clo"), 0.0).otherwise(
            (F.col("combined") - F.col("_clo"))
            / (F.col("_chi") - F.col("_clo"))
        ),
    ).withColumn(
        "norm_prox",
        F.when(F.col("_phi") == F.col("_plo"), 0.0).otherwise(
            (F.col("prox") - F.col("_plo")) / (F.col("_phi") - F.col("_plo"))
        ),
    ).withColumn(
        "score", alpha * F.col("norm_combined") + (1 - alpha) * F.col("norm_prox")
    )

    # O-47/O-49: per-query top-k, total order (−score, doc_id) (Q16).
    w_rank = Window.partitionBy("qnum").orderBy(F.desc("score"), F.asc("doc_id"))
    topk = (
        per_doc.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= top_k)
        .select("qnum", "rank", "doc_id", "score", "bm25_sum", "match_count")
    )

    # O-27: hydration join — top-k side is tiny, broadcast it.
    out = (
        doc_stats.select("doc_id", "url")
        .join(F.broadcast(topk), "doc_id")
        .select("qnum", "rank", "doc_id", "url", "score", "bm25_sum", "match_count")
        .orderBy("qnum", "rank")
    )
    out._cached_frames = cached_frames
    return out


def release(results: DataFrame) -> None:
    """Unpersist the intermediate frames a materialized :func:`rank`
    pinned (``results._cached_frames``) — call after consuming the result
    in a loop (interactive search, benchmark repeats) so cached storage
    does not accumulate across batches.  No-op for frames without the
    attribute (materialize=False, or results from other operators)."""
    for df in getattr(results, "_cached_frames", []):
        df.unpersist()


def run_query_batch(
    spark: SparkSession,
    index: dict[str, DataFrame],
    queries: list[tuple[int, str]],
    top_k: int = TOP_K,
    expansion: dict[str, list[str]] | None = None,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    compiled = [compile_query(qnum, text, expansion) for qnum, text in queries]
    terms = query_terms_df(spark, compiled, term_buckets, index=index)
    return rank(index["postings"], terms, index["doc_stats"], top_k=top_k)


def search(
    spark: SparkSession,
    index: dict[str, DataFrame],
    docs: DataFrame,
    text: str,
    top_k: int = 10,
    need_spellcheck: bool = True,
    expansion: dict[str, list[str]] | None = None,
    parity: bool = True,
    payload: bool = False,
    spellchecker=None,
) -> DataFrame:
    """Interactive search path (reference main_retrival, retrieval.py:406-422
    / SURVEY §3.3): spellcheck → compile → rank top-10 → snippet per hit.

    ``docs`` must carry (doc_id, text) for snippet hydration.  Returns
    (rank, doc_id, url, score, snippet).

    ``parity=True`` (default) reproduces the reference scoring quirks
    exactly (weight ladder, +100 boost, global min-max couplings Q8/Q11 —
    necessarily exhaustive, the normalizations read every matched score).
    ``parity=False`` routes through the cost-based dispatcher
    (wand.bm25_topk_auto): plain BM25 top-k — optionally blended with the
    min-span payload when ``payload=True`` — served by the cascade-pruned
    plan whenever its measured cost model predicts a win.  This is the
    non-reference deployment surface; scores are pure BM25(+α·prox), not
    the reference ladder.
    """
    from .expansion import spellcheck
    from .snippets import add_snippets

    # ``spellchecker``: a VocabSpellchecker built from the corpus
    # (expansion.VocabSpellchecker.from_docs) — the real Norvig corrector;
    # None keeps the deterministic fixture table (the parity spec).
    corrected = (
        spellcheck(text, checker=spellchecker) if need_spellcheck else text
    )
    if parity:
        topk = run_query_batch(
            spark, index, [(1, corrected)], top_k=top_k, expansion=expansion
        )
    else:
        from . import wand

        compiled = [compile_query(1, corrected, expansion)]
        terms = query_terms_df(spark, compiled, index=index)
        scored = wand.bm25_topk_auto(
            index["postings"], index["blocks"], terms,
            k=top_k, payload=payload,
        )
        topk = (
            index["doc_stats"].select("doc_id", "url")
            .join(F.broadcast(scored), "doc_id")
            .select("qnum", "rank", "doc_id", "url", "score")
        )
    # Reference snippet query: the processed query sans the injected
    # "tuebingen" (retrieval.py:416-418).
    from .expansion import preprocess_query

    snippet_query = " ".join(
        w for w in preprocess_query(corrected).split() if w != "tuebingen"
    ) or "tuebingen"
    queries = spark.createDataFrame([(1, snippet_query)], "qnum int, text string")
    out = add_snippets(topk, docs, queries).select(
        "rank", "doc_id", "url", "score", "snippet"
    ).orderBy("rank")
    # ride the rank() cache handles so interactive loops can release()
    out._cached_frames = getattr(topk, "_cached_frames", [])
    return out


def format_batch_results(results: DataFrame) -> DataFrame:
    """Reference batch sink shape: qnum, rank, url, score as %.3f string
    (O-5, reference retrieval.py:324-331)."""
    return results.select(
        "qnum", "rank", "url", F.format_number("score", 3).alias("score")
    )
