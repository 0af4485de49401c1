"""Distributed inverted-index build (SURVEY.md §3.1 rebuild lifecycle).

Pipeline (all Catalyst-planned; Python crosses the JVM boundary only inside
the Arrow-vectorized UDFs marked *; ONE map-side job builds local postings):

    docs ──derive text from html (*extract)──filter(lang)──dedup(*simhash)
         ──doc_id = xxhash64(url)──length-cap gate (Q2/Q3)
         ──*doc_postings (url-words Q4 + tokenize + per-doc term agg +
            varbyte position encode — the ONE Arrow crossing of the whole
            build, NO token shuffle)──parquet segment
    then (pure JVM): stats (one agg) ── flatten ── salted df agg [two-level,
    head-term skew R5] ── IDF/BM25 column exprs ── df>5 prune ──
    hash-block ids ── write bucketed by term ── blocks table from the
    written postings (narrow columnar read)

Reference semantics replicated: length cap counts toward N and avg_doc_len
(Q2/Q3, reference indexing.py:182,193-200), token-count doc length over
char-count average length (Q1, indexing.py:166-167,197), URL words prepended
(Q4, indexing.py:195), char-offset positions (Q5), df>5 persisted prune (Q6,
indexing.py:236-237), IDF/BM25 formulas with k1=1.5, b=0.75
(indexing.py:162-171,217).

Storage note: the target table layout is Iceberg
``CREATE TABLE postings ... USING iceberg PARTITIONED BY (bucket(K, term))``;
the Iceberg runtime jar is not available in this sandbox, so writes use plain
Parquet with an explicit ``term_bucket = pmod(xxhash64(term), K)`` partition
column — the same physical layout and the same partition-pruning behavior at
query time.
"""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.simhash import simhash64
from ..functions.tokenizer import tokenize, url_to_words
from .codec import varbyte_encode_batch

K1 = 1.5
B = 0.75


def bm25_expr(idf, tf, dl, avgdl):
    """BM25 term-doc score as a pure-JVM column expression:

        idf · (tf·(k1+1)) / (tf + k1·(1 − b + b·dl/avgdl))

    DEFERRED SCORING: the persisted postings layout stores the
    corpus-global-free pair (tf, dl) instead of a baked bm25 — at 100 TB a
    materialized bm25 freezes idf/avgdl (corpus-global stats) into every
    posting row, so ANY corpus append would invalidate and rewrite the
    whole index.  Storing (tf, dl) makes appends touch only the new
    segment's postings plus the small terms/corpus_stats tables, and lets
    the bucket-layout shuffle start before the global stats exist (the
    build pipeline overlap in build_index_pipelined).  Consumers
    materialize bm25 with this expression right after their (broadcast)
    query-terms join — per-query cost is a fused multiply over already-
    matched rows inside whole-stage codegen.

    Operand order matches the former build-time materialization
    (idf·num/den, left-to-right) so scores are bit-identical to the
    round-2 layout.
    """
    idf, tf, dl, avgdl = (
        F.col(c) if isinstance(c, str) else c for c in (idf, tf, dl, avgdl)
    )
    return idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * (dl / avgdl)))
MAX_DOC_CHARS = 800_000
DF_PRUNE = 5
DEFAULT_TERM_BUCKETS = 64
DEFAULT_N_BLOCKS = 256  # hash blocks per term for block-max pruning
# media-URL suffixes the reference excludes from the corpus (O-18,
# WebCrawler_basis.py:213-214 and the retroactive topic.py:156-174 cleanup)
MEDIA_URL_SUFFIXES = (".jpg", ".png", ".pdf")
DF_SALT = 16  # salt fan-out for the head-term df aggregation

TOKEN_TYPE = ArrayType(
    StructType(
        [StructField("term", StringType()), StructField("pos", IntegerType())]
    )
)


# --------------------------------------------------------------------------
# Arrow UDFs (vectorized; the only Python in the plan)
# --------------------------------------------------------------------------
@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """html(binary) → text with stripped_strings semantics (O-58)."""
    from ..functions.html_extract import extract_text

    return html.map(lambda b: extract_text(bytes(b)) if b is not None else None)


@F.pandas_udf(StringType())
def url_words_udf(url: pd.Series) -> pd.Series:
    """URL → comma-separated words (O-67, reference indexing.py:89-105)."""
    return url.map(url_to_words)


@F.pandas_udf(TOKEN_TYPE)
def tokenize_udf(text: pd.Series) -> pd.Series:
    """Reference-parity tokenize (O-74): [(stem, char_offset)] per doc."""
    return text.map(lambda t: tokenize(t) if t is not None else [])


DOC_POSTINGS_TYPE = StructType(
    [
        StructField("aug_len", LongType()),
        StructField("doc_len", LongType()),
        StructField(
            "postings",
            ArrayType(
                StructType(
                    [
                        StructField("term", StringType()),
                        StructField("tf", IntegerType()),
                        StructField("positions_vb", BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


@F.pandas_udf(DOC_POSTINGS_TYPE)
def doc_postings_udf(url: pd.Series, text: pd.Series) -> pd.DataFrame:
    """Map-side posting construction: URL-word augmentation (Q4), tokenize,
    per-doc (term → tf, positions) aggregation, AND delta+varbyte position
    encoding, all INSIDE one Arrow batch.

    The tokens of a document are colocated by definition, so grouping them
    needs no shuffle — the naive tokenize→explode→groupBy(term, doc_id) plan
    shuffles every token row (~2× posting count) for an aggregation that is
    free map-side.  This is the classic per-partition local-index build; the
    only remaining shuffles in the whole pipeline are the (small) term-df
    aggregation.  Folding url_to_words AND the varbyte encoder in here keeps
    the whole index build at ONE Arrow crossing: a downstream encode UDF
    (the round-1 design) shipped all ~36M exploded posting rows to Python
    and back a second time, costing ~10s of a 22s scoring phase at 32 cores
    — while this stage's tokenizer already holds every position in Python
    for free.  Downstream (flatten → df agg → BM25 → write) is now pure JVM.

    Outputs per doc: aug_len = char length of url words + " " + text
    (Q1/Q2 avg_doc_len numerator), doc_len = token count (Q1), postings in
    appearance order with ``positions_vb`` = varbyte(sorted char offsets)
    (Q5; sorted is the persisted-index contract, test_index_parity).
    """

    def one(u: str, t: str | None):
        if t is None:  # length-capped doc: counted in N, not indexed (Q2/Q3)
            return (None, 0, {})
        aug = url_to_words(u) + " " + t
        toks = tokenize(aug)
        agg: dict[str, list[int]] = {}
        for term, pos in toks:
            agg.setdefault(term, []).append(pos)
        return (len(aug), len(toks), agg)

    rows = [one(u, t) for u, t in zip(url, text)]
    # One vectorized encode over every position list in the batch (offsets
    # are near-sorted already — Timsort makes the chunk-boundary resets
    # cheap; sorting precedes encoding per the persisted-index contract).
    all_lists: list[list[int]] = []
    for _, _, agg in rows:
        for ps in agg.values():
            ps.sort()
            all_lists.append(ps)
    blobs = iter(varbyte_encode_batch(all_lists))
    out = [
        (
            aug_len,
            doc_len,
            [
                {"term": term, "tf": len(ps), "positions_vb": next(blobs)}
                for term, ps in agg.items()
            ],
        )
        for aug_len, doc_len, agg in rows
    ]
    return pd.DataFrame(out, columns=["aug_len", "doc_len", "postings"])


@F.pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """64-bit simhash, two's-complement into a Spark long (O-70)."""

    def _h(t: str | None) -> int:
        if t is None:
            return 0
        v = simhash64(t)
        return v - (1 << 64) if v >= (1 << 63) else v

    return text.map(_h)


# --------------------------------------------------------------------------
# Cleaning (O-12/O-17/O-28): English filter + exact simhash dedup
# --------------------------------------------------------------------------
def media_url_filter(docs: DataFrame) -> DataFrame:
    """O-18: drop media URLs (.jpg/.png/.pdf) the reference excludes
    (WebCrawler_basis.py:213-214; retroactively topic.py:156-174).  Exact
    lowercase suffix match, mirroring the reference's ``str.endswith``."""
    keep = ~F.col("url").endswith(MEDIA_URL_SUFFIXES[0])
    for sfx in MEDIA_URL_SUFFIXES[1:]:
        keep &= ~F.col("url").endswith(sfx)
    return docs.filter(keep)


def domain_histogram(docs: DataFrame) -> DataFrame:
    """O-43: per-domain page counts (reference WebCrawler_basis.py:387-401
    crawl diagnostic) — ``groupBy(host).count()``, a map-side-combined
    aggregation on the (small) distinct-host key space."""
    return (
        docs.groupBy(F.parse_url("url", F.lit("HOST")).alias("domain"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


def clean_docs(docs: DataFrame, derive_text_from_html: bool = False) -> DataFrame:
    """English-only, media-URL-filtered, simhash-deduped corpus (reference
    establish_workingDB, WebCrawler_basis.py:311-362; Q12: threshold 0.99 ⟺
    exact hash match; O-18 media exclusion).

    Keep-first policy within a duplicate group: min (warc_ts, url) —
    deterministic stand-in for the reference's crawl-insertion order.
    """
    docs = media_url_filter(docs)
    if derive_text_from_html:
        docs = docs.withColumn("text", extract_text_udf("html"))
    # No pre-UDF repartition: Spark sizes file splits as
    # max(openCost, bytes/defaultParallelism) capped at maxPartitionBytes,
    # so the scan stage that runs the simhash UDF already gets ≈ one split
    # per core on compact inputs and thousands of splits at 100 TB.  An
    # explicit repartition here re-shuffled the full corpus (text + html)
    # purely for parallelism the scan already had — measured 3.4s of the
    # 32-core 400k-doc build, and its cost grows linearly with corpus size.
    english = docs.filter(F.col("lang").startswith("en"))
    hashed = english.withColumn("simhash", simhash_udf("text"))
    w = Window.partitionBy("simhash").orderBy("warc_ts", "url")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --------------------------------------------------------------------------
# Deterministic dense doc_id over url (replaces SQLite rowid, SURVEY O-1)
# --------------------------------------------------------------------------
def assign_doc_ids(docs: DataFrame, mode: str = "hash", n_ranges: int = 32) -> DataFrame:
    """Deterministic doc ids over url (replaces SQLite rowid, SURVEY O-1).

    ``mode="hash"`` (default): ``doc_id = xxhash64(url)`` — a pure column
    expression, zero coordination, the only formulation that scales to
    10^12 docs without a global ordering pass.  The oracle computes the
    identical ids via the vendored pure-Python xxHash64
    (functions/hashing.py), so engine↔oracle doc ids agree bit-for-bit.
    Collision risk documented there.

    ``mode="dense"``: dense 0-based rank of url (closest analogue of the
    reference's SQLite rowid).  A global ``row_number() OVER (ORDER BY
    url)`` would single-partition at 100 TB; instead the URL COLUMN ALONE is
    range-repartitioned and numbered within each sorted range, per-range
    offsets are added back, and the tiny (url, doc_id) map is hash-joined
    onto the full rows.  The numbered intermediate is persisted before the
    offsets are derived: ``spark_partition_id()`` is nondeterministic and
    upstream row order is shuffle-dependent, so evaluating the subtree twice
    (offsets branch + join branch) can disagree on range boundaries and mint
    duplicate ids — observed in benchmarking as colliding doc_ids and a
    wobbling posting count.  Single evaluation makes the assignment exact by
    construction (tests/test_determinism.py).
    """
    if mode == "hash":
        return docs.withColumn("doc_id", F.xxhash64("url"))
    urls = docs.select("url")
    numbered = (
        urls.repartitionByRange(n_ranges, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_rn", F.row_number().over(Window.partitionBy("_pid").orderBy("url"))
        )
        .persist()
    )
    offsets = (
        numbered.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_cnt")
    )
    ids = (
        numbered.join(F.broadcast(offsets), "_pid")
        .withColumn("doc_id", (F.col("_offset") + F.col("_rn") - 1).cast("long"))
        .select("url", "doc_id")
    )
    return docs.join(ids, "url")


# --------------------------------------------------------------------------
# Index build
# --------------------------------------------------------------------------
def tokenize_docs(docs_with_ids: DataFrame) -> DataFrame:
    """→ (doc_id, aug_len, tok_idx, term, pos) exploded token stream.

    aug text = url words + " " + text (Q4); aug_len is its CHAR length
    (feeds the Q1/Q2 avg_doc_len).
    """
    aug = docs_with_ids.withColumn(
        "aug_text", F.concat(url_words_udf("url"), F.lit(" "), F.col("text"))
    ).withColumn("aug_len", F.length("aug_text"))
    return aug.select(
        "doc_id",
        "aug_len",
        F.posexplode_outer(tokenize_udf("aug_text")).alias("tok_idx", "token"),
    ).select(
        "doc_id",
        "aug_len",
        "tok_idx",
        F.col("token.term").alias("term"),
        F.col("token.pos").alias("pos"),
    )


def term_doc_frequency(enriched: DataFrame, df_salt: int = DF_SALT) -> DataFrame:
    """(term, df) from the enriched segment via a NARROW nested scan.

    Document frequency needs only ``postings.term`` — extracting the term
    subfield BEFORE the explode lets Parquet nested-schema pruning skip the
    fat positions_vb blobs entirely, so this pass streams a few MB of
    dictionary-encoded strings instead of the whole segment.  Keeping it a
    separate scan (instead of forking the one fat flatten) matters under
    AQE: forked branches of a shared exchange materialize as two full
    shuffles of the wide posting rows (measured: two ~4-5s × 32-task stages
    at 400k docs), while this narrow re-scan costs less than either.

    Two-level salted aggregation for head-term skew (R5: "tuebingen" is in
    nearly every doc by design): pre-aggregate per (term, salt-of-doc_id),
    then merge the ≤ df_salt partials per term.  Exact counts.
    """
    terms = enriched.select(
        "doc_id", F.explode(F.col("postings.term")).alias("term")
    )
    salted = (
        terms.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(df_salt)))
        .groupBy("term", "_salt")
        .agg(F.count(F.lit(1)).alias("_partial_df"))
    )
    return salted.groupBy("term").agg(F.sum("_partial_df").alias("df"))


def build_index(
    spark: SparkSession,
    clean: DataFrame,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    n_blocks: int = DEFAULT_N_BLOCKS,
    df_prune: int = DF_PRUNE,
    work_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Build postings/doc_stats/corpus_stats from a cleaned corpus.

    Evaluation discipline (this is where the 100 TB story lives):

      * ``docs`` (post-dedup, with assigned ids) is persisted ONCE — every
        downstream branch reuses the same materialization, so the simhash +
        doc-id assignment never re-runs and ids are consistent across
        branches by construction;
      * the expensive tokenize UDF is evaluated EXACTLY ONCE: the compact
        (term, doc_id, tf, positions_vb) aggregate is persisted and doc lengths
        are derived from it (``doc_len = Σ tf``) instead of re-tokenizing;
      * at cluster scale the persists become parquet segment writes — that
        is precisely the checkpoint.py path; this in-memory variant keeps
        the same single-evaluation structure.

    Returns DataFrames; callers persist via :func:`write_index` (or the
    segment/checkpoint path).  Call ``unpersist_index`` when done.
    """
    docs = assign_doc_ids(clean)

    # Map-side local index: the WHOLE cleaning+tokenize pipeline is ONE job
    # ending in a parquet write — no persist, no re-evaluation anywhere.
    # Length-capped docs (Q2/Q3) ride along with NULL text into the UDF,
    # which emits (aug_len=NULL, doc_len=0, postings=[]) for them: they stay
    # in N but out of the char sum and the index, exactly the reference
    # semantics.  Parquet (not .persist()): Spark's in-memory columnar cache
    # falls back to slow row-based access for nested array<struct> columns,
    # while parquet keeps nested reads vectorized — and this transient table
    # IS the per-segment artifact of the checkpointed build (checkpoint.py).
    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix="msengines_idx_")
    enriched_path = f"{work_dir}/enriched"
    (
        docs.withColumn(
            "dp",
            doc_postings_udf(
                "url",
                F.when(F.length("text") <= MAX_DOC_CHARS, F.col("text")),
            ),
        )
        .select(
            "doc_id", "url", "warc_ts",
            F.col("dp.aug_len").alias("aug_len"),
            F.col("dp.doc_len").alias("doc_len"),
            F.col("dp.postings").alias("postings"),
        )
        .write.mode("overwrite")
        .parquet(enriched_path)
    )
    enriched = spark.read.parquet(enriched_path)

    doc_stats = enriched.select("doc_id", "url", "warc_ts", "aug_len", "doc_len")

    # ONE stats job over the written parquet: N counts ALL cleaned docs even
    # length-capped ones (Q2/Q3); char sum skips them (NULL aug_len, Q1/Q2).
    # The same pass checks the doc_id collision invariant: doc_id =
    # xxhash64(url) merges two documents iff distinct urls exceed distinct
    # ids (birthday bound ≈ n²/2^65 expected colliding pairs — ~27k at
    # 10^12 docs; see functions/hashing.py).  Failing here beats silently
    # merging postings; escape hatches: assign_doc_ids(mode="dense") or a
    # wider two-column key.
    stats_row = enriched.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("aug_len").alias("chars"),
        F.countDistinct("url").alias("n_urls"),
        F.countDistinct("doc_id").alias("n_ids"),
    ).collect()[0]
    if stats_row.n_ids != stats_row.n_urls:
        raise ValueError(
            f"doc_id hash collision: {stats_row.n_urls} distinct urls map to "
            f"{stats_row.n_ids} distinct xxhash64 ids; rebuild with "
            "assign_doc_ids(mode='dense') or a wider key"
        )
    n_total, char_sum = stats_row.n, stats_row.chars or 0
    avg_doc_len = char_sum / n_total if n_total else 0.0
    corpus_stats = spark.createDataFrame(
        [(n_total, float(avg_doc_len))], "n_docs long, avg_doc_len double"
    )

    # Flatten to posting rows; doc_len rides along (no doc-stats join later).
    # This fat scan (blobs included) runs exactly ONCE — the df aggregation
    # uses its own narrow term-only scan (term_doc_frequency).
    postings_raw = enriched.select(
        "doc_id",
        "doc_len",
        F.explode("postings").alias("p"),
    ).select(
        "doc_id",
        "doc_len",
        F.col("p.term").alias("term"),
        F.col("p.tf").alias("tf"),
        F.col("p.positions_vb").alias("positions_vb"),
    )

    postings, blocks, terms = score_and_layout(
        postings_raw, n_total, avg_doc_len, term_buckets, n_blocks, df_prune,
        term_df=term_doc_frequency(enriched),
    )
    return {
        "postings": postings,
        "blocks": blocks,
        "terms": terms,
        "doc_stats": doc_stats,
        "corpus_stats": corpus_stats,
        "_enriched": enriched,
    }


def score_and_layout(
    postings_raw: DataFrame,
    n_total: int,
    avg_doc_len: float,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    n_blocks: int = DEFAULT_N_BLOCKS,
    df_prune: int = DF_PRUNE,
    term_df: DataFrame | None = None,
    broadcast_terms: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """df → IDF → df>5 prune → deferred-scoring block layout (pure JVM —
    positions arrive already varbyte-encoded from doc_postings_udf).

    Returns ``(postings, blocks, terms)`` where postings carry (tf, dl)
    and NO bm25 — consumers materialize it via :func:`bm25_expr` after
    their terms join (idf/avgdl ride the broadcast query-terms frame, see
    query.attach_scoring_stats).  Per-term attributes (df, idf) are
    NORMALIZED OUT of the fat postings table into the compact ``terms``
    table: repeating 8-byte per-term constants on every posting row
    inflated the layout shuffle + parquet by ~30% for values any consumer
    can re-join from a table 100× smaller (measured at 400k docs: 1.26 GB
    layout exchange with them).

    ``postings_raw`` must carry (term, doc_id, tf, positions_vb, doc_len).
    Callers holding the enriched segment table should pass
    ``term_df=term_doc_frequency(enriched)`` so the df pass reads only the
    term subfield; the fallback here derives df from ``postings_raw``
    itself, which re-evaluates that (possibly fat) subtree a second time.

    ``broadcast_terms``: hint the postings⨝terms join to broadcast.  The
    static planner cannot estimate the aggregated term table's size and
    plans a sort-merge join, which materializes a full shuffle of the fat
    posting rows before AQE's runtime broadcast conversion can kick in
    (measured: an 890 MB dead exchange at 400k docs).  Vocabulary grows
    sublinearly (Heaps' law): ~400k terms here, and an estimated few GB at
    10^12 docs — set False past ~10^10 docs and let AQE + skew-join handle
    the merge join instead.

    Block layout: ``block_id = pmod(doc_id, n_blocks)`` — a BOUNDED hash
    partition of each term's postings (≤ n_blocks per-block maxima per term)
    rather than classic contiguous doc ranges.  Contiguity only matters for
    a sequential pointer-walk WAND; the distributed formulation in wand.py
    needs only "every posting's score ≤ its block's max", which any doc
    partition provides — and because block_id depends on doc_id alone, a
    doc occupies the SAME block id across all terms, letting wand.py compute
    per-block upper bounds from the compact blocks table without touching
    postings.  Contiguous ranges were tried first and degenerate
    catastrophically under sparse hash doc ids (one posting per block ⇒
    blocks table as large as postings, zero pruning — observed as WAND
    slower than exhaustive at 400k docs).
    """
    if term_df is None:
        # Fallback: derive df from the posting rows themselves (same
        # two-level salted agg as term_doc_frequency, R5 head-term skew).
        salted = (
            postings_raw.withColumn(
                "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(DF_SALT))
            )
            .groupBy("term", "_salt")
            .agg(F.count(F.lit(1)).alias("_partial_df"))
        )
        term_df = salted.groupBy("term").agg(
            F.sum("_partial_df").alias("df")
        )

    pruned_terms = term_df.filter(F.col("df") > df_prune).withColumn(
        "idf",
        F.log(
            (F.lit(n_total) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ),
    )
    prune_side = pruned_terms.select("term")
    if broadcast_terms:
        prune_side = F.broadcast(prune_side)

    # DEFERRED SCORING (see bm25_expr): the layout stores (tf, dl) and NO
    # bm25 column — the df>5 prune is a LEFT SEMI join (no term attributes
    # ride on the fat posting rows at all), so the bucket exchange carries
    # 4 fewer bytes/row than the round-2 bm25 layout and, crucially, the
    # whole layout branch has NO dependence on corpus-global stats
    # (n_total/avgdl feed only the small terms/blocks tables).  That
    # independence is what lets build_index_pipelined overlap segment
    # tokenize (Python-CPU) with segment layout (shuffle/parquet,
    # DRAM-bound).
    layout = (
        postings_raw.join(prune_side, "term", "left_semi")
        .withColumn(
            "block_id",
            F.pmod(F.col("doc_id"), F.lit(n_blocks)).cast("int"),
        )
        .withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"),
        )
    )
    # Persisted layout stores ONLY the compressed blob (SURVEY schema),
    # already encoded upstream in doc_postings_udf.  Consumers decode via
    # proximity.min_span_score_vb_udf / codec.varbyte_decode_udf.  df/idf
    # live in the terms table, not on every posting row.
    postings = layout.select(
        "term_bucket",
        "term",
        "doc_id",
        "tf",
        F.col("doc_len").cast("int").alias("dl"),
        "positions_vb",
        "block_id",
    )

    # Block maxima: max over the idf-free length-normalized part g(tf, dl),
    # scaled by idf afterwards on the ALREADY-AGGREGATED (small) frame —
    # idf > 0 so max(idf·g) = idf·max(g).  The 1-ulp reassociation risk vs
    # the query-time idf·num/den order is absorbed by wand.py's relative
    # guard on every ub ≥ θ comparison.
    g = bm25_expr(
        F.lit(1.0), F.col("tf"), F.col("dl"), F.lit(float(avg_doc_len))
    )
    idf_side = pruned_terms.select("term", "idf")
    if broadcast_terms:
        idf_side = F.broadcast(idf_side)
    blocks = (
        postings.groupBy("term_bucket", "term", "block_id")
        .agg(F.max(g).alias("_max_g"))
        .join(idf_side, "term")
        .select(
            "term_bucket",
            "term",
            "block_id",
            (F.col("idf") * F.col("_max_g")).alias("block_max_bm25"),
        )
    )
    terms = pruned_terms.withColumn(
        "term_bucket",
        F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"),
    )
    return postings, blocks, terms


def write_index(
    index: dict[str, DataFrame],
    out_dir: str,
    cluster_terms: bool = False,
    write_salt: int = 1,
) -> None:
    """Persist the index tables (Iceberg-equivalent Parquet layout).

    postings are partitioned by ``term_bucket`` = bucket(K, term) so the
    query-time broadcast term join prunes to the buckets containing the query
    terms (SURVEY O-24 partition pruning).  Repartition on the bucket column
    first so each bucket gets one coherent file instead of
    (#tasks × #buckets) shards.

    ``cluster_terms``: additionally sortWithinPartitions(term) so each
    term's postings are contiguous in the bucket file — dictionary indices
    RLE away and term-equality scans skip pages via column-index stats.

    ``write_salt``: the bucket-keyed repartition caps the write stage at
    ≤ DEFAULT_TERM_BUCKETS (64) non-empty partitions — one reducer per
    bucket — fine up to ~64-way parallelism, a hard cap on a 1000-executor
    cluster.  write_salt=S shards each bucket across S reducers
    (partition key (term_bucket, xxhash64(doc_id) % S)), so write
    parallelism = buckets × S while every row still lands in its bucket's
    directory (S files per dir; readers glob the dir, pruning unchanged).
    Set S ≈ cluster_cores / DEFAULT_TERM_BUCKETS at scale; 1 (default)
    keeps the one-coherent-file-per-bucket local layout.
    """
    from concurrent.futures import ThreadPoolExecutor

    # The side tables are independent of the big postings job — submit them
    # from worker threads so the Spark scheduler interleaves their (small)
    # stages into slots the memory-bound postings exchange leaves idle,
    # instead of paying their job latencies serially afterwards.  Only the
    # blocks derivation orders after postings (it reads the written files —
    # a narrow columnar re-read beats re-evaluating the scoring subtree).
    def _write_postings() -> None:
        if write_salt > 1:
            p = index["postings"].repartition(
                F.col("term_bucket"),
                F.pmod(F.xxhash64("doc_id"), F.lit(write_salt)),
            )
        else:
            p = index["postings"].repartition("term_bucket")
        if cluster_terms:
            p = p.sortWithinPartitions("term")
        p.write.mode("overwrite").partitionBy("term_bucket").parquet(
            f"{out_dir}/postings"
        )

    def _write_side_tables() -> None:
        if "terms" in index:
            # Same bucket layout as postings (a global single-file write
            # would bottleneck at billion-term vocabularies).
            index["terms"].repartition("term_bucket").write.mode(
                "overwrite"
            ).partitionBy("term_bucket").parquet(f"{out_dir}/terms")
        index["doc_stats"].write.mode("overwrite").parquet(
            f"{out_dir}/doc_stats"
        )
        index["corpus_stats"].write.mode("overwrite").parquet(
            f"{out_dir}/corpus_stats"
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_post = pool.submit(_write_postings)
        f_side = pool.submit(_write_side_tables)
        f_post.result()
        f_side.result()
    write_blocks(index, out_dir)


def write_blocks(index: dict[str, DataFrame], out_dir: str) -> None:
    """(Re)derive the block-max table from the WRITTEN postings files (a
    narrow columnar re-read beats re-evaluating the scoring subtree) and
    the current terms/corpus_stats.  Under deferred scoring this is also
    the append-time refresh: after a corpus append changes idf/avgdl, only
    this small derived table (≤ |terms|·n_blocks rows) is recomputed — the
    fat postings stay untouched."""
    spark = index["postings"].sparkSession
    written = spark.read.parquet(f"{out_dir}/postings")
    if "bm25" in written.columns:  # legacy materialized-score layout
        blocks = written.groupBy("term_bucket", "term", "block_id").agg(
            F.max("bm25").alias("block_max_bm25")
        )
    else:
        avgdl = float(
            index["corpus_stats"].select("avg_doc_len").collect()[0][0]
        )
        g = bm25_expr(F.lit(1.0), F.col("tf"), F.col("dl"), F.lit(avgdl))
        blocks = (
            written.groupBy("term_bucket", "term", "block_id")
            .agg(F.max(g).alias("_max_g"))
            .join(F.broadcast(index["terms"].select("term", "idf")), "term")
            .select(
                "term_bucket",
                "term",
                "block_id",
                (F.col("idf") * F.col("_max_g")).alias("block_max_bm25"),
            )
        )
    blocks.write.mode("overwrite").parquet(f"{out_dir}/blocks")


def unpersist_index(index: dict[str, DataFrame]) -> None:
    """Release the persists taken by build_index (best-effort)."""
    for df in index.values():
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001
            pass


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """On-disk byte size of ``path`` via the Hadoop FS API (scheme-safe)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(hpath).getLength())


# Serving-cache split floor: below ~8 MB the per-split footer/task overhead
# outweighs the extra parallelism (measured on the 400k bench index).
_SERVE_SPLIT_FLOOR = 8 << 20


def read_index(
    spark: SparkSession, out_dir: str, serve: bool = False
) -> dict[str, DataFrame]:
    """Open a written index.  With ``serve=True`` the postings relation is
    returned CACHED AND MATERIALIZED with its scan splits sized to ~3
    partitions per session core (instead of the batch default 128 MB,
    which packs a multi-GB postings table into a handful of partitions and
    caps every cached-scan query stage at that parallelism — measured:
    the 400k-doc index cached as 12 partitions, idling 20 of 32 cores and
    flattening query-batch scaling).  Split sizing happens at scan
    EXECUTION time, so the cache is materialized inside the temporary
    conf window; no shuffle is involved.  On a real cluster the same
    holds per executor core via ``defaultParallelism``.

    Caveat (ADVICE r5): the conf window temporarily mutates the
    session-global ``spark.sql.files.maxPartitionBytes``; a query planned
    CONCURRENTLY on the same session during cache materialization would
    inherit the serve-sized splits.  Call from the session's single
    driver thread (every in-repo call site does), or scope it with
    ``spark.newSession()`` if serving must overlap other planning.
    """
    from pyspark.errors import AnalysisException

    if serve:
        sc = spark.sparkContext
        target = max(1, 3 * sc.defaultParallelism)
        split = max(
            _SERVE_SPLIT_FLOOR,
            _dir_bytes(spark, f"{out_dir}/postings") // target,
        )
        key = "spark.sql.files.maxPartitionBytes"
        old = spark.conf.get(key)
        spark.conf.set(key, str(split))
        try:
            postings = spark.read.parquet(f"{out_dir}/postings").cache()
            postings.count()  # splits are planned here, under the temp conf
        finally:
            spark.conf.set(key, old)
    else:
        postings = spark.read.parquet(f"{out_dir}/postings")

    index = {
        "postings": postings,
        "blocks": spark.read.parquet(f"{out_dir}/blocks"),
        "doc_stats": spark.read.parquet(f"{out_dir}/doc_stats"),
        "corpus_stats": spark.read.parquet(f"{out_dir}/corpus_stats"),
    }
    # Probe via the reader, not os.path: out_dir may be any Hadoop
    # filesystem scheme (hdfs://, s3a://) where a local isdir check would
    # silently drop the terms table for df/idf consumers.
    try:  # absent in pre-terms-table layouts
        index["terms"] = spark.read.parquet(f"{out_dir}/terms")
    except AnalysisException:
        pass
    return index
