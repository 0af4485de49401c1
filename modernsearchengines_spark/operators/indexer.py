"""Distributed inverted-index build (SURVEY.md §3.1 rebuild lifecycle).

Pipeline (all Catalyst-planned; Python crosses the JVM boundary only inside
the Arrow-vectorized UDFs marked *):

    docs ──derive text from html (*extract)──filter(lang)──dedup(simhash*)
         ──assign dense doc_ids──filter(len ≤ 800k)──url-words(*)+concat
         ──tokenize(*)──posexplode──[shuffle (term,doc_id)]──tf/positions agg
         ──salted df agg [two-level, head-term skew R5]──IDF/BM25 column exprs
         ──df>5 prune──varbyte(*)+block stats──write bucketed by term

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

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.simhash import simhash64
from ..functions.tokenizer import tokenize, url_to_words
from .codec import varbyte_encode_udf

K1 = 1.5
B = 0.75
MAX_DOC_CHARS = 800_000
DF_PRUNE = 5
DEFAULT_TERM_BUCKETS = 64
DEFAULT_BLOCK_SIZE = 128  # postings per block-max WAND block
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
def clean_docs(docs: DataFrame, derive_text_from_html: bool = False) -> DataFrame:
    """English-only, simhash-deduped corpus (reference establish_workingDB,
    WebCrawler_basis.py:311-362; Q12: threshold 0.99 ⟺ exact hash match).

    Keep-first policy within a duplicate group: min (warc_ts, url) —
    deterministic stand-in for the reference's crawl-insertion order.
    """
    if derive_text_from_html:
        docs = docs.withColumn("text", extract_text_udf("html"))
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
def assign_doc_ids(docs: DataFrame, n_ranges: int = 32) -> DataFrame:
    """doc_id = dense 0-based rank of url, computed scalably.

    A global ``row_number() OVER (ORDER BY url)`` would single-partition at
    100 TB; instead: range-repartition by url, number rows within each sorted
    range, then add broadcast per-range offsets (two light shuffles, no
    global sort on one task).
    """
    ranged = (
        docs.repartitionByRange(n_ranges, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy("url")
    numbered = ranged.withColumn("_rn", F.row_number().over(w))
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
    return (
        numbered.join(F.broadcast(offsets), "_pid")
        .withColumn("doc_id", (F.col("_offset") + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )


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


def build_index(
    spark: SparkSession,
    clean: DataFrame,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    block_size: int = DEFAULT_BLOCK_SIZE,
    df_prune: int = DF_PRUNE,
) -> dict[str, DataFrame]:
    """Build postings/doc_stats/corpus_stats from a cleaned corpus.

    Returns unmaterialized DataFrames; callers persist via
    :func:`write_index` (or the segment/checkpoint path in checkpoint.py).
    """
    docs = assign_doc_ids(clean)

    # Q2/Q3 denominators: N counts ALL cleaned docs, even length-capped ones.
    n_total = docs.count()

    indexable = docs.filter(F.length("text") <= MAX_DOC_CHARS)
    tokens = tokenize_docs(indexable)

    # Doc stats: token-count doc_len (Q1) + char aug_len.
    doc_stats = tokens.groupBy("doc_id").agg(
        F.count("term").alias("doc_len"),
        F.first("aug_len").alias("aug_len"),
    )
    doc_stats = doc_stats.join(
        docs.select("doc_id", "url", "warc_ts"), "doc_id"
    )

    # avg_doc_len: char sum over indexed docs ÷ FULL corpus count (Q1/Q2).
    char_sum = doc_stats.agg(F.sum("aug_len")).collect()[0][0] or 0
    avg_doc_len = char_sum / n_total if n_total else 0.0
    corpus_stats = spark.createDataFrame(
        [(n_total, float(avg_doc_len))], "n_docs long, avg_doc_len double"
    )

    # (term, doc_id) postings: tf + positions in appearance order.
    postings_raw = tokens.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("tok_idx", "pos"))),
            lambda s: s["pos"],
        ).alias("positions"),
    )

    # Document frequency with explicit two-level salted aggregation: head
    # terms ("tuebingen" is in nearly every page by design, R5) would hot-spot
    # a single reducer; pre-aggregate per (term, salt), then merge. Exact.
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

    scored = (
        postings_raw.join(pruned_terms, "term")
        .join(doc_stats.select("doc_id", "doc_len"), "doc_id")
        .crossJoin(F.broadcast(corpus_stats.select("avg_doc_len")))
        .withColumn(
            "bm25",
            F.col("idf")
            * (F.col("tf") * (K1 + 1))
            / (
                F.col("tf")
                + K1 * (1 - B + B * (F.col("doc_len") / F.col("avg_doc_len")))
            ),
        )
        .drop("avg_doc_len")
    )

    # Block layout for block-max WAND: fixed-size doc_id-ordered blocks per
    # term with per-block max score. (Window shuffles by term; AQE skew
    # handling splits oversized head-term partitions.)
    w_term = Window.partitionBy("term").orderBy("doc_id")
    postings = (
        scored.withColumn(
            "block_id",
            ((F.row_number().over(w_term) - 1) / F.lit(block_size)).cast("int"),
        )
        .withColumn(
            "block_max_bm25",
            F.max("bm25").over(Window.partitionBy("term", "block_id")),
        )
        .withColumn("positions_vb", varbyte_encode_udf(F.array_sort("positions")))
        .withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"),
        )
    )
    return {
        "postings": postings,
        "doc_stats": doc_stats,
        "corpus_stats": corpus_stats,
    }


def write_index(index: dict[str, DataFrame], out_dir: str) -> None:
    """Persist the index tables (Iceberg-equivalent Parquet layout).

    postings are partitioned by ``term_bucket`` = bucket(K, term) so the
    query-time broadcast term join prunes to the buckets containing the query
    terms (SURVEY O-24 partition pruning).
    """
    index["postings"].write.mode("overwrite").partitionBy("term_bucket").parquet(
        f"{out_dir}/postings"
    )
    index["doc_stats"].write.mode("overwrite").parquet(f"{out_dir}/doc_stats")
    index["corpus_stats"].write.mode("overwrite").parquet(
        f"{out_dir}/corpus_stats"
    )


def read_index(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    return {
        "postings": spark.read.parquet(f"{out_dir}/postings"),
        "doc_stats": spark.read.parquet(f"{out_dir}/doc_stats"),
        "corpus_stats": spark.read.parquet(f"{out_dir}/corpus_stats"),
    }
