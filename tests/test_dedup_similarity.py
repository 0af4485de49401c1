"""Dedup family + ANN similarity + streaming ingest tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modernsearchengines_spark.operators import dedup, indexer, similarity


@pytest.fixture(scope="module")
def docs(spark, docs_df):
    return docs_df


def test_simhash_dedup_removes_exact_dupes(spark, docs, corpus_rows):
    # Fixture appends 5 exact-duplicate pages under mirror urls.
    en = docs.filter(F.col("lang").startswith("en"))
    kept = dedup.simhash_dedup(en, "text", ["warc_ts", "url"])
    assert kept.count() < en.count()
    # Keep-first policy: no mirror copy survives when its source is present.
    kept_urls = {r.url for r in kept.select("url").collect()}
    mirrors = [u for u in kept_urls if u.startswith("https://mirror.example/")]
    assert mirrors == []


def test_exact_dedup_keeps_first(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, text string"
    )
    kept = dedup.exact_dedup(df, ["text"], ["id"])
    assert sorted(r.id for r in kept.collect()) == [1, 3]


def test_minhash_lsh_finds_near_duplicates(spark):
    base = "the castle by the river hosts a long summer festival with music"
    near = base + " tonight"
    other = "completely unrelated words about trains planes and markets"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    toks = dedup.tokens_df(df, "doc_id", "text")
    sigs = dedup.minhash_signatures(toks, "doc_id")
    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id")
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(toks, pairs, "doc_id").collect()
    }
    assert jac[(1, 2)] > 0.8


def test_ann_lsh_recall_vs_brute_force(spark):
    import random

    rng = random.Random(3)
    dim = 16
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(300)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = (
        vecs.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    exact = similarity.brute_force_topk(vecs, queries, k=5)
    approx = similarity.lsh_topk(vecs, queries, dim=dim, k=5, n_planes=4)
    exact_ids = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_ids = {(r.query_id, r.vec_id) for r in approx.collect()}
    # The query vector itself always shares its own bucket (cos=1 rank 1).
    for q in range(5):
        assert (q, q) in approx_ids
    recall = len(exact_ids & approx_ids) / len(exact_ids)
    assert recall >= 0.3  # approximate, bucketed — sanity floor


def test_cosine_near_dup_pairs(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.001, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    pairs = similarity.cosine_near_dup_pairs(vecs, 0.99, dim=4, n_planes=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) not in got


def test_streaming_ingest_foreachbatch(spark, docs_parquet, tmp_path):
    from modernsearchengines_spark.streaming.ingest import start_ingest

    import shutil

    schema = spark.read.parquet(docs_parquet).schema
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    shutil.copy(docs_parquet, in_dir / "part-0.parquet")
    stream = spark.readStream.schema(schema).parquet(str(in_dir))
    q = start_ingest(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out" / "raw_postings"))
    assert out.count() > 0
    assert {"term", "doc_id", "tf", "positions_vb"} <= set(out.columns)
