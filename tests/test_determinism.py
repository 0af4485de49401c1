"""Determinism guarantees: doc ids unique & stable, index content identical
across rebuilds (guards the cross-branch recomputation hazard found in
benchmarking — doc ids must come from a single evaluation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from modernsearchengines_spark.operators import indexer


def test_doc_ids_unique_and_stable(spark, docs_df):
    clean = indexer.clean_docs(docs_df)
    a = indexer.assign_doc_ids(clean)
    assert a.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    m1 = {r.url: r.doc_id for r in a.select("url", "doc_id").collect()}
    b = indexer.assign_doc_ids(clean)
    m2 = {r.url: r.doc_id for r in b.select("url", "doc_id").collect()}
    assert m1 == m2


def test_index_rebuild_identical(spark, docs_df):
    clean = indexer.clean_docs(docs_df)

    def signature():
        idx = indexer.build_index(spark, clean)
        rows = idx["postings"].select("term", "doc_id", "tf", "dl").collect()
        sig = sorted((r.term, r.doc_id, r.tf, r.dl) for r in rows)
        indexer.unpersist_index(idx)
        return sig

    assert signature() == signature()
