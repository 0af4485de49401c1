"""build_index_pipelined ≡ classic build_index + write_index: identical
query results despite the unpruned segment layout (the df>5 prune moves to
query time via attach_scoring_stats inner semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from modernsearchengines_spark.operators import checkpoint, indexer, query, wand
from modernsearchengines_spark.operators.expansion import compile_query
from modernsearchengines_spark.sources.docs import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def classic_index(spark, docs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "classic")
    idx = indexer.build_index(spark, indexer.clean_docs(docs_df))
    indexer.write_index(idx, out)
    indexer.unpersist_index(idx)
    return indexer.read_index(spark, out)


@pytest.fixture(scope="module")
def pipelined_index(spark, docs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "pipelined")
    return checkpoint.build_index_pipelined(
        spark, indexer.clean_docs(docs_df), out, n_segments=3
    )


def _result_map(df):
    return {
        (r.qnum, r.rank): (r.doc_id, round(r.score, 12))
        for r in df.collect()
    }


def test_query_results_identical(spark, classic_index, pipelined_index):
    a = query.run_query_batch(spark, classic_index, REFERENCE_QUERIES)
    b = query.run_query_batch(spark, pipelined_index, REFERENCE_QUERIES)
    assert _result_map(a) == _result_map(b)


def test_payload_topk_identical(spark, classic_index, pipelined_index):
    compiled = [compile_query(q, t) for q, t in REFERENCE_QUERIES]
    outs = []
    for idx in (classic_index, pipelined_index):
        terms = query.query_terms_df(spark, compiled, index=idx)
        outs.append(
            {
                (r.qnum, r.rank): (r.doc_id, r.score)
                for r in wand.bm25_prox_topk_wand(
                    idx["postings"], idx["blocks"], terms, 25
                ).collect()
            }
        )
    assert outs[0].keys() == outs[1].keys()
    for key, (doc_a, score_a) in outs[0].items():
        doc_b, score_b = outs[1][key]
        assert doc_a == doc_b, key
        # Σ bm25 reduces in a different partial order over the per-segment
        # file layout — identical up to float-sum reassociation.
        assert math.isclose(score_a, score_b, rel_tol=0, abs_tol=1e-9), key


def test_terms_and_stats_identical(classic_index, pipelined_index):
    a = {
        r.term: (r.df, round(r.idf, 12))
        for r in classic_index["terms"].collect()
    }
    b = {
        r.term: (r.df, round(r.idf, 12))
        for r in pipelined_index["terms"].collect()
    }
    assert a == b
    ca = classic_index["corpus_stats"].collect()[0]
    cb = pipelined_index["corpus_stats"].collect()[0]
    assert ca.n_docs == cb.n_docs
    assert math.isclose(ca.avg_doc_len, cb.avg_doc_len, rel_tol=0, abs_tol=0)


def test_pipelined_layout_superset_and_prune_boundary(
    classic_index, pipelined_index
):
    """The pipelined store keeps df≤5 postings (unpruned layout); the
    classic store drops them — and on PRUNED terms both stores hold the
    same rows."""
    pruned = classic_index["postings"].select("term", "doc_id")
    unpruned = pipelined_index["postings"].select("term", "doc_id")
    missing = pruned.exceptAll(unpruned).count()
    assert missing == 0
    extra = unpruned.join(
        pipelined_index["terms"].select("term"), "term", "left_semi"
    ).exceptAll(pruned).count()
    assert extra == 0
