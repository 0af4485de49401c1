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


def test_predict_pipelined_win_parallelism_dependent():
    """The dispatch model reproduces the round-3 measurement pattern:
    long phases (low parallelism) -> overlap pays; short phases (high
    parallelism) -> fixed overheads dominate and classic wins."""
    from modernsearchengines_spark.operators.checkpoint import (
        auto_segments,
        predict_pipelined_win,
    )

    win_low, s_low, saving, cost = predict_pipelined_win(100.0, 100.0)
    assert win_low and saving > cost
    win_high, _, _, _ = predict_pipelined_win(12.0, 6.0)
    assert not win_high
    # Noise band (VERDICT r4 item 2): a thin predicted margin is NOT a
    # switch.  (100, 50) nets ~12% of the classic wall — saving > cost,
    # but below the 15% band the epoch variance swamps.
    win_thin, _, saving_t, cost_t = predict_pipelined_win(100.0, 50.0)
    assert saving_t > cost_t and not win_thin
    # The round-4 measured splits dispatch correctly under the band:
    # 8-core (66.5, 31.6) -> classic won the measurement, model says stay;
    # 32-core (43.9, 78.1) -> pipelined won by ~15%, model says switch.
    assert not predict_pipelined_win(66.5, 31.6)[0]
    assert predict_pipelined_win(43.9, 78.1)[0]
    assert 4 <= auto_segments(0.0) <= 16
    assert 4 <= auto_segments(1e6) <= 16
    assert auto_segments(50.0) >= auto_segments(5.0)


def test_build_index_auto_records_and_dispatches(spark, docs_df, tmp_path):
    """First build runs classic + records phase metrics; a rigged metrics
    file flips the dispatch to pipelined; force pins either strategy."""
    import json

    from modernsearchengines_spark.operators import checkpoint, indexer

    clean = indexer.clean_docs(docs_df)
    out = str(tmp_path / "auto_idx")
    mpath = str(tmp_path / "auto_metrics.json")

    idx = checkpoint.build_index_auto(spark, clean, out, metrics_path=mpath)
    n_classic = idx["postings"].count()  # materialize BEFORE the rebuild
    assert n_classic > 0
    metrics = json.loads(open(mpath).read())
    cores = str(spark.sparkContext.defaultParallelism)
    assert cores in metrics
    rec = metrics[cores]
    assert rec["tokenize_sec"] > 0 and rec["layout_sec"] >= 0
    assert rec["n_docs"] == clean.count()

    # rig long balanced phases -> the second build takes the pipelined
    # branch (net predicted saving clears the dispatch noise band)
    metrics[cores] = {"tokenize_sec": 120.0, "layout_sec": 80.0, "n_docs": rec["n_docs"]}
    open(mpath, "w").write(json.dumps(metrics))
    report2: dict = {}
    idx2 = checkpoint.build_index_auto(
        spark, clean, out, metrics_path=mpath, report=report2
    )
    assert report2["decision"] == "pipelined"
    assert report2["basis"] == "classic_model"
    # pipelined layout stores UNPRUNED postings (df prune at query time),
    # classic stores pruned -> row count reveals which branch ran
    assert idx2["postings"].count() >= n_classic
    assert (
        checkpoint.read_manifest(spark, out) == {}
    )  # pipelined path, not the checkpointed-manifest path

    # the pipelined run recorded its own wall + pre-pass into the sidecar;
    # the next dispatch has BOTH strategies measured and compares walls
    # directly (the rigged 200s classic vs the real few-second pipelined)
    metrics2 = json.loads(open(mpath).read())
    rec2 = metrics2[cores]
    assert rec2["pipelined_wall_sec"] > 0
    assert rec2["prepass_sec"] > 0
    report3: dict = {}
    checkpoint.build_index_auto(
        spark, clean, out, metrics_path=mpath, report=report3
    )
    assert report3["basis"] == "measured_both"
    assert report3["decision"] == "pipelined"

    # force overrides the metrics-based decision
    idx3 = checkpoint.build_index_auto(
        spark, clean, out, metrics_path=mpath, force="classic"
    )
    assert idx3["postings"].count() == n_classic
