"""Resume test (SURVEY §5.2 item 6): kill after a partial segment build,
resume, and assert the final index is identical to the single-shot build and
the ``_segments`` lineage carries per-partition metrics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from modernsearchengines_spark.operators import checkpoint, indexer


@pytest.fixture(scope="module")
def clean(spark, docs_df):
    return indexer.clean_docs(docs_df).cache()


def _index_signature(idx):
    rows = idx["postings"].select("term", "doc_id", "tf", "bm25").collect()
    return {(r.term, r.doc_id): (r.tf, round(r.bm25, 9)) for r in rows}


def test_partial_build_then_resume_identical(spark, clean, tmp_path):
    out = str(tmp_path / "segidx")
    n_segments = 4

    # Crash after 2 of 4 segments.
    result = checkpoint.build_index_checkpointed(
        spark, clean, out, n_segments=n_segments, fail_after=2
    )
    assert result is None
    manifest = checkpoint.read_manifest(out)
    assert len(manifest) == 2
    for row in manifest.values():
        assert row["status"] == "done"
        assert row["n_postings"] > 0 and row["n_tokens"] > 0
        assert row["wall_ms"] >= 0

    # Resume: only the remaining segments are built.
    result = checkpoint.build_index_checkpointed(
        spark, clean, out, n_segments=n_segments
    )
    assert result is not None
    manifest = checkpoint.read_manifest(out)
    assert sorted(manifest) == list(range(n_segments))

    # Lineage totals add up to the corpus.
    n_docs_total = sum(r["n_docs"] for r in manifest.values())
    assert n_docs_total == clean.count()

    # Identical to the single-shot build.
    single = indexer.build_index(spark, clean)
    assert _index_signature(result) == _index_signature(single)
    seg_stats = result["corpus_stats"].collect()[0]
    one_stats = single["corpus_stats"].collect()[0]
    assert seg_stats.n_docs == one_stats.n_docs
    assert math.isclose(
        seg_stats.avg_doc_len, one_stats.avg_doc_len, abs_tol=1e-9
    )


def test_resume_is_noop_when_complete(spark, clean, tmp_path):
    out = str(tmp_path / "segidx2")
    checkpoint.build_index_checkpointed(spark, clean, out, n_segments=2)
    docs = indexer.assign_doc_ids(clean)
    written = checkpoint.build_segments(spark, docs, out, n_segments=2)
    assert written == []  # nothing rebuilt


def test_segment_assignment_is_deterministic(spark, clean):
    a = (
        clean.select(checkpoint.segment_of(F.col("url"), 8).alias("s"), "url")
        .collect()
    )
    b = (
        clean.select(checkpoint.segment_of(F.col("url"), 8).alias("s"), "url")
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
