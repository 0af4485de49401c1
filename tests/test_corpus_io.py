"""Idempotent corpus append (SURVEY O-11: INSERT OR IGNORE by url)."""

from __future__ import annotations

import datetime as dt

from modernsearchengines_spark.sources.corpus_io import append_new_docs


def _docs(spark, urls):
    ts = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, ts, b"<html></html>", f"text of {u}", "en") for u in urls],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def test_append_then_ignore_duplicates(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    n1 = append_new_docs(spark, corpus, _docs(spark, ["u1", "u2", "u3"]))
    assert n1 == 3
    # re-running the same batch is a no-op (exactly-once by key)
    n2 = append_new_docs(spark, corpus, _docs(spark, ["u1", "u2", "u3"]))
    assert n2 == 0
    # mixed batch: only the new url lands
    n3 = append_new_docs(spark, corpus, _docs(spark, ["u2", "u4"]))
    assert n3 == 1
    final = spark.read.parquet(corpus)
    assert final.count() == 4
    assert {r.url for r in final.select("url").collect()} == {
        "u1", "u2", "u3", "u4",
    }


def test_append_dedups_within_batch(spark, tmp_path):
    corpus = str(tmp_path / "corpus2")
    df = _docs(spark, ["a", "a", "b"])
    assert append_new_docs(spark, corpus, df) == 2
