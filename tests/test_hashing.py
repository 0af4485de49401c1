"""Vendored xxHash64 ↔ Spark xxhash64 parity (doc-id ground truth)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from modernsearchengines_spark.functions.hashing import (
    xxhash64_bytes,
    xxhash64_str,
)


def test_known_values_match_spark(spark):
    vals = [
        "", "a", "ab", "abc", "abcd", "hello world",
        "https://www.tuebingen.de/attractions/p1", "ü" * 5, "x" * 100,
        "q" * 31, "r" * 32, "s" * 33, "t" * 63, "u" * 64, "v" * 65,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r.s: r.h for r in df.collect()}
    for v in vals:
        assert got[v] == xxhash64_str(v), repr(v)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_xxhash64_deterministic_and_ranged(data):
    v = xxhash64_bytes(data)
    assert 0 <= v < (1 << 64)
    assert v == xxhash64_bytes(data)
