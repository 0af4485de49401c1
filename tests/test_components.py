"""connected_components / dedup_by_components: cluster step of the dedup
ladder, verified against a driver-side union-find oracle on seeded random
graphs plus structured worst cases (chains force multi-round propagation).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from modernsearchengines_spark.operators.dedup import (
    connected_components,
    dedup_by_components,
)


def _uf_oracle(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    # canonical label = min member of each set
    comps = {}
    for x in list(parent):
        comps.setdefault(find(x), []).append(x)
    label = {}
    for members in comps.values():
        m = min(members)
        for x in members:
            label[x] = m
    return label


def _spark_components(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = connected_components(df).collect()
    return {r.id: r.component for r in got}


def test_chain_merges_transitively(spark):
    # a-b, b-c, c-d: one component even though (a,d) was never emitted
    got = _spark_components(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_needs_multiple_rounds(spark):
    # a 24-node path: diameter 23 forces repeated propagation rounds and
    # exercises the early-stop loop well past one iteration
    pairs = [(i, i + 1) for i in range(24)]
    got = _spark_components(spark, pairs)
    assert set(got.values()) == {0}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = 60
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _spark_components(spark, pairs) == _uf_oracle(pairs)


def test_dedup_by_components_keep_first(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}", i % 3) for i in range(8)],
        "doc_id long, text string, ord int",
    )
    # components: {0,1,2} via chain, {5,6}; 3,4,7 singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    kept = dedup_by_components(
        docs, pairs, "doc_id", ["ord"]
    ).collect()
    ids = sorted(r.doc_id for r in kept)
    # {0,1,2}: min ord = 0 at doc 0 (tie-break doc_id) -> keep 0
    # {5,6}: ord 2 at 5, ord 0 at 6 -> keep 6
    assert ids == [0, 3, 4, 6, 7]
    # schema passes through unchanged (no component column leaks)
    assert set(kept[0].asDict()) == {"doc_id", "text", "ord"}


def test_empty_pairs_passthrough(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    kept = dedup_by_components(docs, pairs, "doc_id", ["text"])
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]


def test_max_iter_exhaustion_warns(spark):
    """A max_iter too small for the graph's diameter must not return
    silently non-converged labels (ADVICE r5): the loop warns when it
    exits with changes still pending."""
    import warnings

    from modernsearchengines_spark.operators.dedup import (
        connected_components,
    )

    n = 24
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(pairs, max_iter=1).collect()
    assert any("max_iter" in str(w.message) for w in caught)
    # and a sufficient max_iter stays silent
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = connected_components(pairs).collect()
    assert not any("max_iter" in str(w.message) for w in caught)
    assert {r.component for r in labels} == {0}


def test_reliable_checkpoint_mode(spark, tmp_path):
    """reliable=True routes every per-round checkpoint through
    DataFrame.checkpoint() against the session checkpoint dir (VERDICT r5
    item 6: localCheckpoint blocks die with an executor on a real
    cluster); components must equal the local-mode result."""
    from modernsearchengines_spark.operators.dedup import (
        connected_components,
    )

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    rel = {(r.id, r.component)
           for r in connected_components(pairs, reliable=True).collect()}
    loc = {(r.id, r.component)
           for r in connected_components(pairs).collect()}
    assert rel == loc
    assert {c for _, c in rel} == {0, 20}
    # checkpoint files actually landed in the reliable dir
    import os
    assert any(os.scandir(str(tmp_path / "ckpt")))
