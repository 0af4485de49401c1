"""Committed goldens (FIXTURES.md §4/§5): the oracle's output on the
deterministic 300-doc fixture is frozen in tests/goldens/*.json.  The parity
suite proves engine ≡ oracle; THIS suite proves oracle ≡ its historical
self, so a silent semantics change in the shared tokenizer/scoring can't
slip through by moving both sides together.

Plus property-based tokenizer invariants.
"""

from __future__ import annotations

import json
import math
import os

from hypothesis import given, settings
from hypothesis import strategies as st

import oracle
from modernsearchengines_spark.functions.tokenizer import CHUNK_LEN, tokenize
from modernsearchengines_spark.sources.docs import (
    REFERENCE_QUERIES,
    generate_docs,
)

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "goldens", "golden_reference_queries.json"
)


def test_oracle_matches_committed_goldens(corpus_rows):
    with open(GOLDEN_PATH) as fh:
        golden = json.load(fh)
    idx = oracle.build_index(oracle.clean_corpus(corpus_rows))
    assert idx.n_docs == golden["corpus"]["n_docs"]
    assert math.isclose(
        idx.avg_doc_len, golden["corpus"]["avg_doc_len"], abs_tol=1e-9
    )
    assert len(idx.postings) == golden["corpus"]["n_terms"]
    for qnum, text in REFERENCE_QUERIES:
        g = golden["queries"][str(qnum)]
        assert g["text"] == text
        res = oracle.run_query(idx, text)
        assert len(res) == g["n_results"]
        for want, got in zip(g["topk"], res):
            assert got.doc_id == want["doc_id"], (qnum, want["rank"])
            assert got.url == want["url"]
            assert math.isclose(got.score, want["score"], abs_tol=1e-9)
            assert math.isclose(got.bm25_sum, want["bm25_sum"], abs_tol=1e-9)
    for term, want in golden["postings_sample"].items():
        docs = idx.postings.get(term, {})
        assert len(docs) == want["df"], term
        sample = sorted(
            [
                (str(d), round(b, 12), p[:5])
                for d, (b, p) in docs.items()
            ]
        )[:5]
        assert [list(x) for x in sample] == [
            [s[0], s[1], s[2]] for s in want["sample"]
        ]


def test_goldens_fixture_is_deterministic():
    a = generate_docs(n_docs=50, seed=42)
    b = generate_docs(n_docs=50, seed=42)
    assert [(r["url"], r["text"]) for r in a] == [
        (r["url"], r["text"]) for r in b
    ]


# --------------------------------------------------------------------------
# property-based tokenizer invariants
# --------------------------------------------------------------------------
_TEXTS = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
        whitelist_characters="äöüß.-/,:()",
    ),
    max_size=400,
)


@settings(max_examples=150, deadline=None)
@given(_TEXTS)
def test_tokenize_invariants(text):
    toks = tokenize(text)
    for stem, pos in toks:
        assert stem == stem.strip() and stem != ""
        assert 0 <= pos < CHUNK_LEN
    # positions strictly increase within a (single-chunk) doc
    positions = [p for _, p in toks]
    assert positions == sorted(positions)


@settings(max_examples=100, deadline=None)
@given(_TEXTS)
def test_tokenize_unique_mode_is_first_occurrence_subsequence(text):
    full = tokenize(text)
    uniq = tokenize(text, only_unique_tokens=True)
    # unique-mode output = first occurrence of each stem, in order (Q15)
    seen = set()
    expected = []
    for stem, pos in full:
        if stem not in seen:
            seen.add(stem)
            expected.append((stem, pos))
    assert uniq == expected
