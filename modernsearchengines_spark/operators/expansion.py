"""Query compilation: preprocess → Tübingen injection → expansion → stems.

Driver-side (queries are tiny; reference processes them single-threaded too).
Mirrors the reference query_processing / remove_stopwords_and_punctuation /
spellcheck stages (/root/reference/retrieval.py:120-175,333-359) with the
model-dependent stages frozen to fixture maps (SURVEY R3): BERT fill-mask
synonym expansion (O-80) and pyspellchecker (O-77) are non-deterministic
external models not present in this environment, so both are pluggable
callables defaulting to deterministic fixtures.  The oracle (tests/oracle.py)
uses THE SAME compile path, making goldens well-defined.

Deterministic deviation from the reference (documented): the reference joins
Python *sets* into the extended-query string, so token order is
hash-iteration order; here the sets are sorted before joining (affects only
accumulation order of float sums, not the set of matched postings).
"""

from __future__ import annotations

import string
from dataclasses import dataclass

from ..functions.tokenizer import STOPWORDS, tokenize

# Reference scoring constants (retrieval.py:25,126,156-157) — data, not code.
TUEBINGEN_TERMS: list[str] = [
    "tuebingen", "tuebing", "hohentuebingen", "waldhaeus", "oesterberg",
    "derendingen", "derending", "lustnau", "lustnauer", "pfrondorf",
    "wilhelmstr", "wilhelmstrass", "72070", "72072", "72074", "72076",
]
WORDS_TO_FILTER = frozenset(
    {"good", "nice", "okay", "sensible", "popular", "frequented",
     "recommend", "recommended", "competent"}
)
EXPANSION_SKIP = WORDS_TO_FILTER | {
    "tübingen", "renowned", "bad", "unpleasant", "pleasant",
}

EXPANSION_FIXTURE: dict[str, list[str]] = {
    "attractions": ["museum", "castle", "tour", "sight", "landmark"],
    "attraction": ["museum", "castle", "tour"],
    "food": ["restaurant", "meal", "cuisine", "dish", "bakery"],
    "drinks": ["beer", "wine", "coffee", "bar"],
    "castle": ["fortress", "palace"],
    "river": ["neckar", "water"],
}

SPELLCHECK_FIXTURE: dict[str, str] = {
    "tubingen": "tübingen",
    "atractions": "attractions",
    "restuarant": "restaurant",
    "fod": "food",
}


def preprocess_query(text: str) -> str:
    """Lower + stopword/punct strip, non-empty fallback (O-21/O-78, Q-free
    except deterministic sorted order; reference retrieval.py:120-144)."""
    punct = set(string.punctuation)
    words = text.split()
    filtered = {
        w.lower().strip(string.punctuation)
        for w in words
        if w.lower() not in STOPWORDS and w not in punct and w.lower()
    }
    filtered.discard("")
    better = {w for w in filtered if w not in WORDS_TO_FILTER}
    chosen = filtered if not better else better
    return " ".join(sorted(chosen))


def spellcheck(text: str, fixture: dict[str, str] | None = None) -> str:
    """Frozen-fixture spellcheck (O-77)."""
    table = SPELLCHECK_FIXTURE if fixture is None else fixture
    return " ".join(table.get(w, w) for w in text.split())


@dataclass(frozen=True)
class CompiledQuery:
    qnum: int
    text: str
    terms: tuple[str, ...]           # unique stems of the extended query (Q15)
    original_terms: tuple[str, ...]  # unique stems of the preprocessed query


def compile_query(
    qnum: int,
    text: str,
    expansion: dict[str, list[str]] | None = None,
) -> CompiledQuery:
    """Reference query_processing with frozen expansion (Q14/Q15)."""
    table = EXPANSION_FIXTURE if expansion is None else expansion
    pre = preprocess_query(text)
    words = pre.split()
    n_syn = max(0, 9 - len(words))
    extended = set(words) | set(TUEBINGEN_TERMS)
    if n_syn > 0:
        for w in words + TUEBINGEN_TERMS:
            if w in EXPANSION_SKIP or w in TUEBINGEN_TERMS:
                continue
            extended.update(table.get(w, [])[:n_syn])
    extended_query = preprocess_query(" ".join(sorted(extended)))
    terms = tuple(t for t, _ in tokenize(extended_query, only_unique_tokens=True))
    original = tuple(t for t, _ in tokenize(pre, only_unique_tokens=True))
    return CompiledQuery(qnum, text, terms, original)
