"""Snippet extraction (SURVEY O-46/O-72): most-relevant sentence per
(query, doc).

The reference (/root/reference/retrieval.py:376-404) sentence-splits the
document with NLTK, fits a per-document TF-IDF over sentences + query, and
returns the argmax-cosine sentence.  Neither NLTK nor sklearn is in this
environment, so this module implements the same observable contract with a
regex sentence splitter and an explicit per-document TF-IDF cosine — all
inside one Arrow-vectorized pandas UDF (the computation is inherently
per-(query, doc) and tiny: top-k docs only).

Dataflow: top-k results (qnum, doc_id, query_text) broadcast-joined to
doc texts → snippet UDF → (qnum, doc_id, snippet).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_SENT_RE = re.compile(r"(?<=[.!?])\s+")
_WORD_RE = re.compile(r"[a-z0-9]+")


def split_sentences(text: str) -> list[str]:
    """Regex sentence splitter standing in for nltk.sent_tokenize."""
    parts = [s.strip() for s in _SENT_RE.split(text) if s.strip()]
    return parts or ([text.strip()] if text.strip() else [])


def best_sentence(query: str, text: str) -> str:
    """Argmax TF-IDF-cosine sentence (reference get_relevant_snippet
    semantics: single-sentence docs returned directly; ties → first)."""
    sentences = split_sentences(text)
    if not sentences:
        return ""
    if len(sentences) == 1:
        return sentences[0]
    docs = [_WORD_RE.findall(s.lower()) for s in sentences]
    q_tokens = _WORD_RE.findall(query.lower())
    n = len(sentences) + 1  # sentences + query, as the reference fits
    df: Counter[str] = Counter()
    for toks in docs + [q_tokens]:
        df.update(set(toks))

    def tfidf(toks: list[str]) -> dict[str, float]:
        tf = Counter(toks)
        return {
            t: c * (math.log((1 + n) / (1 + df[t])) + 1.0)
            for t, c in tf.items()
        }

    qv = tfidf(q_tokens)
    qn = math.sqrt(sum(v * v for v in qv.values())) or 1.0
    best_i, best_score = 0, -1.0
    for i, toks in enumerate(docs):
        sv = tfidf(toks)
        dot = sum(v * qv.get(t, 0.0) for t, v in sv.items())
        norm = math.sqrt(sum(v * v for v in sv.values())) or 1.0
        score = dot / (norm * qn)
        if score > best_score:
            best_i, best_score = i, score
    return sentences[best_i]


@F.pandas_udf(StringType())
def snippet_udf(query: pd.Series, text: pd.Series) -> pd.Series:
    return pd.Series(
        [best_sentence(q or "", t or "") for q, t in zip(query, text)]
    )


def add_snippets(
    topk: DataFrame, docs: DataFrame, query_texts: DataFrame
) -> DataFrame:
    """Hydrate top-k results with snippets.

    ``topk``: (qnum, rank, doc_id, url, ...); ``docs``: (doc_id, text);
    ``query_texts``: (qnum, text) — both small sides broadcast.
    """
    q = query_texts.select("qnum", F.col("text").alias("_qtext"))
    return (
        topk.join(F.broadcast(q), "qnum")
        .join(docs.select("doc_id", F.col("text").alias("_dtext")), "doc_id")
        .withColumn("snippet", snippet_udf("_qtext", "_dtext"))
        .drop("_qtext", "_dtext")
    )
