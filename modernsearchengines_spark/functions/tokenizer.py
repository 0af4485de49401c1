"""Vendored deterministic text-normalization + tokenization core.

Reimplements the *intended semantics* of the reference tokenize pipeline
(/root/reference/indexing.py:89-159: url_to_comma_separated_words,
convert_umlaute, substitute_dots_in_urls, tokenize) without spaCy/NLTK
(neither is in this environment; SURVEY.md §7 R2).  The spaCy
``en_core_web_sm`` tokenizer+lemmatizer is replaced by a rule-based regex
tokenizer, a vendored English stop list, and a small rule lemmatizer; the
Porter stemmer is vendored in :mod:`.porter`.

CRITICAL PARITY PROPERTY: this exact module is imported both by the Spark
Arrow UDFs (modernsearchengines_spark/operators/indexer.py) and by the
in-repo oracle (tests/oracle.py), so engine-vs-oracle rank-identity holds by
construction.

Replicated reference quirks (SURVEY.md §2.11):
  Q4  — URL words are prepended to the document text before tokenization.
  Q5  — positions are CHARACTER offsets into the normalized chunk (offsets
        reset every 800,000-char chunk), not token ordinals.
  Q15 — only_unique_tokens keeps the FIRST occurrence of each stem with its
        position.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

from . import porter

CHUNK_LEN = 800_000  # reference indexing.py:131 split_length

# ---------------------------------------------------------------------------
# Stop list — standard English stopword inventory (public domain; the classic
# ~180-word list used by NLTK/Lucene-style engines).  Stands in for spaCy's
# token.is_stop (reference indexing.py:148).
# ---------------------------------------------------------------------------
STOPWORDS = frozenset(
    """a about above after again against all am an and any are aren't as at
    be because been before being below between both but by can't cannot could
    couldn't did didn't do does doesn't doing don't down during each few for
    from further had hadn't has hasn't have haven't having he he'd he'll he's
    her here here's hers herself him himself his how how's i i'd i'll i'm
    i've if in into is isn't it it's its itself let's me more most mustn't my
    myself no nor not of off on once only or other ought our ours ourselves
    out over own same shan't she she'd she'll she's should shouldn't so some
    such than that that's the their theirs them themselves then there there's
    these they they'd they'll they're they've this those through to too under
    until up very was wasn't we we'd we'll we're we've were weren't what
    what's when when's where where's which while who who's whom why why's
    with won't would wouldn't you you'd you'll you're you've your yours
    yourself yourselves""".split()
)

_UMLAUTS = (("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("ß", "ss"))

# URL spans whose dots get blanked to spaces (reference indexing.py:119).
_URL_RE = re.compile(r"\b(?:https?://|www\.)[^\s]+\.[^\s]+\b")
_NUM_PAREN_RE = re.compile(r"(\d+)\)")
_NUM_COMMA_RE = re.compile(r"(\d+),(\d+)")
_NUM_ORD_RE = re.compile(r"(\d+)(st|nd|rd|th)")
_SEP_RE = re.compile(r"[\/\\_\-\–\+]+")
_WORD_DOT_RE = re.compile(r"(\b\w+)\.(\w+\b)")
_WS_RE = re.compile(r"\s+")

# Word tokenizer standing in for spaCy tokenization: alphanumeric runs
# (with internal apostrophes) are word tokens; any other non-space char is a
# single punctuation token (dropped below, mirroring token.is_punct).
_TOKEN_RE = re.compile(r"[a-z0-9]+(?:'[a-z0-9]+)*|[^\s]")
_IS_WORD_RE = re.compile(r"[a-z0-9]")

# Tiny irregular-lemma table standing in for spaCy token.lemma_ on the most
# frequent irregular English forms; regular inflection is left to the Porter
# stemmer which already strips -s/-ed/-ing.
_LEMMA_EXCEPTIONS = {
    "men": "man", "women": "woman", "children": "child", "people": "people",
    "feet": "foot", "teeth": "tooth", "mice": "mouse", "geese": "goose",
    "better": "well", "best": "good", "worse": "bad", "worst": "bad",
    "went": "go", "gone": "go", "made": "make", "said": "say", "seen": "see",
    "saw": "see", "taken": "take", "took": "take", "given": "give",
    "gave": "give", "found": "find", "left": "leave", "felt": "feel",
    "kept": "keep", "held": "hold", "told": "tell", "brought": "bring",
    "bought": "buy", "thought": "think", "caught": "catch", "built": "build",
    "sent": "send", "spent": "spend", "lost": "lose", "met": "meet",
    "paid": "pay", "ran": "run", "sat": "sit", "stood": "stand",
    "wrote": "write", "written": "write", "spoke": "speak", "spoken": "speak",
    "broke": "break", "broken": "break", "chose": "choose", "chosen": "choose",
    "drove": "drive", "driven": "drive", "ate": "eat", "eaten": "eat",
    "fell": "fall", "fallen": "fall", "flew": "fly", "flown": "fly",
    "grew": "grow", "grown": "grow", "knew": "know", "known": "know",
    "threw": "throw", "thrown": "throw", "wore": "wear", "worn": "wear",
    "won": "win", "began": "begin", "begun": "begin", "came": "come",
    "got": "get", "gotten": "get", "heard": "hear", "led": "lead",
    "read": "read", "meant": "mean", "slept": "sleep", "understood":
    "understand",
}


def lemmatize(token: str) -> str:
    """Rule-based lemma standing in for spaCy token.lemma_ (SURVEY R2)."""
    return _LEMMA_EXCEPTIONS.get(token, token)


def url_to_words(url: str) -> str:
    """Comma-separated words from a URL's host+path.

    Same observable behavior as the reference's URL-word extraction
    (indexing.py:89-105): parse, drop leading ``www.``, split host+path on
    ``[./-]+``, drop empties, join with ``", "``.
    """
    parsed = urlparse(url)
    host = parsed.netloc
    if host.startswith("www."):
        host = host[4:]
    parts = [p for p in re.split(r"[./\-]+", host + parsed.path) if p]
    return ", ".join(parts)


def _blank_url_dots(match: re.Match) -> str:
    return match.group(0).replace(".", " ")


def normalize(chunk: str) -> str:
    """Apply the reference's normalization cascade to one ≤800k chunk.

    Order is semantics-bearing and mirrors indexing.py:136-144:
    lower → umlaut transliteration → dots-in-URLs → ``N)``→``N`` →
    ``1,234``→``1234`` → ordinal-suffix strip → separator classes → space →
    ``a.b``→``a b`` → tab/newline → space → whitespace collapse + strip.
    """
    chunk = chunk.lower()
    for um, repl in _UMLAUTS:
        chunk = chunk.replace(um, repl)
    chunk = _URL_RE.sub(_blank_url_dots, chunk)
    chunk = _NUM_PAREN_RE.sub(r"\1", chunk)
    chunk = _NUM_COMMA_RE.sub(r"\1\2", chunk)
    chunk = _NUM_ORD_RE.sub(r"\1", chunk)
    chunk = _SEP_RE.sub(" ", chunk)
    chunk = _WORD_DOT_RE.sub(r"\1 \2", chunk)
    chunk = chunk.replace("\t", " ").replace("\n", " ").replace("\r", " ")
    return _WS_RE.sub(" ", chunk).strip()


# token→stem memo (Zipf vocabularies hit this constantly; porter.stem is the
# hot spot of the tokenize UDF).  Bounded; lives per Python worker process.
_STEM_CACHE: dict[str, str] = {}
_STEM_CACHE_MAX = 1 << 18


def tokenize(text: str, only_unique_tokens: bool = False) -> list[tuple[str, int]]:
    """``text → [(stem, char_offset)]`` with reference-parity semantics.

    Pipeline per 800k chunk (Q5: offsets are into the normalized chunk and
    reset per chunk): normalize → regex word split → drop stopwords and
    punctuation tokens → lemmatize → Porter stem → drop empties; with
    ``only_unique_tokens`` keep first occurrence per stem (Q15).
    """
    seen: set[str] = set()
    out: list[tuple[str, int]] = []
    cache = _STEM_CACHE
    for start in range(0, len(text), CHUNK_LEN):
        chunk = normalize(text[start : start + CHUNK_LEN])
        for m in _TOKEN_RE.finditer(chunk):
            tok = m.group(0)
            # The memo stores "" for dropped tokens (pure punctuation,
            # stopwords, empty stems), so a repeated token — the common
            # case under Zipf — costs ONE dict probe instead of a regex
            # search + set lookup + dict probe.  Output is identical.
            stemmed = cache.get(tok)
            if stemmed is None:
                if not _IS_WORD_RE.search(tok) or tok in STOPWORDS:
                    stemmed = ""
                else:
                    stemmed = porter.stem(lemmatize(tok)).strip()
                if len(cache) < _STEM_CACHE_MAX:
                    cache[tok] = stemmed
            if not stemmed:
                continue
            if only_unique_tokens:
                if stemmed in seen:
                    continue
                seen.add(stemmed)
            out.append((stemmed, m.start()))
    return out
