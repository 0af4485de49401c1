"""Vendored 64-bit SimHash (Charikar 2002, "Similarity estimation techniques
from rounding algorithms"), matching the shape the reference gets from the
``simhash`` PyPI package (/root/reference/WebCrawler_basis.py:269-273): token
4-gram shingles of the lowercased word sequence, md5-based feature hashes,
per-bit majority vote.

Deterministic and dependency-free; shared by the Spark dedup operator
(modernsearchengines_spark/operators/dedup.py) and tests.  The reference's
dedup threshold similarity > 0.99 over 64 bits is hamming distance 0, i.e.
exact hash equality (SURVEY.md Q12), so the distributed dedup is a group-by
on this value.
"""

from __future__ import annotations

import hashlib
import re

_WORD_RE = re.compile(r"[\wÀ-ɏ]+", re.UNICODE)
_WIDTH = 4  # token shingle width, as the simhash package default


try:  # vectorized bit-vote; exact same values as the pure-Python fallback
    import numpy as _np
except ImportError:  # pragma: no cover
    _np = None


def _hash64(data: str) -> int:
    return int.from_bytes(hashlib.md5(data.encode("utf-8")).digest()[:8], "big")


def simhash64(text: str) -> int:
    """64-bit simhash of ``text`` (unsigned)."""
    tokens = _WORD_RE.findall(text.lower())
    if not tokens:
        return 0
    shingles = (
        ["".join(tokens)]
        if len(tokens) < _WIDTH
        else ["".join(tokens[i : i + _WIDTH]) for i in range(len(tokens) - _WIDTH + 1)]
    )
    if _np is not None:
        # md5 per shingle stays (it defines the value); the 64-bit vote loop
        # is the hot path and vectorizes exactly.
        digests = b"".join(
            hashlib.md5(sh.encode("utf-8")).digest()[:8] for sh in shingles
        )
        bits = _np.unpackbits(
            _np.frombuffer(digests, dtype=_np.uint8).reshape(-1, 8), axis=1
        )  # row-major big-endian bits 63..0 of each hash
        votes = bits.sum(axis=0, dtype=_np.int64) * 2 - len(shingles)
        value = 0
        for i, v in enumerate(votes):  # bit i of output = bit (63-i) position
            if v > 0:
                value |= 1 << (63 - i)
        return value
    votes = [0] * 64
    for sh in shingles:
        h = _hash64(sh)
        for bit in range(64):
            votes[bit] += 1 if (h >> bit) & 1 else -1
    value = 0
    for bit in range(64):
        if votes[bit] > 0:
            value |= 1 << bit
    return value


def hamming64(a: int, b: int) -> int:
    """Bit-level hamming distance (reference WebCrawler_basis.py:275-277)."""
    return bin(a ^ b).count("1")
