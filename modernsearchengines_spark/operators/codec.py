"""Posting-list compression: docID-gap delta + variable-byte encoding.

Replaces the reference's JSON-text "compression" of position lists
(/root/reference/indexing.py:251 ``json.dumps(positions)``) with the classic
binary scheme (Witten/Moffat/Bell, "Managing Gigabytes"): sort-order deltas,
then each gap as a little-endian 7-bit varint with a continuation bit.

Exposed both as pure functions (oracle/tests) and as vectorized pandas UDFs
(Arrow batch transfer — no per-row Python in the Spark plan).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, IntegerType


def varbyte_encode(values: list[int]) -> bytes:
    """Delta+varbyte encode a non-decreasing int list (first value raw)."""
    out = bytearray()
    prev = 0
    for v in values:
        gap = v - prev
        prev = v
        if gap < 0:
            raise ValueError("varbyte_encode requires a non-decreasing list")
        while True:
            byte = gap & 0x7F
            gap >>= 7
            if gap:
                out.append(byte | 0x80)
            else:
                out.append(byte)
                break
    return bytes(out)


def varbyte_decode(data: bytes) -> list[int]:
    """Inverse of :func:`varbyte_encode`."""
    values: list[int] = []
    acc = 0
    shift = 0
    prev = 0
    for byte in data:
        acc |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            prev += acc
            values.append(prev)
            acc = 0
            shift = 0
    return values


@F.pandas_udf(BinaryType())
def varbyte_encode_udf(positions: pd.Series) -> pd.Series:
    return positions.map(
        lambda arr: varbyte_encode(sorted(int(x) for x in arr))
        if arr is not None
        else None
    )


@F.pandas_udf(ArrayType(IntegerType()))
def varbyte_decode_udf(blob: pd.Series) -> pd.Series:
    return blob.map(lambda b: varbyte_decode(bytes(b)) if b is not None else None)
