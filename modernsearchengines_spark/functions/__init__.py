"""Pure-Python text core shared between Spark Arrow UDFs and the oracle."""

from . import html_extract, porter, simhash, tokenizer  # noqa: F401
