"""Shared string Column helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def unescape_scan(col: Column, escapes: dict[str, str]) -> Column:
    """Unescape backslash sequences in ONE left-to-right scan:
    tokenize into escape pairs / a trailing lone backslash /
    non-backslash runs, then map each escape token through
    ``escapes`` (e.g. {"\\\\n": "\\n"}). Unknown escapes and plain
    runs pass through verbatim.

    This is the sanctioned tokenizing form: a sentinel-substitution
    chain corrupts values that legitimately contain the sentinel
    byte, and an escape pair can never be re-interpreted because
    each input char is consumed by exactly one token. Shared by
    processor_string_replace's unquote and the Prometheus label
    parser (single copy — the two cannot drift)."""
    toks = F.regexp_extract_all(col, F.lit(r"(?s)(\\.|\\|[^\\]+)"), 1)

    def _map_tok(t: Column) -> Column:
        expr = t
        for esc, rep in escapes.items():
            expr = F.when(t == F.lit(esc), F.lit(rep)).otherwise(expr)
        return expr

    return F.array_join(F.transform(toks, _map_tok), "")
