"""Wireshark FT_* -> Spark type mapping and per-cell casting.

Replicates the reference's substring-based mapper and null-on-error cast
semantics (/root/reference/src/wireduck_extension.cpp:37-51, 201-237), with
the deviations documented in SURVEY.md §4.4:

- a failed cell nulls ONLY that cell (the reference abandons the rest of
  the row — an accident of a `break`),
- timestamps keep microsecond precision (the reference truncates to
  seconds via FromEpochSeconds),
- hex-formatted integers (e.g. udp.checksum "0x0000abcd") parse correctly
  (the reference's stoll returns 0 for them).

Deliberately replicated quirks: the `INT` substring rule claims string-ish
types like FT_UINT_STRING (mis-typed cells then degrade to NULL exactly
like the reference), FT_RELATIVE_TIME is typed TIMESTAMP, booleans parse
as `== "1"`, empty string -> NULL.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql.types import (
    BooleanType, DataType, DoubleType, LongType, StringType, TimestampType,
)


def map_ft_type(ft_type: str) -> DataType:
    """FT_* name -> Spark type (cpp:37-51 substring rules, same order)."""
    if "UINT" in ft_type or "INT" in ft_type:
        return LongType()
    if ft_type in ("FT_FLOAT", "FT_DOUBLE"):
        return DoubleType()
    if ft_type == "FT_BOOLEAN":
        return BooleanType()
    if ft_type in ("FT_ABSOLUTE_TIME", "FT_RELATIVE_TIME"):
        return TimestampType()
    return StringType()


def cast_cell(value: str | None, dtype: DataType):
    """Cast one tshark TSV cell to its Spark type; None on any failure
    (cpp:201-237 semantics, per-cell)."""
    if value is None or value == "":
        return None
    try:
        if isinstance(dtype, LongType):
            try:
                return int(value)
            except ValueError:
                # tshark prints some FT_UINT fields as hex (0x-prefixed only;
                # bare words must stay NULL, not parse as hex digits)
                if value[:2].lower() == "0x":
                    return int(value, 16)
                return None
        if isinstance(dtype, DoubleType):
            return float(value)
        if isinstance(dtype, BooleanType):
            # reference: value == "1" (cpp:214). Modern tshark 4.x prints
            # FT_BOOLEAN as "True"/"False" under -T fields, so the strict
            # replication made every set flag False on the tshark engine
            # while the native engine emitted correct bools (round-1
            # ADVICE). Accept both spellings; everything else is False,
            # matching the reference for "0"/garbage.
            return value in ("1", "True", "true")
        if isinstance(dtype, TimestampType):
            return datetime.fromtimestamp(float(value), tz=timezone.utc).replace(
                tzinfo=None
            )
        return value
    except (ValueError, OverflowError, OSError):
        return None
