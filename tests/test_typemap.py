"""FT_* type mapping + per-cell casting (reference cpp:37-51, 201-237)."""

from datetime import datetime

from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, StringType, TimestampType,
)

from wireduck_spark.sources.typemap import cast_cell, map_ft_type


def test_integer_substring_rule():
    for ft in ("FT_UINT8", "FT_UINT64", "FT_INT32", "FT_FRAMENUM_UINT32"):
        assert isinstance(map_ft_type(ft), LongType)
    # deliberately replicated quirk: INT substring claims string-ish types
    assert isinstance(map_ft_type("FT_UINT_STRING"), LongType)


def test_other_mappings():
    assert isinstance(map_ft_type("FT_FLOAT"), DoubleType)
    assert isinstance(map_ft_type("FT_DOUBLE"), DoubleType)
    assert isinstance(map_ft_type("FT_BOOLEAN"), BooleanType)
    assert isinstance(map_ft_type("FT_ABSOLUTE_TIME"), TimestampType)
    assert isinstance(map_ft_type("FT_RELATIVE_TIME"), TimestampType)
    for ft in ("FT_STRING", "FT_BYTES", "FT_IPv4", "FT_IPv6", "FT_ETHER",
               "FT_NONE"):
        assert isinstance(map_ft_type(ft), StringType)


def test_cast_empty_is_null():
    for dtype in (LongType(), DoubleType(), BooleanType(), TimestampType(),
                  StringType()):
        assert cast_cell("", dtype) is None
        assert cast_cell(None, dtype) is None


def test_cast_long():
    assert cast_cell("42", LongType()) == 42
    assert cast_cell("-7", LongType()) == -7
    # hex-printed fields parse (deviation: reference stoll yields 0)
    assert cast_cell("0x1f", LongType()) == 31
    # parse failure -> NULL (per-cell, not whole-row)
    assert cast_cell("abc", LongType()) is None


def test_cast_double_bool_ts():
    assert cast_cell("1.5", DoubleType()) == 1.5
    assert cast_cell("x", DoubleType()) is None
    assert cast_cell("1", BooleanType()) is True
    assert cast_cell("0", BooleanType()) is False
    # tshark 4.x prints True/False under -T fields; both spellings accepted
    # (round-1 ADVICE — strict =="1" made set flags False on tshark engine)
    assert cast_cell("True", BooleanType()) is True
    assert cast_cell("true", BooleanType()) is True
    assert cast_cell("False", BooleanType()) is False
    ts = cast_cell("1448733575.25", TimestampType())
    assert ts == datetime(2015, 11, 28, 17, 59, 35, 250000)  # keeps sub-second
    assert cast_cell("nope", TimestampType()) is None
