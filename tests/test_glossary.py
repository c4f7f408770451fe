"""Glossary bootstrap + FetchSelectedFields schema-ordering semantics
(reference cpp:53-78 — SURVEY.md §7 calls this the easiest thing to get
subtly wrong)."""

from wireduck_spark.sources.glossary import (
    BUILTIN_FIELDS,
    DEFAULT_FIELDS,
    fetch_selected_fields,
    parse_fields_output,
    parse_protocols_output,
)

CANNED_FIELDS = """\
P\tFrame\tframe
F\tFrame Number\tframe.number\tFT_UINT32\tframe\tBASE_DEC\t0x0\tframe num
F\tEpoch time\tframe.time_epoch\tFT_ABSOLUTE_TIME\tframe\t\t0x0\tepoch
P\tTransmission Control Protocol\ttcp
F\tSource Port\ttcp.srcport\tFT_UINT16\ttcp\tBASE_DEC\t0x0\tport
F\tSource Port\ttcp.srcport\tFT_UINT16\ttcp\tBASE_DEC\t0x0\tdup row
"""


def test_parse_fields_keeps_F_rows_dedups():
    fields = parse_fields_output(CANNED_FIELDS)
    names = [f.filter_name for f in fields]
    assert names == ["frame.number", "frame.time_epoch", "tcp.srcport"]
    assert fields[2].field_type == "FT_UINT16"
    assert fields[2].protocol_filter_name == "tcp"


def test_parse_protocols():
    protos = parse_protocols_output("Frame\tFrame\tframe\tT\tT\tF\n")
    assert protos[0].filter_name == "frame"
    assert protos[0].can_enable is True
    assert protos[0].is_filterable is False


def test_default_schema_order():
    """No protocols option -> exactly the 5 defaults in README order."""
    sel = fetch_selected_fields([], BUILTIN_FIELDS)
    assert [f.filter_name for f in sel] == [
        "frame.time_epoch", "frame.number", "frame.len", "frame.protocols",
        "_ws.col.info",
    ]
    assert set(DEFAULT_FIELDS) == {f.filter_name for f in sel}


def test_protocol_order_frame_first_wscol_last():
    """protocols in argument order; frame fields first; _ws.col.info last
    (cpp:63-69 CASE ordering incl. NULL-sorts-last)."""
    sel = [f.filter_name for f in fetch_selected_fields(["udp", "tcp"],
                                                        BUILTIN_FIELDS)]
    assert sel[0] == "frame.time_epoch"
    assert sel[-1] == "_ws.col.info"
    udp_pos = [i for i, n in enumerate(sel) if n.startswith("udp.")]
    tcp_pos = [i for i, n in enumerate(sel) if n.startswith("tcp.")]
    assert udp_pos and tcp_pos
    assert max(udp_pos) < min(tcp_pos)  # udp requested before tcp


def test_unknown_protocol_yields_defaults_only():
    sel = fetch_selected_fields(["nosuchproto"], BUILTIN_FIELDS)
    assert len(sel) == 5
