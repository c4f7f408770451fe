"""r14 protocol-breadth batch for the native dissector: SIP, SNMP,
syslog, TFTP, IGMP, SCTP, POP3, IMAP, and LLMNR (DNS wire format on
5355) — raising native coverage toward the reference's tshark surface
(Tier A gap #2) one well-gated dissector at a time. Each test drives
`iter_packets` over a synthetic capture and asserts the tshark-named
fields plus the frame.protocols chain; negative cases pin the
no-false-positive gates (an opaque payload on a claimed port must NOT
claim the protocol)."""

from __future__ import annotations

import struct

from pcap_fixtures import (
    build_eth_ipv4_raw, build_eth_ipv4_tcp, build_eth_ipv4_udp,
    build_pcap, dns_query_payload,
)
from wireduck_spark.sources.native import iter_packets


def _one(tmp_path, frame):
    p = tmp_path / "one.pcap"
    p.write_bytes(build_pcap([(1700000000.0, frame)]))
    [pkt] = list(iter_packets(str(p)))
    return pkt


def test_sip_request_and_response(tmp_path):
    invite = (
        b"INVITE sip:bob@example.com SIP/2.0\r\n"
        b"Via: SIP/2.0/UDP host\r\n"
        b"From: Alice <sip:alice@example.com>;tag=123\r\n"
        b"To: <sip:bob@example.com>\r\n"
        b"i: abc-call-id-1\r\n\r\n"
    )
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.2", 5060, 5060, invite))
    assert pkt["sip.Method"] == "INVITE"
    assert pkt["sip.Call-ID"] == "abc-call-id-1"
    assert pkt["sip.from.addr"] == "sip:alice@example.com"
    assert pkt["sip.to.addr"] == "sip:bob@example.com"
    assert pkt["frame.protocols"].endswith("udp:sip")

    ok = b"SIP/2.0 200 OK\r\nTo: <sip:bob@example.com>\r\n\r\n"
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.2", "10.0.0.1", 5060, 5060, ok))
    assert pkt["sip.Status-Code"] == 200

    # SIP rides TCP too
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.2", 40000, 5060, 1, 1, 0x18, invite))
    assert pkt["sip.Method"] == "INVITE"
    assert pkt["frame.protocols"].endswith("tcp:sip")

    # opaque payload on 5060 does not claim sip
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.2", 5060, 5060, b"\x00\x01\x02binary"))
    assert "sip" not in pkt["frame.protocols"]


def test_snmp_v2c_get_request(tmp_path):
    # SEQUENCE { INTEGER 1 (v2c), OCTET STRING "public", A0 ... }
    pdu_body = b"\x02\x01\x2a\x02\x01\x00\x02\x01\x00\x30\x00"
    body = (b"\x02\x01\x01" + b"\x04\x06public"
            + b"\xa0" + bytes([len(pdu_body)]) + pdu_body)
    snmp = b"\x30" + bytes([len(body)]) + body
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 50000, 161, snmp))
    assert pkt["snmp.version"] == 1  # wire value 1 == v2c
    assert pkt["snmp.community"] == "public"
    assert pkt["snmp.pdu_type"] == 0
    assert pkt["frame.protocols"].endswith("udp:snmp")

    # garbage on 161 does not claim snmp
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 50000, 161, b"not-ber-at-all"))
    assert "snmp" not in pkt["frame.protocols"]


def test_syslog_priority_split(tmp_path):
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.5", "10.0.0.6", 51000, 514,
        b"<134>myhost app: something happened"))
    assert pkt["syslog.facility"] == 16   # 134 >> 3 (local0)
    assert pkt["syslog.level"] == 6       # info
    assert pkt["syslog.msg"].startswith("myhost app:")
    assert pkt["frame.protocols"].endswith("udp:syslog")

    # out-of-range PRI is not syslog
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.5", "10.0.0.6", 51000, 514, b"<999>haha"))
    assert "syslog" not in pkt["frame.protocols"]


def test_tftp_read_and_write_requests(tmp_path):
    rrq = b"\x00\x01firmware.bin\x00octet\x00"
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.2", 49152, 69, rrq))
    assert pkt["tftp.opcode"] == 1
    assert pkt["tftp.source_file"] == "firmware.bin"
    assert pkt["tftp.type"] == "octet"
    assert pkt["frame.protocols"].endswith("udp:tftp")

    wrq = b"\x00\x02backup.cfg\x00netascii\x00"
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.2", 49152, 69, wrq))
    assert pkt["tftp.opcode"] == 2
    assert pkt["tftp.destination_file"] == "backup.cfg"


def test_igmp_membership_report(tmp_path):
    igmp = struct.pack(">BBH4s", 0x16, 0, 0,
                       bytes([239, 1, 2, 3]))
    pkt = _one(tmp_path, build_eth_ipv4_raw(
        "10.0.0.7", "239.1.2.3", 2, igmp))
    assert pkt["igmp.type"] == 0x16
    assert pkt["igmp.maddr"] == "239.1.2.3"
    assert pkt["frame.protocols"].endswith("ip:igmp")


def test_sctp_init_chunk(tmp_path):
    common = struct.pack(">HHII", 5000, 38412, 0, 0xDEADBEEF)
    init_chunk = struct.pack(">BBH", 1, 0, 20) + bytes(16)
    pkt = _one(tmp_path, build_eth_ipv4_raw(
        "10.0.0.1", "10.0.0.2", 132, common + init_chunk))
    assert pkt["sctp.srcport"] == 5000
    assert pkt["sctp.dstport"] == 38412
    assert pkt["sctp.verification_tag"] == 0
    assert pkt["sctp.chunk_type"] == 1
    assert pkt["frame.protocols"].endswith("ip:sctp")


def test_pop_and_imap_lines(tmp_path):
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.2", 40001, 110, 1, 1, 0x18, b"USER bob\r\n"))
    assert pkt["pop.request.command"] == "USER"
    assert pkt["frame.protocols"].endswith("tcp:pop")
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.2", "10.0.0.1", 110, 40001, 1, 1, 0x18,
        b"+OK ready\r\n"))
    assert pkt["pop.response.indicator"] == "+OK"

    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.2", 40002, 143, 1, 1, 0x18,
        b"a001 LOGIN bob hunter2\r\n"))
    assert pkt["imap.request.tag"] == "a001"
    assert pkt["imap.request.command"] == "LOGIN"
    assert pkt["frame.protocols"].endswith("tcp:imap")
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.2", "10.0.0.1", 143, 40002, 1, 1, 0x18,
        b"a001 OK LOGIN completed\r\n"))
    assert pkt["imap.response.status"] == "OK"
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.2", "10.0.0.1", 143, 40002, 1, 1, 0x18,
        b"* 18 EXISTS\r\n"))
    assert pkt["imap.response.status"] == "18"


def test_llmnr_reuses_dns_format(tmp_path):
    q = dns_query_payload("host.local", qtype=1, dns_id=0x4242)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "224.0.0.252", 52000, 5355, q))
    assert pkt["frame.protocols"].endswith("udp:llmnr")
    assert pkt["dns.qry.name"] == "host.local"


def test_new_protocols_resolve_in_glossary():
    """Every protocol the breadth batch can emit into frame.protocols
    has a glossary row, and every emitted field name is declared."""
    from wireduck_spark.sources.glossary import (
        BUILTIN_FIELDS, BUILTIN_PROTOCOLS)

    protos = {p.filter_name for p in BUILTIN_PROTOCOLS}
    for name in ("sip", "snmp", "syslog", "tftp", "igmp", "sctp",
                 "pop", "imap", "mdns", "llmnr"):
        assert name in protos, name
    declared = {f.filter_name for f in BUILTIN_FIELDS}
    for f in ("sip.Method", "sip.Status-Code", "sip.Call-ID",
              "sip.from.addr", "sip.to.addr", "snmp.version",
              "snmp.community", "snmp.pdu_type", "syslog.facility",
              "syslog.level", "syslog.msg", "tftp.opcode",
              "tftp.source_file", "tftp.destination_file", "tftp.type",
              "igmp.type", "igmp.max_resp", "igmp.maddr",
              "sctp.srcport", "sctp.dstport", "sctp.verification_tag",
              "sctp.chunk_type", "pop.request.command",
              "pop.response.indicator", "imap.request.tag",
              "imap.request.command", "imap.response.status"):
        assert f in declared, f
