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


# ---------------------------------------------------------------------------
# Breadth batch 2: SMB/SMB2, Modbus/TCP, MQTT, TPKT/X.224 (RDP),
# RADIUS, OSPF, WireGuard.
# ---------------------------------------------------------------------------


def test_smb2_negotiate_and_smb1(tmp_path):
    smb2 = (b"\xfeSMB" + b"\x40\x00"        # header length 64
            + b"\x00\x00"                    # credit charge
            + b"\x00\x00\x00\x00"            # status
            + b"\x00\x00"                    # command 0 = NEGOTIATE
            + b"\x00\x00"                    # credits
            + b"\x01\x00\x00\x00"            # flags: response
            + b"\x00\x00\x00\x00"            # next command
            + (0x2A).to_bytes(8, "little")   # message id
            + bytes(8)                       # reserved/tree id
            + (0xBEEF).to_bytes(8, "little")  # session id
            + bytes(16))                     # signature
    nbss = b"\x00" + len(smb2).to_bytes(3, "big") + smb2
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.2", "10.0.0.1", 445, 40003, 1, 1, 0x18, nbss))
    assert pkt["smb2.cmd"] == 0
    assert pkt["smb2.flags.response"] is True
    assert pkt["smb2.msg_id"] == 0x2A
    assert pkt["smb2.sesid"] == 0xBEEF
    assert pkt["frame.protocols"].endswith("tcp:smb2")

    smb1 = b"\xffSMB" + bytes([0x72]) + bytes(27)
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.2", 40003, 445, 1, 1, 0x18, smb1))
    assert pkt["smb.cmd"] == 0x72
    assert pkt["frame.protocols"].endswith("tcp:smb")


def test_modbus_read_holding_registers(tmp_path):
    mbap = struct.pack(">HHHB", 7, 0, 6, 1)      # trans 7, proto 0, len 6
    pdu = struct.pack(">BHH", 3, 0, 10)           # fc3 read 10 regs @0
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40004, 502, 1, 1, 0x18, mbap + pdu))
    assert pkt["mbtcp.trans_id"] == 7
    assert pkt["mbtcp.unit_id"] == 1
    assert pkt["modbus.func_code"] == 3
    assert pkt["frame.protocols"].endswith("tcp:mbtcp")

    # nonzero protocol id is not modbus
    bad = struct.pack(">HHHB", 7, 9, 6, 1) + pdu
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40004, 502, 1, 1, 0x18, bad))
    assert "mbtcp" not in pkt["frame.protocols"]


def test_mqtt_connect(tmp_path):
    var = (b"\x00\x04MQTT"          # protocol name
           + b"\x04"                # level 4 (3.1.1)
           + b"\x02"                # flags: clean session
           + b"\x00\x3c"            # keepalive 60
           + b"\x00\x08sensor42")   # client id
    fixed = b"\x10" + bytes([len(var)])
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40005, 1883, 1, 1, 0x18, fixed + var))
    assert pkt["mqtt.msgtype"] == 1
    assert pkt["mqtt.protoname"] == "MQTT"
    assert pkt["mqtt.clientid"] == "sensor42"
    assert pkt["frame.protocols"].endswith("tcp:mqtt")

    # random binary on 1883 whose 'protocol name' isn't MQTT: unclaimed
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40005, 1883, 1, 1, 0x18,
        b"\x10\x08\x00\x04ABCD\x04\x02"))
    assert "mqtt" not in pkt["frame.protocols"]


def test_tpkt_x224_connection_request(tmp_path):
    cotp = b"\x06\xe0\x00\x00\x00\x00\x00"   # LI 6, CR
    tpkt = b"\x03\x00" + (4 + len(cotp)).to_bytes(2, "big") + cotp
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40006, 3389, 1, 1, 0x18, tpkt))
    assert pkt["tpkt.version"] == 3
    assert pkt["x224.type"] == 0xE
    assert pkt["frame.protocols"].endswith("tcp:tpkt")


def test_radius_access_request(tmp_path):
    pkt_bytes = struct.pack(">BBH", 1, 5, 20) + bytes(16)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 50001, 1812, pkt_bytes))
    assert pkt["radius.code"] == 1
    assert pkt["radius.id"] == 5
    assert pkt["radius.length"] == 20
    assert pkt["frame.protocols"].endswith("udp:radius")

    # declared length mismatch is not radius
    bad = struct.pack(">BBH", 1, 5, 99) + bytes(16)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 50001, 1812, bad))
    assert "radius" not in pkt["frame.protocols"]


def test_ospf_hello(tmp_path):
    hdr = (b"\x02\x01" + (44).to_bytes(2, "big")
           + bytes([10, 0, 0, 1])      # router id
           + bytes([0, 0, 0, 0])       # area id (backbone)
           + bytes(8))                 # checksum/auth
    pkt = _one(tmp_path, build_eth_ipv4_raw(
        "10.0.0.1", "224.0.0.5", 89, hdr + bytes(20)))
    assert pkt["ospf.version"] == 2
    assert pkt["ospf.msg"] == 1
    assert pkt["ospf.srcrouter"] == "10.0.0.1"
    assert pkt["ospf.area_id"] == "0.0.0.0"
    assert pkt["frame.protocols"].endswith("ip:ospf")


def test_wireguard_handshake_and_transport(tmp_path):
    init = b"\x01\x00\x00\x00" + (7).to_bytes(4, "little") + bytes(140)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 50002, 51820, init))
    assert pkt["wg.type"] == 1 and pkt["wg.sender"] == 7
    assert pkt["frame.protocols"].endswith("udp:wg")

    resp = (b"\x02\x00\x00\x00" + (9).to_bytes(4, "little")
            + (7).to_bytes(4, "little") + bytes(80))
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.9", "10.0.0.1", 51820, 50002, resp))
    assert pkt["wg.sender"] == 9 and pkt["wg.receiver"] == 7

    data = b"\x04\x00\x00\x00" + (9).to_bytes(4, "little") + bytes(24)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 50002, 51820, data))
    assert pkt["wg.type"] == 4 and pkt["wg.receiver"] == 9

    # nonzero reserved bytes are not wireguard
    bad = b"\x01\x01\x00\x00" + bytes(144)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 50002, 51820, bad))
    assert "wg" not in pkt["frame.protocols"]


def test_batch2_protocols_resolve_in_glossary():
    from wireduck_spark.sources.glossary import (
        BUILTIN_FIELDS, BUILTIN_PROTOCOLS)

    protos = {p.filter_name for p in BUILTIN_PROTOCOLS}
    for name in ("smb", "smb2", "mbtcp", "modbus", "mqtt", "tpkt",
                 "x224", "radius", "ospf", "wg"):
        assert name in protos, name
    declared = {f.filter_name for f in BUILTIN_FIELDS}
    for f in ("smb.cmd", "smb2.cmd", "smb2.flags.response",
              "smb2.msg_id", "smb2.sesid", "mbtcp.trans_id",
              "mbtcp.unit_id", "modbus.func_code", "mqtt.msgtype",
              "mqtt.protoname", "mqtt.clientid", "tpkt.version",
              "tpkt.length", "x224.type", "radius.code", "radius.id",
              "radius.length", "ospf.version", "ospf.msg",
              "ospf.srcrouter", "ospf.area_id", "wg.type", "wg.sender",
              "wg.receiver"):
        assert f in declared, f


# ---------------------------------------------------------------------------
# Breadth batch 3: BGP, RTSP, LDAP, Telnet, DNS over TCP.
# ---------------------------------------------------------------------------


def test_bgp_open_and_keepalive(tmp_path):
    marker = b"\xff" * 16
    open_msg = (marker + (29).to_bytes(2, "big") + b"\x01"
                + b"\x04" + (65001).to_bytes(2, "big")
                + (180).to_bytes(2, "big") + bytes([10, 0, 0, 1])
                + b"\x00")
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.2", 40010, 179, 1, 1, 0x18, open_msg))
    assert pkt["bgp.type"] == 1
    assert pkt["bgp.open.version"] == 4
    assert pkt["bgp.open.myas"] == 65001
    assert pkt["bgp.open.identifier"] == "10.0.0.1"
    assert pkt["frame.protocols"].endswith("tcp:bgp")

    keepalive = marker + (19).to_bytes(2, "big") + b"\x04"
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.2", 40010, 179, 1, 1, 0x18, keepalive))
    assert pkt["bgp.type"] == 4

    # a broken marker is not BGP
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.2", 40010, 179, 1, 1, 0x18,
        b"\xff" * 15 + b"\x00" + (19).to_bytes(2, "big") + b"\x04"))
    assert "bgp" not in pkt["frame.protocols"]


def test_rtsp_request_and_reply(tmp_path):
    req = b"SETUP rtsp://cam1/track1 RTSP/1.0\r\nCSeq: 3\r\n\r\n"
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40011, 554, 1, 1, 0x18, req))
    assert pkt["rtsp.method"] == "SETUP"
    assert pkt["rtsp.url"] == "rtsp://cam1/track1"
    assert pkt["frame.protocols"].endswith("tcp:rtsp")

    resp = b"RTSP/1.0 200 OK\r\nCSeq: 3\r\n\r\n"
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.9", "10.0.0.1", 554, 40011, 1, 1, 0x18, resp))
    assert pkt["rtsp.status"] == 200


def test_ldap_bind_request(tmp_path):
    bind = b"\x60\x07\x02\x01\x03\x04\x00\x80\x00"
    msg = b"\x30" + bytes([3 + len(bind)]) + b"\x02\x01\x01" + bind
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40012, 389, 1, 1, 0x18, msg))
    assert pkt["ldap.messageID"] == 1
    assert pkt["ldap.protocolOp"] == 0x60
    assert pkt["frame.protocols"].endswith("tcp:ldap")

    # non-BER on 389 stays unclaimed
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40012, 389, 1, 1, 0x18, b"hello ldap"))
    assert "ldap" not in pkt["frame.protocols"]


def test_telnet_iac_negotiation(tmp_path):
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40013, 23, 1, 1, 0x18,
        b"\xff\xfd\x18\xff\xfb\x03"))   # DO terminal-type, WILL sga
    assert pkt["telnet.cmd"] == 0xFD
    assert pkt["telnet.opt"] == 0x18
    assert pkt["frame.protocols"].endswith("tcp:telnet")

    # raw keystrokes on 23 stay opaque (no false positive)
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40013, 23, 1, 1, 0x18, b"ls -la\r\n"))
    assert "telnet" not in pkt["frame.protocols"]


def test_dns_over_tcp_length_prefix(tmp_path):
    q = dns_query_payload("big.example.com", qtype=252)  # AXFR
    framed = len(q).to_bytes(2, "big") + q
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40014, 53, 1, 1, 0x18, framed))
    assert pkt["dns.qry.name"] == "big.example.com"
    assert pkt["frame.protocols"].endswith("tcp:dns")


def test_batch3_protocols_resolve_in_glossary():
    from wireduck_spark.sources.glossary import (
        BUILTIN_FIELDS, BUILTIN_PROTOCOLS)

    protos = {p.filter_name for p in BUILTIN_PROTOCOLS}
    for name in ("bgp", "rtsp", "ldap", "telnet"):
        assert name in protos, name
    declared = {f.filter_name for f in BUILTIN_FIELDS}
    for f in ("bgp.length", "bgp.type", "bgp.open.version",
              "bgp.open.myas", "bgp.open.identifier", "rtsp.method",
              "rtsp.url", "rtsp.status", "ldap.messageID",
              "ldap.protocolOp", "telnet.cmd", "telnet.opt"):
        assert f in declared, f


# ---------------------------------------------------------------------------
# Breadth batch 4: HTTP/2 preface, MySQL, PostgreSQL, Redis, AMQP.
# ---------------------------------------------------------------------------


def test_http2_connection_preface(tmp_path):
    preface = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
    settings = b"\x00\x00\x0c\x04\x00\x00\x00\x00\x00" + bytes(12)
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40020, 8443, 1, 1, 0x18,
        preface + settings))
    assert pkt["http2.type"] == 4          # SETTINGS
    assert pkt["http2.length"] == 12
    assert pkt["http2.streamid"] == 0
    assert pkt["frame.protocols"].endswith("tcp:http2")


def test_mysql_server_greeting(tmp_path):
    body = b"\x0a" + b"8.0.36\x00" + bytes(20)
    greeting = len(body).to_bytes(3, "little") + b"\x00" + body
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.9", "10.0.0.1", 3306, 40021, 1, 1, 0x18, greeting))
    assert pkt["mysql.protocol"] == 10
    assert pkt["mysql.version"] == "8.0.36"
    assert pkt["frame.protocols"].endswith("tcp:mysql")

    # opaque binary on 3306 stays unclaimed
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.9", "10.0.0.1", 3306, 40021, 1, 1, 0x18,
        b"\x01\x02\x03\x04\x05\x06\x07\x08"))
    assert "mysql" not in pkt["frame.protocols"]


def test_pgsql_sslrequest_and_startup(tmp_path):
    ssl_req = (8).to_bytes(4, "big") + (80877103).to_bytes(4, "big")
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40022, 5432, 1, 1, 0x18, ssl_req))
    assert pkt["pgsql.length"] == 8 and pkt["pgsql.frontend"] is True
    assert pkt["frame.protocols"].endswith("tcp:pgsql")

    params = b"user\x00alice\x00database\x00app\x00\x00"
    startup = ((8 + len(params)).to_bytes(4, "big")
               + (196608).to_bytes(4, "big") + params)
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40022, 5432, 1, 1, 0x18, startup))
    assert pkt["pgsql.length"] == 8 + len(params)


def test_redis_resp_command(tmp_path):
    req = b"*3\r\n$3\r\nSET\r\n$3\r\nfoo\r\n$3\r\nbar\r\n"
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40023, 6379, 1, 1, 0x18, req))
    assert pkt["redis.command"] == "SET"
    assert pkt["frame.protocols"].endswith("tcp:redis")

    # a lone '*' line (not RESP grammar) stays unclaimed
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40023, 6379, 1, 1, 0x18,
        b"*** hello ***\r\n"))
    assert "redis" not in pkt["frame.protocols"]


def test_amqp_protocol_header(tmp_path):
    hdr = b"AMQP\x00\x00\x09\x01"
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40024, 5672, 1, 1, 0x18, hdr))
    assert pkt["amqp.version.major"] == 0
    assert pkt["amqp.version.minor"] == 9
    assert pkt["frame.protocols"].endswith("tcp:amqp")


def test_batch4_protocols_resolve_in_glossary():
    from wireduck_spark.sources.glossary import (
        BUILTIN_FIELDS, BUILTIN_PROTOCOLS)

    protos = {p.filter_name for p in BUILTIN_PROTOCOLS}
    for name in ("http2", "mysql", "pgsql", "redis", "amqp"):
        assert name in protos, name
    declared = {f.filter_name for f in BUILTIN_FIELDS}
    for f in ("http2.length", "http2.type", "http2.streamid",
              "mysql.protocol", "mysql.version", "pgsql.length",
              "pgsql.frontend", "redis.command", "amqp.version.major",
              "amqp.version.minor"):
        assert f in declared, f


# ---------------------------------------------------------------------------
# Breadth batch 5: DTLS, GTP-U (+decap), Kerberos, NBNS, RIP.
# ---------------------------------------------------------------------------


def test_dtls_handshake_any_port(tmp_path):
    body = bytes(40)
    rec = (b"\x16\xfe\xfd" + bytes(2) + bytes(6)
           + len(body).to_bytes(2, "big") + body)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 49999, 60001, rec))  # random ports
    assert pkt["dtls.record.content_type"] == 22
    assert pkt["dtls.record.version"] == 0xFEFD
    assert pkt["dtls.record.length"] == 40
    assert pkt["frame.protocols"].endswith("udp:dtls")

    # wrong version word is not DTLS
    bad = (b"\x16\x03\x03" + bytes(8) + len(body).to_bytes(2, "big")
           + body)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 49999, 60001, bad))
    assert "dtls" not in pkt["frame.protocols"]


def test_gtpu_decapsulates_inner_flow(tmp_path):
    inner = build_eth_ipv4_tcp(
        "172.16.0.1", "172.16.0.2", 1234, 80, 5, 0, 0x02, b"")[14:]
    gtp = (b"\x30\xff" + len(inner).to_bytes(2, "big")
           + (0xDEADBEEF).to_bytes(4, "big") + inner)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.2", 2152, 2152, gtp))
    assert pkt["gtp.teid"] == 0xDEADBEEF
    assert pkt["gtp.message"] == 0xFF
    # inner subscriber flow wins the standard columns
    assert pkt["ip.src"] == "172.16.0.1"
    assert pkt["tcp.dstport"] == 80
    assert pkt["gtp.outer_ip_src"] == "10.0.0.1"
    assert "gtp" in pkt["frame.protocols"]
    assert pkt["frame.protocols"].index("gtp") < \
        pkt["frame.protocols"].rindex("tcp")


def test_kerberos_as_req_udp_and_tcp(tmp_path):
    asn1 = b"\x6a\x07\x30\x05\xa1\x03\x02\x01\x05"
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 50005, 88, asn1))
    assert pkt["kerberos.msg_type"] == 10
    assert pkt["frame.protocols"].endswith("udp:kerberos")

    framed = len(asn1).to_bytes(4, "big") + asn1
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 50006, 88, 1, 1, 0x18, framed))
    assert pkt["kerberos.msg_type"] == 10
    assert pkt["frame.protocols"].endswith("tcp:kerberos")


def test_nbns_first_level_decoding(tmp_path):
    # "FILESERVER" padded to 15 + suffix 0x20 (server service)
    name = "FILESERVER".ljust(15) + "\x20"
    encoded = "".join(
        chr(65 + (ord(c) >> 4)) + chr(65 + (ord(c) & 0xF)) for c in name)
    q = dns_query_payload(encoded, qtype=0x20, dns_id=0x7777)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.255", 137, 137, q))
    assert pkt["nbns.id"] == 0x7777
    assert pkt["nbns.name"] == "FILESERVER<20>"
    assert pkt["frame.protocols"].endswith("udp:nbns")

    # a normal (non-encoded) DNS name on 137 is NOT claimed as nbns
    q2 = dns_query_payload("host.example.com")
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.255", 137, 137, q2))
    assert "nbns" not in pkt["frame.protocols"]


def test_rip_response(tmp_path):
    rip = b"\x02\x02\x00\x00" + bytes(20)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "224.0.0.9", 520, 520, rip))
    assert pkt["rip.command"] == 2
    assert pkt["rip.version"] == 2
    assert pkt["frame.protocols"].endswith("udp:rip")


def test_batch5_protocols_resolve_in_glossary():
    from wireduck_spark.sources.glossary import (
        BUILTIN_FIELDS, BUILTIN_PROTOCOLS)

    protos = {p.filter_name for p in BUILTIN_PROTOCOLS}
    for name in ("dtls", "gtp", "kerberos", "nbns", "rip"):
        assert name in protos, name
    declared = {f.filter_name for f in BUILTIN_FIELDS}
    for f in ("dtls.record.content_type", "dtls.record.version",
              "dtls.record.length", "gtp.flags", "gtp.message",
              "gtp.teid", "gtp.outer_ip_src", "gtp.outer_ip_dst",
              "kerberos.msg_type", "nbns.id", "nbns.flags.response",
              "nbns.name", "rip.command", "rip.version"):
        assert f in declared, f


def test_breadth_fields_through_spark_pipeline(spark, tmp_path):
    """The full plumbing, not just iter_packets: glossary-driven schema
    selection by NEW protocol names through spark.read.format('pcap') —
    typed columns appear, values land, absent protocols stay NULL."""
    import wireduck_spark

    invite = (b"INVITE sip:bob@x.com SIP/2.0\r\ni: call-7\r\n"
              b"From: <sip:a@x.com>\r\nTo: <sip:bob@x.com>\r\n\r\n")
    var = b"\x00\x04MQTT\x04\x02\x00\x3c\x00\x03abc"
    frames = [
        (1700000000.0, build_eth_ipv4_udp(
            "10.0.0.1", "10.0.0.2", 5060, 5060, invite)),
        (1700000001.0, build_eth_ipv4_udp(
            "10.0.0.5", "10.0.0.6", 51000, 514, b"<134>host app: hi")),
        (1700000002.0, build_eth_ipv4_tcp(
            "10.0.0.1", "10.0.0.9", 40005, 1883, 1, 1, 0x18,
            b"\x10" + bytes([len(var)]) + var)),
    ]
    p = tmp_path / "mix.pcap"
    p.write_bytes(build_pcap(frames))
    wireduck_spark.init(spark)
    df = (spark.read.format("pcap").option("engine", "native")
          .option("path", str(p))
          .option("protocols", "sip,syslog,mqtt").load())
    names = [f.name for f in df.schema.fields]
    for col in ("sip.Call-ID", "syslog.facility", "mqtt.clientid"):
        assert col in names, col
    rows = {r["frame.number"]: r for r in df.collect()}
    assert rows[1]["sip.Method"] == "INVITE"
    assert rows[1]["mqtt.clientid"] is None        # NULL across protos
    assert rows[2]["syslog.facility"] == 16
    assert rows[3]["mqtt.clientid"] == "abc"


# ---------------------------------------------------------------------------
# Breadth batch 6: STUN, ISAKMP/IKE, SSDP.
# ---------------------------------------------------------------------------


def test_stun_binding_request_any_port(tmp_path):
    req = (b"\x00\x01" + (8).to_bytes(2, "big")
           + b"\x21\x12\xa4\x42" + bytes(12) + bytes(8))
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 61000, 62000, req))
    assert pkt["stun.type"] == 1
    assert pkt["stun.length"] == 8
    assert pkt["frame.protocols"].endswith("udp:stun")

    # wrong cookie is not STUN
    bad = (b"\x00\x01" + (8).to_bytes(2, "big")
           + b"\x00\x00\x00\x00" + bytes(12) + bytes(8))
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 61000, 62000, bad))
    assert "stun" not in pkt["frame.protocols"]


def test_isakmp_ikev2_sa_init(tmp_path):
    hdr = (bytes(8) + bytes(8)            # SPIs
           + b"\x21"                      # next payload SA
           + b"\x20"                      # version 2.0
           + bytes([34])                  # IKE_SA_INIT
           + b"\x08"                      # flags: initiator
           + bytes(4)                     # message id
           + (28 + 12).to_bytes(4, "big"))
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 500, 500, hdr + bytes(12)))
    assert pkt["isakmp.version"] == 2
    assert pkt["isakmp.exchangetype"] == 34
    assert pkt["frame.protocols"].endswith("udp:isakmp")

    # NAT-T on 4500 behind the non-ESP marker
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 4500, 4500,
        b"\x00\x00\x00\x00" + hdr + bytes(12)))
    assert pkt["isakmp.version"] == 2


def test_ssdp_msearch_and_response(tmp_path):
    msearch = (b"M-SEARCH * HTTP/1.1\r\nHOST: 239.255.255.250:1900\r\n"
               b"MAN: \"ssdp:discover\"\r\n\r\n")
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "239.255.255.250", 50010, 1900, msearch))
    assert pkt["http.request.method"] == "M-SEARCH"
    assert pkt["frame.protocols"].endswith("udp:ssdp")

    resp = b"HTTP/1.1 200 OK\r\nST: upnp:rootdevice\r\n\r\n"
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.9", "10.0.0.1", 1900, 50010, resp))
    assert pkt["http.response.code"] == 200
    assert pkt["frame.protocols"].endswith("udp:ssdp")


def test_batch6_protocols_resolve_in_glossary():
    from wireduck_spark.sources.glossary import (
        BUILTIN_FIELDS, BUILTIN_PROTOCOLS)

    protos = {p.filter_name for p in BUILTIN_PROTOCOLS}
    for name in ("stun", "isakmp", "ssdp"):
        assert name in protos, name
    declared = {f.filter_name for f in BUILTIN_FIELDS}
    for f in ("stun.type", "stun.length", "isakmp.version",
              "isakmp.exchangetype", "isakmp.length"):
        assert f in declared, f


# ---------------------------------------------------------------------------
# Breadth batch 7: PPTP, DNP3, BACnet, L2TP, Git, IRC, TACACS+.
# ---------------------------------------------------------------------------


def test_pptp_start_control_request(tmp_path):
    body = bytes(146)
    msg = ((156).to_bytes(2, "big") + (1).to_bytes(2, "big")
           + b"\x1a\x2b\x3c\x4d" + (1).to_bytes(2, "big") + body)
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40030, 1723, 1, 1, 0x18, msg))
    assert pkt["pptp.type"] == 1
    assert pkt["frame.protocols"].endswith("tcp:pptp")

    # broken magic is not pptp
    bad = ((156).to_bytes(2, "big") + (1).to_bytes(2, "big")
           + b"\x00\x00\x00\x00" + (1).to_bytes(2, "big") + body)
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40030, 1723, 1, 1, 0x18, bad))
    assert "pptp" not in pkt["frame.protocols"]


def test_dnp3_link_frame_tcp_and_udp(tmp_path):
    frame = (b"\x05\x64\x0a\xc4" + (10).to_bytes(2, "little")
             + (1).to_bytes(2, "little") + bytes(4))
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40031, 20000, 1, 1, 0x18, frame))
    assert pkt["dnp3.dst"] == 10 and pkt["dnp3.src"] == 1
    assert pkt["frame.protocols"].endswith("tcp:dnp3")
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 40031, 20000, frame))
    assert pkt["frame.protocols"].endswith("udp:dnp3")


def test_bacnet_bvlc(tmp_path):
    npdu = bytes(10)
    bvlc = b"\x81\x0b" + (4 + len(npdu)).to_bytes(2, "big") + npdu
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "255.255.255.255", 47808, 47808, bvlc))
    assert pkt["bvlc.function"] == 0x0B
    assert pkt["bvlc.length"] == 14
    assert pkt["frame.protocols"].endswith("udp:bvlc")


def test_l2tp_control_and_data(tmp_path):
    ctrl = ((0xC802).to_bytes(2, "big") + (12).to_bytes(2, "big")
            + (5).to_bytes(2, "big") + (0).to_bytes(2, "big")
            + bytes(4))
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 1701, 1701, ctrl))
    assert pkt["l2tp.type"] == 1
    assert pkt["l2tp.tunnel"] == 5
    assert pkt["frame.protocols"].endswith("udp:l2tp")

    data = (0x0002).to_bytes(2, "big") + (5).to_bytes(2, "big") \
        + (7).to_bytes(2, "big") + bytes(6)
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 1701, 1701, data))
    assert pkt["l2tp.type"] == 0 and pkt["l2tp.session"] == 7


def test_git_upload_pack_request(tmp_path):
    body = b"git-upload-pack /project.git\x00host=example.com\x00"
    line = f"{len(body) + 4:04x}".encode() + body
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40032, 9418, 1, 1, 0x18, line))
    assert pkt["git.service"] == "git-upload-pack"
    assert pkt["git.packet_len"] == len(body) + 4
    assert pkt["frame.protocols"].endswith("tcp:git")


def test_irc_command_and_numeric(tmp_path):
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40033, 6667, 1, 1, 0x18,
        b"PRIVMSG #ops :deploy now\r\n"))
    assert pkt["irc.request.command"] == "PRIVMSG"
    assert pkt["frame.protocols"].endswith("tcp:irc")
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.9", "10.0.0.1", 6667, 40033, 1, 1, 0x18,
        b":irc.example.com 001 alice :Welcome\r\n"))
    assert pkt["irc.response.num_command"] == 1


def test_tacplus_authentication(tmp_path):
    body = bytes(20)
    hdr = (b"\xc0" + b"\x01" + b"\x01" + b"\x00"
           + (0xCAFE).to_bytes(4, "big")
           + len(body).to_bytes(4, "big"))
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40034, 49, 1, 1, 0x18, hdr + body))
    assert pkt["tacplus.type"] == 1
    assert pkt["tacplus.session_id"] == 0xCAFE
    assert pkt["frame.protocols"].endswith("tcp:tacplus")


def test_batch7_protocols_resolve_in_glossary():
    from wireduck_spark.sources.glossary import (
        BUILTIN_FIELDS, BUILTIN_PROTOCOLS)

    protos = {p.filter_name for p in BUILTIN_PROTOCOLS}
    for name in ("pptp", "dnp3", "bvlc", "l2tp", "git", "irc",
                 "tacplus"):
        assert name in protos, name
    declared = {f.filter_name for f in BUILTIN_FIELDS}
    for f in ("pptp.length", "pptp.type", "dnp3.len", "dnp3.ctl",
              "dnp3.dst", "dnp3.src", "bvlc.function", "bvlc.length",
              "l2tp.type", "l2tp.tunnel", "l2tp.session",
              "git.packet_len", "git.service", "irc.request.command",
              "irc.response.num_command", "tacplus.type",
              "tacplus.session_id"):
        assert f in declared, f


# ---------------------------------------------------------------------------
# Breadth batch 8: CoAP, Memcached, NATS, ICMPv6 NDP targets.
# ---------------------------------------------------------------------------


def test_coap_get(tmp_path):
    msg = b"\x44\x01\x30\x39" + b"\xde\xad\xbe\xef" + b"\xb5sense"
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 50020, 5683, msg))
    assert pkt["coap.type"] == 0          # CON
    assert pkt["coap.code"] == 1          # GET
    assert pkt["coap.mid"] == 0x3039
    assert pkt["frame.protocols"].endswith("udp:coap")

    # version != 1 is not CoAP
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 50020, 5683, b"\x84\x01\x30\x39"))
    assert "coap" not in pkt["frame.protocols"]


def test_memcache_get_and_stats(tmp_path):
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40040, 11211, 1, 1, 0x18,
        b"get user:42\r\n"))
    assert pkt["memcache.command"] == "get"
    assert pkt["frame.protocols"].endswith("tcp:memcache")
    pkt = _one(tmp_path, build_eth_ipv4_udp(
        "10.0.0.1", "10.0.0.9", 40040, 11211,
        b"\x00\x00\x00\x00\x00\x01\x00\x00stats\r\n"))
    # binary-framed UDP memcache is NOT the text protocol: unclaimed
    assert "memcache" not in pkt["frame.protocols"]


def test_nats_connect_and_pub(tmp_path):
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40041, 4222, 1, 1, 0x18,
        b'CONNECT {"verbose":false}\r\n'))
    assert pkt["nats.command"] == "CONNECT"
    assert pkt["frame.protocols"].endswith("tcp:nats")
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40041, 4222, 1, 1, 0x18,
        b"PUB orders.created 11\r\nhello world\r\n"))
    assert pkt["nats.command"] == "PUB"

    # CONNECT without a JSON body is not NATS
    pkt = _one(tmp_path, build_eth_ipv4_tcp(
        "10.0.0.1", "10.0.0.9", 40041, 4222, 1, 1, 0x18,
        b"CONNECT please\r\n"))
    assert "nats" not in pkt["frame.protocols"]


def test_icmpv6_ndp_target_address(tmp_path):
    src = bytes.fromhex("fe800000000000000000000000000001")
    dst = bytes.fromhex("ff020000000000000000000100000002")
    target = bytes.fromhex("20010db8000000000000000000000042")
    # NS: type(1) code(1) cksum(2) reserved(4) target(16)
    icmp6 = struct.pack(">BBH", 135, 0, 0) + bytes(4) + target
    eth = bytes(6) + bytes([0, 0, 0, 0, 0, 1]) + struct.pack(">H", 0x86DD)
    ip6 = (struct.pack(">IHBB", 0x60000000, len(icmp6), 58, 255)
           + src + dst)
    pkt = _one(tmp_path, eth + ip6 + icmp6)
    assert pkt["icmpv6.type"] == 135
    assert pkt["icmpv6.nd.ns.target_address"] == "2001:db8:0:0:0:0:0:42"


def test_batch8_protocols_resolve_in_glossary():
    from wireduck_spark.sources.glossary import (
        BUILTIN_FIELDS, BUILTIN_PROTOCOLS)

    protos = {p.filter_name for p in BUILTIN_PROTOCOLS}
    for name in ("coap", "memcache", "nats"):
        assert name in protos, name
    declared = {f.filter_name for f in BUILTIN_FIELDS}
    for f in ("coap.type", "coap.code", "coap.mid", "memcache.command",
              "nats.command", "icmpv6.nd.ns.target_address",
              "icmpv6.nd.na.target_address"):
        assert f in declared, f
