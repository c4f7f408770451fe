"""Native libpcap dissector: synthetic fixtures + the reference's real
fix.pcap with its README golden aggregate."""

import os

import pytest

from tests.pcap_fixtures import build_pcap, build_eth_ipv4_tcp, two_flow_pcap
from wireduck_spark.sources.native import (
    iter_packets, read_global_header, scan_record_offsets,
)

FIXTURE = "/root/reference/fix.pcap"


@pytest.fixture()
def pcap_file(tmp_path):
    p = tmp_path / "two_flow.pcap"
    p.write_bytes(two_flow_pcap())
    return str(p)


def test_global_header_variants(tmp_path):
    us = build_pcap([(1.0, b"x" * 20)])
    ns = build_pcap([(1.0, b"x" * 20)], nanos=True)
    assert read_global_header(us).ts_divisor == 1_000_000
    assert read_global_header(ns).ts_divisor == 1_000_000_000
    with pytest.raises(ValueError):
        read_global_header(b"\x00" * 24)


def test_dissection(pcap_file):
    pkts = list(iter_packets(pcap_file))
    assert len(pkts) == 4
    p1, p2, p3, p4 = pkts
    assert p1["frame.number"] == 1
    assert p1["frame.protocols"] == "eth:ethertype:ip:tcp"
    assert p1["tcp.flags.syn"] is True and p1["tcp.flags.ack"] is False
    assert p1["tcp.len"] == 0
    assert p2["tcp.len"] == 5
    assert p2["tcp.flags.syn"] is True and p2["tcp.flags.ack"] is True
    assert p3["tcp.len"] == 7
    assert p3["tcp.payload"] == b"goodbye".hex()
    assert p1["tcp.stream"] == p2["tcp.stream"] == p3["tcp.stream"] == 0
    assert p4["frame.protocols"] == "eth:ethertype:ip:udp"
    assert p4["udp.srcport"] == 5353 and p4["udp.dstport"] == 53
    assert p4["udp.length"] == 12
    assert p1["ip.src"] == "10.0.0.1" and p1["ip.dst"] == "10.0.0.2"
    # sub-second timestamps preserved
    assert p2["frame.time_epoch"].microsecond == 500000


def test_nanosecond_timestamps(tmp_path):
    f = build_eth_ipv4_tcp("1.1.1.1", "2.2.2.2", 1, 2, 0, 0, 0x10, b"")
    p = tmp_path / "ns.pcap"
    p.write_bytes(build_pcap([(123.000000456, f)], nanos=True))
    pkt = next(iter_packets(str(p)))
    assert pkt["frame.time_epoch"].microsecond == 0  # 456ns truncates to 0us


def test_offset_splitting(pcap_file):
    """Byte-range partition plan: slices cover every packet exactly once,
    with global frame numbers."""
    parts = scan_record_offsets(pcap_file, 3)
    assert sum(n for _, n, _ in parts) == 4
    seen = []
    for off, n, first in parts:
        seen += [p["frame.number"] for p in iter_packets(pcap_file, off, n, first)]
    assert seen == [1, 2, 3, 4]


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture not present")
def test_fixture_golden_aggregate():
    """The reference README.md:160-167 golden result, reproduced without
    tshark: (429, 259678) for 11001->53867 and (56, 19702) reversed."""
    agg = {}
    n = 0
    for pkt in iter_packets(FIXTURE):
        n += 1
        if "tcp.srcport" in pkt:
            key = (pkt["tcp.srcport"], pkt["tcp.dstport"])
            c, s = agg.get(key, (0, 0))
            agg[key] = (c + 1, s + pkt["tcp.len"])
    assert n == 485
    assert agg[(11001, 53867)] == (429, 259678)
    assert agg[(53867, 11001)] == (56, 19702)
    # single loopback session -> one tcp stream
    streams = {p.get("tcp.stream") for p in iter_packets(FIXTURE)}
    assert streams == {0}
