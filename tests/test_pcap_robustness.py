"""Degenerate-capture robustness pins: zero-length frames and
single-packet files through the native dissector, the byte-range split
resync, and the registered Spark pcap source (SURVEY §12 item 5 — the
adversarial-corpus device pointed at the pcap surface; complements
tests/test_native.py::test_truncated_and_garbage_captures which covers
truncated / garbage / empty / not-a-pcap files).

r14 probe result: all paths were already graceful — a caplen=0 record
yields a frame row (frame.len 0, NULL protocol fields) on the classic
AND pcapng readers, the whole-file and split reads agree row-for-row on
a corpus that is one-third zero-length records, and a single-packet
file (including a single ZERO-LENGTH packet) round-trips. Pinned here
against regression: the resync heuristic must keep treating a 0-length
record header as plausible, or splits would silently drop everything
after the first zero-length frame in their range.
"""

from __future__ import annotations

import pytest

# r15 driver-window split (pytest.ini): heavyweight battery, opt-in
pytestmark = pytest.mark.slow

from pcap_fixtures import build_eth_ipv4_udp, build_pcap, build_pcapng
from wireduck_spark.sources.native import iter_packets


@pytest.fixture(scope="module")
def zl_corpus(tmp_path_factory):
    """200 frames, every third one zero-length."""
    d = tmp_path_factory.mktemp("zl_pcap")
    f1 = build_eth_ipv4_udp("10.0.0.1", "10.0.0.2", 1, 2, b"ok")
    frames = [(1700000000.0 + i, b"" if i % 3 == 0 else f1)
              for i in range(200)]
    p = d / "zl_many.pcap"
    p.write_bytes(build_pcap(frames))
    return str(p)


def test_zero_length_frames_native_both_formats(tmp_path):
    f1 = build_eth_ipv4_udp("10.0.0.1", "10.0.0.2", 1, 2, b"ok")
    frames = [(1700000000.0, f1), (1700000001.0, b""),
              (1700000002.0, f1)]
    classic = tmp_path / "zl.pcap"
    classic.write_bytes(build_pcap(frames))
    png = tmp_path / "zl.pcapng"
    png.write_bytes(build_pcapng(frames))
    for path in (classic, png):
        pkts = list(iter_packets(str(path)))
        assert [p["frame.len"] for p in pkts] == [44, 0, 44]
        # the zero-length record carries no headers to dissect
        assert pkts[1].get("udp.srcport") is None


def test_single_packet_files(tmp_path):
    f1 = build_eth_ipv4_udp("10.0.0.1", "10.0.0.2", 1, 2, b"ok")
    one = tmp_path / "one.pcap"
    one.write_bytes(build_pcap([(1700000000.0, f1)]))
    assert len(list(iter_packets(str(one)))) == 1
    zero = tmp_path / "zero.pcap"
    zero.write_bytes(build_pcap([(1700000000.0, b"")]))
    [pkt] = list(iter_packets(str(zero)))
    assert pkt["frame.len"] == 0 and pkt["frame.cap_len"] == 0


def test_zero_length_frames_spark_source_whole_and_split(
        spark, zl_corpus):
    import wireduck_spark
    from pyspark.sql import functions as F

    wireduck_spark.init(spark)
    whole = (spark.read.format("pcap").option("engine", "native")
             .option("path", zl_corpus).load())
    counts = {r[0]: r[1] for r in
              whole.groupBy(F.col("`frame.len`")).count().collect()}
    assert counts == {0: 67, 44: 133}
    split = (spark.read.format("pcap").option("engine", "native")
             .option("split_bytes", "2048")
             .option("path", zl_corpus).load())
    assert split.count() == 200
    assert (sorted(r["frame.number"] for r in split.collect())
            == list(range(1, 201)))
