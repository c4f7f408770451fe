"""Native libpcap dissector: pure-Python packet parsing with no external
dependency.

The reference can only scan pcap by shelling out to tshark
(/root/reference/src/wireduck_extension.cpp:109,126). This module is the
"beyond reference" scale path: classic-libpcap framing (24-byte global
header + 16-byte record headers) plus Ethernet/IPv4/IPv6/TCP/UDP header
dissection in struct-unpacking Python. Because it reads bytes directly, a
single large capture can be SPLIT BY BYTE RANGE into Spark partitions
(`scan_record_offsets`) — the reference is architecturally single-threaded
(one tshark pipe, cpp:126,180).

Emitted fields use Wireshark filter names (tcp.srcport, ip.src, ...) with
tshark-compatible value semantics, so the same glossary-driven schema
serves both engines. Fields the native dissector cannot know (deep app
protocols) stay NULL — exactly how absent fields behave in the reference.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from datetime import datetime, timezone

MAGIC_US_LE = 0xA1B2C3D4
MAGIC_US_BE = 0xD4C3B2A1
MAGIC_NS_LE = 0xA1B23C4D
MAGIC_NS_BE = 0x4D3CB2A1

GLOBAL_HEADER_LEN = 24
RECORD_HEADER_LEN = 16


@dataclass(frozen=True)
class PcapInfo:
    endian: str  # '<' | '>'
    ts_divisor: int  # 1e6 (usec) or 1e9 (nsec)
    linktype: int
    snaplen: int


def read_global_header(buf: bytes) -> PcapInfo:
    if len(buf) < GLOBAL_HEADER_LEN:
        raise ValueError("not a pcap file: truncated global header")
    magic = struct.unpack("<I", buf[:4])[0]
    if magic == MAGIC_US_LE:
        endian, div = "<", 1_000_000
    elif magic == MAGIC_NS_LE:
        endian, div = "<", 1_000_000_000
    else:
        magic_be = struct.unpack(">I", buf[:4])[0]
        if magic_be == MAGIC_US_LE:
            endian, div = ">", 1_000_000
        elif magic_be == MAGIC_NS_LE:
            endian, div = ">", 1_000_000_000
        else:
            raise ValueError(f"not a classic pcap file (magic {magic:#x}); "
                             "pcapng is not supported by the native engine")
    _, _, _, _, snaplen, linktype = struct.unpack(
        endian + "HHiIII", buf[4:GLOBAL_HEADER_LEN]
    )
    return PcapInfo(endian, div, linktype, snaplen)


def scan_record_offsets(path: str, n_splits: int) -> list[tuple[int, int, int]]:
    """One cheap header-only pass over the file producing up to n_splits
    (byte_offset, n_packets, first_frame_number) slices of roughly equal
    packet count — the partition plan for splitting ONE capture file
    across executors."""
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        info = read_global_header(fh.read(GLOBAL_HEADER_LEN))
        offsets = []  # byte offset of each record
        off = GLOBAL_HEADER_LEN
        while off + RECORD_HEADER_LEN <= size:
            fh.seek(off)
            hdr = fh.read(RECORD_HEADER_LEN)
            if len(hdr) < RECORD_HEADER_LEN:
                break
            _, _, incl, _ = struct.unpack(info.endian + "IIII", hdr)
            offsets.append(off)
            off += RECORD_HEADER_LEN + incl
    n = len(offsets)
    if n == 0:
        return []
    n_splits = max(1, min(n_splits, n))
    per = (n + n_splits - 1) // n_splits
    return [
        (offsets[i], min(per, n - i), i + 1)  # frame numbers are 1-based
        for i in range(0, n, per)
    ]


def _mac(b: bytes) -> str:
    return ":".join(f"{x:02x}" for x in b)


def _ipv4(b: bytes) -> str:
    return ".".join(str(x) for x in b)


def _ipv6(b: bytes) -> str:
    parts = [f"{(b[i] << 8) | b[i + 1]:x}" for i in range(0, 16, 2)]
    return ":".join(parts)  # non-compressed form (deterministic)


_TCP_FLAG_NAMES = (
    (0x02, "SYN"), (0x10, "ACK"), (0x01, "FIN"), (0x04, "RST"), (0x08, "PSH"),
)


def dissect_packet(data: bytes, linktype: int, fields: dict) -> None:
    """Dissect one captured frame (Ethernet linktype) into `fields`."""
    protos = ["eth"]
    if linktype != 1 or len(data) < 14:
        fields["frame.protocols"] = "raw" if linktype != 1 else "eth"
        return
    fields["eth.dst"] = _mac(data[0:6])
    fields["eth.src"] = _mac(data[6:12])
    ethertype = struct.unpack(">H", data[12:14])[0]
    off = 14
    if ethertype == 0x8100 and len(data) >= 18:  # 802.1Q VLAN
        protos.append("vlan")
        ethertype = struct.unpack(">H", data[16:18])[0]
        off = 18
    fields["eth.type"] = ethertype
    protos.append("ethertype")

    if ethertype == 0x0800 and len(data) >= off + 20:  # IPv4
        protos.append("ip")
        ver_ihl = data[off]
        ihl = (ver_ihl & 0x0F) * 4
        fields["ip.version"] = ver_ihl >> 4
        fields["ip.hdr_len"] = ihl
        total_len = struct.unpack(">H", data[off + 2:off + 4])[0]
        fields["ip.len"] = total_len
        fields["ip.ttl"] = data[off + 8]
        proto = data[off + 9]
        fields["ip.proto"] = proto
        fields["ip.src"] = _ipv4(data[off + 12:off + 16])
        fields["ip.dst"] = _ipv4(data[off + 16:off + 20])
        _dissect_l4(data, off + ihl, proto, total_len - ihl, protos, fields)
    elif ethertype == 0x86DD and len(data) >= off + 40:  # IPv6
        protos.append("ipv6")
        payload_len = struct.unpack(">H", data[off + 4:off + 6])[0]
        next_header = data[off + 6]
        fields["ipv6.src"] = _ipv6(data[off + 8:off + 24])
        fields["ipv6.dst"] = _ipv6(data[off + 24:off + 40])
        _dissect_l4(data, off + 40, next_header, payload_len, protos, fields)
    elif ethertype == 0x0806:
        protos.append("arp")
    else:
        protos.append("data")
    fields["frame.protocols"] = ":".join(protos)


def _dissect_l4(
    data: bytes, off: int, proto: int, l3_payload_len: int,
    protos: list, fields: dict,
) -> None:
    if proto == 6 and len(data) >= off + 20:  # TCP
        protos.append("tcp")
        sport, dport, seq, ack = struct.unpack(">HHII", data[off:off + 12])
        data_off = (data[off + 12] >> 4) * 4
        flags = data[off + 13]
        fields["tcp.srcport"] = sport
        fields["tcp.dstport"] = dport
        fields["tcp.seq"] = seq
        fields["tcp.ack"] = ack
        fields["tcp.hdr_len"] = data_off
        fields["tcp.flags.syn"] = bool(flags & 0x02)
        fields["tcp.flags.ack"] = bool(flags & 0x10)
        fields["tcp.flags.fin"] = bool(flags & 0x01)
        fields["tcp.flags.reset"] = bool(flags & 0x04)
        fields["tcp.flags.push"] = bool(flags & 0x08)
        fields["tcp.window_size_value"] = struct.unpack(
            ">H", data[off + 14:off + 16]
        )[0]
        fields["tcp.checksum"] = struct.unpack(">H", data[off + 16:off + 18])[0]
        payload_len = max(l3_payload_len - data_off, 0)
        fields["tcp.len"] = payload_len
        payload = data[off + data_off:off + data_off + payload_len]
        if payload:
            fields["tcp.payload"] = payload.hex()
        flagstr = ", ".join(n for m, n in _TCP_FLAG_NAMES if flags & m)
        fields["_ws.col.info"] = (
            f"{sport} → {dport} [{flagstr}] Seq={seq} Ack={ack}"
            f" Len={payload_len}"
        )
    elif proto == 17 and len(data) >= off + 8:  # UDP
        protos.append("udp")
        sport, dport, length, checksum = struct.unpack(">HHHH", data[off:off + 8])
        fields["udp.srcport"] = sport
        fields["udp.dstport"] = dport
        fields["udp.length"] = length
        fields["udp.checksum"] = checksum
        fields["_ws.col.info"] = f"{sport} → {dport} Len={length - 8}"
    else:
        protos.append("data")


class StreamTracker:
    """tcp.stream index assignment: one index per 4-tuple connection, in
    first-seen order within a capture slice (tshark-compatible for
    whole-file reads; per-partition-relative when a file is split)."""

    def __init__(self):
        self._streams: dict = {}

    def index(self, src, sport, dst, dport) -> int:
        key = frozenset(((src, sport), (dst, dport)))
        if key not in self._streams:
            self._streams[key] = len(self._streams)
        return self._streams[key]


def iter_packets(
    path: str,
    start_offset: int | None = None,
    n_packets: int | None = None,
    first_frame: int = 1,
):
    """Yield one {filter_name: value} dict per packet.

    start_offset/n_packets allow byte-range slicing of one file (the
    partition plan from scan_record_offsets); frame numbers stay global
    via first_frame.
    """
    with open(path, "rb") as fh:
        info = read_global_header(fh.read(GLOBAL_HEADER_LEN))
        fh.seek(start_offset if start_offset is not None else GLOBAL_HEADER_LEN)
        streams = StreamTracker()
        frame_no = first_frame
        emitted = 0
        while n_packets is None or emitted < n_packets:
            hdr = fh.read(RECORD_HEADER_LEN)
            if len(hdr) < RECORD_HEADER_LEN:
                break
            ts_s, ts_frac, incl, orig = struct.unpack(info.endian + "IIII", hdr)
            data = fh.read(incl)
            if len(data) < incl:
                break
            epoch = ts_s + ts_frac / info.ts_divisor
            fields: dict = {
                "frame.number": frame_no,
                "frame.time_epoch": datetime.fromtimestamp(
                    epoch, tz=timezone.utc
                ).replace(tzinfo=None),
                "frame.len": orig,
                "frame.cap_len": incl,
            }
            dissect_packet(data, info.linktype, fields)
            if "tcp.srcport" in fields:
                src = fields.get("ip.src") or fields.get("ipv6.src")
                dst = fields.get("ip.dst") or fields.get("ipv6.dst")
                fields["tcp.stream"] = streams.index(
                    src, fields["tcp.srcport"], dst, fields["tcp.dstport"]
                )
            yield fields
            frame_no += 1
            emitted += 1
