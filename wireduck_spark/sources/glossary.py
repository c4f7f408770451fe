"""Glossary catalog: Wireshark's data dictionary driving dynamic schema
inference (reference: glossary_protocols / glossary_fields tables built
from `tshark -G`, /root/reference/src/wireduck_extension.cpp:275-428, and
FetchSelectedFields cpp:53-78).

Spark-first design (SURVEY.md §3.1):

- built once from `tshark -G protocols` / `tshark -G fields` subprocesses
  on the driver (the glossary is small — no need to distribute), cached as
  parquet under the repo-local cache dir, registered as the temp views
  `glossary_protocols` / `glossary_fields`;
- `DataSource.schema()` must work WITHOUT a SparkSession (it runs at plan
  time), so selection/ordering is plain Python over cached rows;
- when tshark is absent (this container), a bundled builtin glossary
  covering the native dissector's field set keeps schema inference fully
  functional — documented deviation, flipped automatically when tshark
  exists.

Deviations from the reference (SURVEY.md §4.4): duplicate filter_names are
dropped on first occurrence; re-initialization overwrites instead of
appending duplicates.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from dataclasses import dataclass

DEFAULT_FIELDS = (
    "frame.number", "frame.time_epoch", "frame.protocols", "frame.len",
    "_ws.col.info",
)  # cpp:63 hard-coded default field list

# Display order of the defaults as observed in README.md:46-62 — produced
# by glossary insertion order of the frame protocol, _ws.col.info last.
_CACHE_ENV = "WIREDUCK_GLOSSARY_DIR"


@dataclass(frozen=True)
class GlossaryField:
    field_name: str
    filter_name: str
    field_type: str
    protocol_filter_name: str
    encoding: str | None = None
    bitmask: str | None = None
    description: str | None = None


@dataclass(frozen=True)
class GlossaryProtocol:
    full_name: str
    short_name: str
    filter_name: str
    can_enable: bool = True
    is_displayed: bool = True
    is_filterable: bool = True


# ---------------------------------------------------------------------------
# Builtin fallback glossary (covers the native dissector's field surface)
# ---------------------------------------------------------------------------

BUILTIN_PROTOCOLS = [
    GlossaryProtocol("Frame", "Frame", "frame"),
    GlossaryProtocol("Ethernet", "Ethernet", "eth"),
    GlossaryProtocol("Address Resolution Protocol", "ARP/RARP", "arp"),
    GlossaryProtocol("Internet Protocol Version 4", "IPv4", "ip"),
    GlossaryProtocol("Internet Protocol Version 6", "IPv6", "ipv6"),
    GlossaryProtocol("Internet Control Message Protocol", "ICMP", "icmp"),
    GlossaryProtocol("Internet Control Message Protocol v6", "ICMPv6",
                     "icmpv6"),
    GlossaryProtocol("Transmission Control Protocol", "TCP", "tcp"),
    GlossaryProtocol("User Datagram Protocol", "UDP", "udp"),
    GlossaryProtocol("Domain Name System", "DNS", "dns"),
    GlossaryProtocol("Hypertext Transfer Protocol", "HTTP", "http"),
    GlossaryProtocol("Transport Layer Security", "TLS", "tls"),
    GlossaryProtocol("Network Time Protocol", "NTP", "ntp"),
    GlossaryProtocol("Dynamic Host Configuration Protocol", "DHCP/BOOTP",
                     "dhcp"),
    GlossaryProtocol("Virtual eXtensible Local Area Network", "VXLAN",
                     "vxlan"),
    GlossaryProtocol("Generic Routing Encapsulation", "GRE", "gre"),
    GlossaryProtocol("802.1Q Virtual LAN", "VLAN", "vlan"),
    GlossaryProtocol("QUIC IETF", "QUIC", "quic"),
    GlossaryProtocol("SSH Protocol", "SSH", "ssh"),
    GlossaryProtocol("Simple Mail Transfer Protocol", "SMTP", "smtp"),
    GlossaryProtocol("File Transfer Protocol (FTP)", "FTP", "ftp"),
    # r14 breadth batch. mdns/llmnr reuse the DNS wire format, so their
    # FIELDS live under dns.* (request dns columns to query them); the
    # protocol rows make frame.protocols values resolvable.
    GlossaryProtocol("Multicast Domain Name System", "mDNS", "mdns"),
    GlossaryProtocol("Link-local Multicast Name Resolution", "LLMNR",
                     "llmnr"),
    GlossaryProtocol("Session Initiation Protocol", "SIP", "sip"),
    GlossaryProtocol("Simple Network Management Protocol", "SNMP", "snmp"),
    GlossaryProtocol("Syslog Message", "Syslog", "syslog"),
    GlossaryProtocol("Trivial File Transfer Protocol", "TFTP", "tftp"),
    GlossaryProtocol("Internet Group Management Protocol", "IGMP", "igmp"),
    GlossaryProtocol("Stream Control Transmission Protocol", "SCTP",
                     "sctp"),
    GlossaryProtocol("Post Office Protocol", "POP", "pop"),
    GlossaryProtocol("Internet Message Access Protocol", "IMAP", "imap"),
    # r14 breadth batch 2
    GlossaryProtocol("SMB (Server Message Block Protocol)", "SMB", "smb"),
    GlossaryProtocol("Server Message Block Protocol version 2 and 3",
                     "SMB2", "smb2"),
    GlossaryProtocol("Modbus/TCP", "Modbus/TCP", "mbtcp"),
    GlossaryProtocol("Modbus", "Modbus", "modbus"),
    GlossaryProtocol("MQ Telemetry Transport Protocol", "MQTT", "mqtt"),
    GlossaryProtocol("TPKT - ISO on TCP - RFC1006", "TPKT", "tpkt"),
    GlossaryProtocol("ITU-T Rec X.224", "X.224", "x224"),
    GlossaryProtocol("RADIUS Protocol", "RADIUS", "radius"),
    GlossaryProtocol("Open Shortest Path First", "OSPF", "ospf"),
    GlossaryProtocol("WireGuard Protocol", "WireGuard", "wg"),
    # r14 breadth batch 3
    GlossaryProtocol("Border Gateway Protocol", "BGP", "bgp"),
    GlossaryProtocol("Real Time Streaming Protocol", "RTSP", "rtsp"),
    GlossaryProtocol("Lightweight Directory Access Protocol", "LDAP",
                     "ldap"),
    GlossaryProtocol("Telnet", "TELNET", "telnet"),
    # r14 breadth batch 4 (app-layer / database tier, all magic-gated)
    GlossaryProtocol("HyperText Transfer Protocol 2", "HTTP2", "http2"),
    GlossaryProtocol("MySQL Protocol", "MySQL", "mysql"),
    GlossaryProtocol("PostgreSQL", "PGSQL", "pgsql"),
    GlossaryProtocol("Redis RESP", "Redis", "redis"),
    GlossaryProtocol("Advanced Message Queueing Protocol", "AMQP",
                     "amqp"),
    # r14 breadth batch 5
    GlossaryProtocol("Datagram Transport Layer Security", "DTLS", "dtls"),
    GlossaryProtocol("GPRS Tunneling Protocol", "GTP", "gtp"),
    GlossaryProtocol("Kerberos", "KRB5", "kerberos"),
    GlossaryProtocol("NetBIOS Name Service", "NBNS", "nbns"),
    GlossaryProtocol("Routing Information Protocol", "RIP", "rip"),
    # r14 breadth batch 6. ssdp reuses the HTTP field set (tshark's own
    # model: the SSDP dissector IS the HTTP dissector under the ssdp
    # protocol) — request http.* columns to query it.
    GlossaryProtocol("Session Traversal Utilities for NAT", "STUN",
                     "stun"),
    GlossaryProtocol("Internet Security Association and Key Management"
                     " Protocol", "ISAKMP", "isakmp"),
    GlossaryProtocol("Simple Service Discovery Protocol", "SSDP",
                     "ssdp"),
    # r14 breadth batch 7
    GlossaryProtocol("Point-to-Point Tunneling Protocol", "PPTP",
                     "pptp"),
    GlossaryProtocol("Distributed Network Protocol 3.0", "DNP 3.0",
                     "dnp3"),
    GlossaryProtocol("BACnet Virtual Link Control", "BVLC", "bvlc"),
    GlossaryProtocol("Layer 2 Tunneling Protocol", "L2TP", "l2tp"),
    GlossaryProtocol("Git Smart Protocol", "GIT", "git"),
    GlossaryProtocol("Internet Relay Chat", "IRC", "irc"),
    GlossaryProtocol("TACACS+", "TACACS+", "tacplus"),
    # r14 breadth batch 8
    GlossaryProtocol("Constrained Application Protocol", "CoAP", "coap"),
    GlossaryProtocol("Memcache Protocol", "MEMCACHE", "memcache"),
    GlossaryProtocol("NATS Messaging Protocol", "NATS", "nats"),
    GlossaryProtocol("Wireshark columns", "Columns", "_ws.col"),
]

_F = GlossaryField
BUILTIN_FIELDS = [
    # frame (insertion order drives the README default column order)
    _F("Epoch Arrival Time", "frame.time_epoch", "FT_ABSOLUTE_TIME", "frame"),
    # NOTE: for whole-file reads frame.number is tshark's 1-based ordinal;
    # when a large capture is byte-range SPLIT across executors it becomes
    # the record's byte offset — still unique and monotone in capture
    # order, but not dense (a true ordinal would force a full pre-scan).
    # Declared FT_UINT64/BIGINT so offsets of >4 GiB captures fit.
    # Documented in README "frame.number semantics".
    _F("Frame Number", "frame.number", "FT_UINT64", "frame"),
    _F("Frame Length", "frame.len", "FT_UINT32", "frame"),
    _F("Capture Length", "frame.cap_len", "FT_UINT32", "frame"),
    _F("Protocols in frame", "frame.protocols", "FT_STRING", "frame"),
    # Raw record bytes as hex (opt-in via protocols:=['frame', ...]) —
    # the column the pcap WRITER consumes for filter-and-save workflows.
    _F("Raw frame data", "frame.raw", "FT_BYTES", "frame"),
    # eth
    _F("Destination", "eth.dst", "FT_ETHER", "eth"),
    _F("Source", "eth.src", "FT_ETHER", "eth"),
    _F("Type", "eth.type", "FT_UINT16", "eth"),
    # ip
    _F("Version", "ip.version", "FT_UINT8", "ip"),
    _F("Header Length", "ip.hdr_len", "FT_UINT8", "ip"),
    _F("Total Length", "ip.len", "FT_UINT16", "ip"),
    _F("Time to Live", "ip.ttl", "FT_UINT8", "ip"),
    _F("Protocol", "ip.proto", "FT_UINT8", "ip"),
    _F("Source Address", "ip.src", "FT_IPv4", "ip"),
    _F("Destination Address", "ip.dst", "FT_IPv4", "ip"),
    # ipv6
    _F("Source Address", "ipv6.src", "FT_IPv6", "ipv6"),
    _F("Destination Address", "ipv6.dst", "FT_IPv6", "ipv6"),
    # tcp
    _F("Source Port", "tcp.srcport", "FT_UINT16", "tcp"),
    _F("Destination Port", "tcp.dstport", "FT_UINT16", "tcp"),
    _F("Stream index", "tcp.stream", "FT_UINT32", "tcp"),
    _F("Stream index", "udp.stream", "FT_UINT32", "udp"),
    _F("Sequence Number", "tcp.seq", "FT_UINT32", "tcp"),
    _F("Acknowledgment Number", "tcp.ack", "FT_UINT32", "tcp"),
    _F("Header Length", "tcp.hdr_len", "FT_UINT8", "tcp"),
    _F("TCP Segment Len", "tcp.len", "FT_UINT32", "tcp"),
    _F("Syn", "tcp.flags.syn", "FT_BOOLEAN", "tcp"),
    _F("Acknowledgment", "tcp.flags.ack", "FT_BOOLEAN", "tcp"),
    _F("Fin", "tcp.flags.fin", "FT_BOOLEAN", "tcp"),
    _F("Reset", "tcp.flags.reset", "FT_BOOLEAN", "tcp"),
    _F("Push", "tcp.flags.push", "FT_BOOLEAN", "tcp"),
    _F("Window", "tcp.window_size_value", "FT_UINT16", "tcp"),
    _F("Checksum", "tcp.checksum", "FT_UINT16", "tcp"),
    _F("TCP payload", "tcp.payload", "FT_BYTES", "tcp"),
    _F("MSS Value", "tcp.options.mss_val", "FT_UINT16", "tcp"),
    _F("Shift count", "tcp.options.wscale.shift", "FT_UINT8", "tcp"),
    _F("SACK Permitted", "tcp.options.sack_perm", "FT_BOOLEAN", "tcp"),
    # udp
    _F("Source Port", "udp.srcport", "FT_UINT16", "udp"),
    _F("Destination Port", "udp.dstport", "FT_UINT16", "udp"),
    _F("Length", "udp.length", "FT_UINT16", "udp"),
    _F("Checksum", "udp.checksum", "FT_UINT16", "udp"),
    # vxlan (vxlan.vni is tshark's field; the outer_* pair is this
    # engine's decap deviation — see sources/native.py VXLAN branch)
    _F("VXLAN Network Identifier (VNI)", "vxlan.vni", "FT_UINT24", "vxlan"),
    _F("Outer IP source (decap)", "vxlan.outer_ip_src", "FT_IPv4", "vxlan"),
    _F("Outer IP destination (decap)", "vxlan.outer_ip_dst", "FT_IPv4",
       "vxlan"),
    # vlan (802.1Q tag control: 12-bit id + 3-bit PCP)
    _F("ID", "vlan.id", "FT_UINT16", "vlan"),
    _F("Priority", "vlan.priority", "FT_UINT8", "vlan"),
    # gre (gre.proto/gre.key are tshark's fields; outer_* is the decap
    # deviation shared with vxlan)
    _F("Protocol Type", "gre.proto", "FT_UINT16", "gre"),
    _F("Key", "gre.key", "FT_UINT32", "gre"),
    _F("Outer IP source (decap)", "gre.outer_ip_src", "FT_IPv4", "gre"),
    _F("Outer IP destination (decap)", "gre.outer_ip_dst", "FT_IPv4", "gre"),
    # arp
    _F("Opcode", "arp.opcode", "FT_UINT16", "arp"),
    _F("Sender MAC address", "arp.src.hw_mac", "FT_ETHER", "arp"),
    _F("Sender IP address", "arp.src.proto_ipv4", "FT_IPv4", "arp"),
    _F("Target MAC address", "arp.dst.hw_mac", "FT_ETHER", "arp"),
    _F("Target IP address", "arp.dst.proto_ipv4", "FT_IPv4", "arp"),
    # icmp
    _F("Type", "icmp.type", "FT_UINT8", "icmp"),
    _F("Code", "icmp.code", "FT_UINT8", "icmp"),
    _F("Checksum", "icmp.checksum", "FT_UINT16", "icmp"),
    _F("Identifier (BE)", "icmp.ident", "FT_UINT16", "icmp"),
    _F("Sequence Number (BE)", "icmp.seq", "FT_UINT16", "icmp"),
    # quic (long-header parse; field names match tshark's QUIC dissector.
    # Short-header packets carry no self-describing DCID length, so only
    # header_form is emitted for them — tshark needs connection tracking
    # for more, documented deviation)
    _F("Header Form", "quic.header_form", "FT_BOOLEAN", "quic"),
    _F("Version", "quic.version", "FT_UINT32", "quic"),
    _F("Destination Connection ID", "quic.dcid", "FT_BYTES", "quic"),
    _F("Source Connection ID", "quic.scid", "FT_BYTES", "quic"),
    _F("Packet Type", "quic.long.packet_type", "FT_UINT8", "quic"),
    # ssh / smtp / ftp (cleartext control-channel surface)
    _F("Protocol", "ssh.protocol", "FT_STRING", "ssh"),
    _F("Response code", "smtp.response.code", "FT_UINT16", "smtp"),
    _F("Command", "smtp.req.command", "FT_STRING", "smtp"),
    _F("Response code", "ftp.response.code", "FT_UINT16", "ftp"),
    _F("Request command", "ftp.request.command", "FT_STRING", "ftp"),
    # icmpv6
    _F("Type", "icmpv6.type", "FT_UINT8", "icmpv6"),
    _F("Code", "icmpv6.code", "FT_UINT8", "icmpv6"),
    _F("Checksum", "icmpv6.checksum", "FT_UINT16", "icmpv6"),
    # dns
    _F("Transaction ID", "dns.id", "FT_UINT16", "dns"),
    _F("Response", "dns.flags.response", "FT_BOOLEAN", "dns"),
    _F("Questions", "dns.count.queries", "FT_UINT16", "dns"),
    _F("Answer RRs", "dns.count.answers", "FT_UINT16", "dns"),
    _F("Authority RRs", "dns.count.auth_rr", "FT_UINT16", "dns"),
    _F("Additional RRs", "dns.count.add_rr", "FT_UINT16", "dns"),
    _F("Name", "dns.qry.name", "FT_STRING", "dns"),
    _F("Type", "dns.qry.type", "FT_UINT16", "dns"),
    _F("Address", "dns.a", "FT_IPv4", "dns"),
    _F("AAAA Address", "dns.aaaa", "FT_IPv6", "dns"),
    _F("CNAME", "dns.cname", "FT_STRING", "dns"),
    _F("Time to live", "dns.resp.ttl", "FT_UINT32", "dns"),
    # http
    _F("Request Method", "http.request.method", "FT_STRING", "http"),
    _F("Request URI", "http.request.uri", "FT_STRING", "http"),
    _F("Request Version", "http.request.version", "FT_STRING", "http"),
    _F("Response Version", "http.response.version", "FT_STRING", "http"),
    _F("Status Code", "http.response.code", "FT_UINT16", "http"),
    _F("Response Phrase", "http.response.phrase", "FT_STRING", "http"),
    # ntp (field names/types match tshark's epan NTP dissector surface)
    _F("Leap Indicator", "ntp.flags.li", "FT_UINT8", "ntp"),
    _F("Version number", "ntp.flags.vn", "FT_UINT8", "ntp"),
    _F("Mode", "ntp.flags.mode", "FT_UINT8", "ntp"),
    _F("Peer Clock Stratum", "ntp.stratum", "FT_UINT8", "ntp"),
    _F("Peer Polling Interval", "ntp.ppoll", "FT_INT8", "ntp"),
    _F("Transmit Timestamp", "ntp.xmt", "FT_ABSOLUTE_TIME", "ntp"),
    # dhcp (BOOTP framing; names match tshark's epan DHCP dissector)
    _F("Message type", "dhcp.type", "FT_UINT8", "dhcp"),
    _F("Transaction ID", "dhcp.id", "FT_UINT32", "dhcp"),
    _F("Client IP address", "dhcp.ip.client", "FT_IPv4", "dhcp"),
    _F("Your (client) IP address", "dhcp.ip.your", "FT_IPv4", "dhcp"),
    _F("Client MAC address", "dhcp.hw.mac_addr", "FT_ETHER", "dhcp"),
    _F("DHCP Message Type", "dhcp.option.dhcp", "FT_UINT8", "dhcp"),
    # tls
    _F("Content Type", "tls.record.content_type", "FT_UINT8", "tls"),
    _F("Version", "tls.record.version", "FT_UINT16", "tls"),
    _F("Length", "tls.record.length", "FT_UINT16", "tls"),
    _F("Handshake Type", "tls.handshake.type", "FT_UINT8", "tls"),
    _F("Version", "tls.handshake.version", "FT_UINT16", "tls"),
    _F("Cipher Suites Length", "tls.handshake.cipher_suites_length",
       "FT_UINT16", "tls"),
    _F("JA3 Fingerprint", "tls.handshake.ja3", "FT_STRING", "tls"),
    _F("JA3 String", "tls.handshake.ja3_string", "FT_STRING", "tls"),
    _F("JA3S Fingerprint", "tls.handshake.ja3s", "FT_STRING", "tls"),
    _F("JA3S String", "tls.handshake.ja3s_string", "FT_STRING", "tls"),
    _F("Server Name", "tls.handshake.extensions_server_name", "FT_STRING",
       "tls"),
    # sip (RFC 3261 signaling; tshark's capitalized filter names)
    _F("Method", "sip.Method", "FT_STRING", "sip"),
    _F("Status-Code", "sip.Status-Code", "FT_UINT32", "sip"),
    _F("Call-ID", "sip.Call-ID", "FT_STRING", "sip"),
    _F("SIP from address", "sip.from.addr", "FT_STRING", "sip"),
    _F("SIP to address", "sip.to.addr", "FT_STRING", "sip"),
    # snmp (v1/v2c BER header; snmp.pdu_type is this engine's scalar for
    # the context-tag choice tshark models as the snmp.data subtree)
    _F("Version", "snmp.version", "FT_UINT8", "snmp"),
    _F("Community", "snmp.community", "FT_STRING", "snmp"),
    _F("PDU type", "snmp.pdu_type", "FT_UINT8", "snmp"),
    # syslog
    _F("Facility", "syslog.facility", "FT_UINT8", "syslog"),
    _F("Level", "syslog.level", "FT_UINT8", "syslog"),
    _F("Message", "syslog.msg", "FT_STRING", "syslog"),
    # tftp (initial RRQ/WRQ only — transfers move to an ephemeral port,
    # documented deviation in sources/native.py)
    _F("Opcode", "tftp.opcode", "FT_UINT16", "tftp"),
    _F("Source File", "tftp.source_file", "FT_STRING", "tftp"),
    _F("Destination File", "tftp.destination_file", "FT_STRING", "tftp"),
    _F("Type", "tftp.type", "FT_STRING", "tftp"),
    # igmp
    _F("Type", "igmp.type", "FT_UINT8", "igmp"),
    _F("Max Resp Time", "igmp.max_resp", "FT_UINT8", "igmp"),
    _F("Multicast Address", "igmp.maddr", "FT_IPv4", "igmp"),
    # sctp (common header + first chunk type)
    _F("Source port", "sctp.srcport", "FT_UINT16", "sctp"),
    _F("Destination port", "sctp.dstport", "FT_UINT16", "sctp"),
    _F("Verification tag", "sctp.verification_tag", "FT_UINT32", "sctp"),
    _F("Chunk type", "sctp.chunk_type", "FT_UINT8", "sctp"),
    # pop / imap (line-protocol control channels)
    _F("Request command", "pop.request.command", "FT_STRING", "pop"),
    _F("Response indicator", "pop.response.indicator", "FT_STRING", "pop"),
    _F("Request Tag", "imap.request.tag", "FT_STRING", "imap"),
    _F("Request Command", "imap.request.command", "FT_STRING", "imap"),
    _F("Response Status", "imap.response.status", "FT_STRING", "imap"),
    # smb / smb2 (magic-gated on 445; lateral-movement visibility)
    _F("SMB Command", "smb.cmd", "FT_UINT8", "smb"),
    _F("Command", "smb2.cmd", "FT_UINT16", "smb2"),
    _F("Response", "smb2.flags.response", "FT_BOOLEAN", "smb2"),
    _F("Message ID", "smb2.msg_id", "FT_UINT64", "smb2"),
    _F("Session Id", "smb2.sesid", "FT_UINT64", "smb2"),
    # modbus/tcp (MBAP proto-id-0 gated; ICS/OT inventory)
    _F("Transaction Identifier", "mbtcp.trans_id", "FT_UINT16", "mbtcp"),
    _F("Unit Identifier", "mbtcp.unit_id", "FT_UINT8", "mbtcp"),
    _F("Function Code", "modbus.func_code", "FT_UINT8", "modbus"),
    # mqtt
    _F("Message Type", "mqtt.msgtype", "FT_UINT8", "mqtt"),
    _F("Protocol Name", "mqtt.protoname", "FT_STRING", "mqtt"),
    _F("Client ID", "mqtt.clientid", "FT_STRING", "mqtt"),
    # tpkt / x224 (the RDP envelope)
    _F("Version", "tpkt.version", "FT_UINT8", "tpkt"),
    _F("Length", "tpkt.length", "FT_UINT16", "tpkt"),
    _F("PDU Type", "x224.type", "FT_UINT8", "x224"),
    # radius
    _F("Code", "radius.code", "FT_UINT8", "radius"),
    _F("Identifier", "radius.id", "FT_UINT8", "radius"),
    _F("Length", "radius.length", "FT_UINT16", "radius"),
    # ospf
    _F("Version", "ospf.version", "FT_UINT8", "ospf"),
    _F("Message", "ospf.msg", "FT_UINT8", "ospf"),
    _F("Source OSPF Router", "ospf.srcrouter", "FT_IPv4", "ospf"),
    _F("Area ID", "ospf.area_id", "FT_IPv4", "ospf"),
    # wireguard
    _F("Type", "wg.type", "FT_UINT8", "wg"),
    _F("Sender Index", "wg.sender", "FT_UINT32", "wg"),
    _F("Receiver Index", "wg.receiver", "FT_UINT32", "wg"),
    # bgp (marker-gated on 179)
    _F("Length", "bgp.length", "FT_UINT16", "bgp"),
    _F("Type", "bgp.type", "FT_UINT8", "bgp"),
    _F("Version", "bgp.open.version", "FT_UINT8", "bgp"),
    _F("My AS", "bgp.open.myas", "FT_UINT16", "bgp"),
    _F("BGP Identifier", "bgp.open.identifier", "FT_IPv4", "bgp"),
    # rtsp
    _F("Method", "rtsp.method", "FT_STRING", "rtsp"),
    _F("URL", "rtsp.url", "FT_STRING", "rtsp"),
    _F("Status", "rtsp.status", "FT_UINT32", "rtsp"),
    # ldap (BER-gated on 389; ldap.protocolOp is this engine's scalar
    # for the application op tag tshark models as a choice subtree)
    _F("Message Id", "ldap.messageID", "FT_UINT32", "ldap"),
    _F("ProtocolOp", "ldap.protocolOp", "FT_UINT8", "ldap"),
    # telnet (IAC-negotiation-gated on 23)
    _F("Command", "telnet.cmd", "FT_UINT8", "telnet"),
    _F("Option", "telnet.opt", "FT_UINT8", "telnet"),
    # http2 (connection-preface gated, any port)
    _F("Length", "http2.length", "FT_UINT24", "http2"),
    _F("Type", "http2.type", "FT_UINT8", "http2"),
    _F("Stream Identifier", "http2.streamid", "FT_UINT32", "http2"),
    # mysql / pgsql / redis / amqp (service-greeting magic gates;
    # redis.command is this engine's scalar for the RESP request verb)
    _F("Protocol", "mysql.protocol", "FT_UINT8", "mysql"),
    _F("Version", "mysql.version", "FT_STRING", "mysql"),
    _F("Length", "pgsql.length", "FT_UINT32", "pgsql"),
    _F("Frontend", "pgsql.frontend", "FT_BOOLEAN", "pgsql"),
    _F("Command", "redis.command", "FT_STRING", "redis"),
    _F("Major", "amqp.version.major", "FT_UINT8", "amqp"),
    _F("Minor", "amqp.version.minor", "FT_UINT8", "amqp"),
    # dtls (structural gate: type + version + exact record length)
    _F("Content Type", "dtls.record.content_type", "FT_UINT8", "dtls"),
    _F("Version", "dtls.record.version", "FT_UINT16", "dtls"),
    _F("Length", "dtls.record.length", "FT_UINT16", "dtls"),
    # gtp (v1-U on 2152; outer_* is the decap deviation shared with
    # vxlan/gre)
    _F("Flags", "gtp.flags", "FT_UINT8", "gtp"),
    _F("Message Type", "gtp.message", "FT_UINT8", "gtp"),
    _F("TEID", "gtp.teid", "FT_UINT32", "gtp"),
    _F("Outer IP source (decap)", "gtp.outer_ip_src", "FT_IPv4", "gtp"),
    _F("Outer IP destination (decap)", "gtp.outer_ip_dst", "FT_IPv4",
       "gtp"),
    # kerberos
    _F("MSG Type", "kerberos.msg_type", "FT_UINT8", "kerberos"),
    # nbns (first-level-decoded names)
    _F("Transaction ID", "nbns.id", "FT_UINT16", "nbns"),
    _F("Response", "nbns.flags.response", "FT_BOOLEAN", "nbns"),
    _F("Name", "nbns.name", "FT_STRING", "nbns"),
    # rip
    _F("Command", "rip.command", "FT_UINT8", "rip"),
    _F("Version", "rip.version", "FT_UINT8", "rip"),
    # stun (magic-cookie gated, any UDP port)
    _F("Message Type", "stun.type", "FT_UINT16", "stun"),
    _F("Message Length", "stun.length", "FT_UINT16", "stun"),
    # isakmp / ike (500 + NAT-T 4500)
    _F("Version", "isakmp.version", "FT_UINT8", "isakmp"),
    _F("Exchange type", "isakmp.exchangetype", "FT_UINT8", "isakmp"),
    _F("Length", "isakmp.length", "FT_UINT32", "isakmp"),
    # pptp (magic-cookie gated on 1723)
    _F("Length", "pptp.length", "FT_UINT16", "pptp"),
    _F("Control Message Type", "pptp.type", "FT_UINT16", "pptp"),
    # dnp3 (0x0564-gated on 20000; ICS next to Modbus)
    _F("Length", "dnp3.len", "FT_UINT8", "dnp3"),
    _F("Control", "dnp3.ctl", "FT_UINT8", "dnp3"),
    _F("Destination", "dnp3.dst", "FT_UINT16", "dnp3"),
    _F("Source", "dnp3.src", "FT_UINT16", "dnp3"),
    # bacnet bvlc (0x81-gated on 47808)
    _F("Function", "bvlc.function", "FT_UINT8", "bvlc"),
    _F("BVLC-Length", "bvlc.length", "FT_UINT16", "bvlc"),
    # l2tp (version-bits gated on 1701)
    _F("Type", "l2tp.type", "FT_UINT8", "l2tp"),
    _F("Tunnel ID", "l2tp.tunnel", "FT_UINT16", "l2tp"),
    _F("Session ID", "l2tp.session", "FT_UINT16", "l2tp"),
    # git (pkt-line gated on 9418; git.service is this engine's scalar
    # for the request service string)
    _F("Packet length", "git.packet_len", "FT_UINT16", "git"),
    _F("Service", "git.service", "FT_STRING", "git"),
    # irc
    _F("Command", "irc.request.command", "FT_STRING", "irc"),
    _F("Command", "irc.response.num_command", "FT_UINT16", "irc"),
    # tacacs+ (version-nibble + exact-length gated on 49)
    _F("Type", "tacplus.type", "FT_UINT8", "tacplus"),
    _F("Session ID", "tacplus.session_id", "FT_UINT32", "tacplus"),
    # coap (version-bits gated on 5683)
    _F("Type", "coap.type", "FT_UINT8", "coap"),
    _F("Code", "coap.code", "FT_UINT8", "coap"),
    _F("Message ID", "coap.mid", "FT_UINT16", "coap"),
    # memcache / nats (text-command gated; nats.command is this
    # engine's name — tshark has no NATS dissector)
    _F("Command", "memcache.command", "FT_STRING", "memcache"),
    _F("Command", "nats.command", "FT_STRING", "nats"),
    # icmpv6 NDP targets (the IPv6 ARP-spoofing analytic surface)
    _F("Target Address", "icmpv6.nd.ns.target_address", "FT_IPv6",
       "icmpv6"),
    _F("Target Address", "icmpv6.nd.na.target_address", "FT_IPv6",
       "icmpv6"),
    # _ws.col (unknown-protocol fields sort last in FetchSelectedFields)
    _F("Information", "_ws.col.info", "FT_STRING", "_ws.col"),
]


# ---------------------------------------------------------------------------
# tshark -G parsing (cpp:288-338 protocols, cpp:357-425 fields)
# ---------------------------------------------------------------------------


def check_tshark_installed() -> bool:
    """Reference A12 (cpp:254-261) — here a PATH probe, no subprocess."""
    return shutil.which("tshark") is not None


def parse_protocols_output(text: str) -> list[GlossaryProtocol]:
    """Parse `tshark -G protocols` TSV (6 columns, T/F booleans)."""
    out = []
    for line in text.splitlines():
        parts = [p.strip() for p in line.split("\t")]
        if len(parts) < 3:
            continue
        flags = [(p == "T") for p in parts[3:6]] + [True] * 3
        out.append(
            GlossaryProtocol(parts[0], parts[1], parts[2], *flags[:3])
        )
    return out


def parse_fields_output(text: str) -> list[GlossaryField]:
    """Parse `tshark -G fields` TSV, keeping only `F` rows (cpp:368-375),
    deduping filter_name on first occurrence (deviation, §4.4)."""
    out = []
    seen: set[str] = set()
    for line in text.splitlines():
        parts = [p.strip() for p in line.split("\t")]
        if not parts or parts[0] != "F" or len(parts) < 5:
            continue
        filter_name = parts[2]
        if filter_name in seen:
            continue
        seen.add(filter_name)
        out.append(
            GlossaryField(
                field_name=parts[1],
                filter_name=filter_name,
                field_type=parts[3],
                protocol_filter_name=parts[4],
                encoding=parts[5] if len(parts) > 5 else None,
                bitmask=parts[6] if len(parts) > 6 else None,
                description=parts[7] if len(parts) > 7 else None,
            )
        )
    return out


def _run_tshark_g(what: str) -> str:
    # argv list, never a shell string (deviation from cpp popen, §4.4)
    res = subprocess.run(
        ["tshark", "-G", what], capture_output=True, text=True, check=True
    )
    return res.stdout


# ---------------------------------------------------------------------------
# Build / cache / load
# ---------------------------------------------------------------------------


# Bump when BUILTIN_* content changes: the glossary parquet cache is keyed
# by version so an old cache can't mask newly added builtin fields.
GLOSSARY_VERSION = 22  # v16: r14 breadth batches — sip/snmp/syslog/
# tftp/igmp/sctp/pop/imap/mdns/llmnr, then smb/smb2/mbtcp/modbus/mqtt/
# tpkt/x224/radius/ospf/wg, then bgp/rtsp/ldap/telnet + DNS-over-TCP,
# then http2/mysql/pgsql/redis/amqp, then dtls/gtp/kerberos/nbns/rip + stun/isakmp/ssdp,
# then pptp/dnp3/bvlc/l2tp/git/irc/tacplus,
# then coap/memcache/nats + icmpv6 NDP targets


def cache_dir() -> str:
    env = os.environ.get(_CACHE_ENV)
    if env:
        return env
    # repo-local cache when the package lives on a real filesystem; when
    # imported from an addPyFile zip (executor-side), fall back to tempdir
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if os.path.isdir(root):
        return os.path.join(root, f".wireduck_cache/v{GLOSSARY_VERSION}")
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"wireduck_glossary_cache_v{GLOSSARY_VERSION}"
    )


def spark_scratch_dir() -> str:
    """Per-PROCESS root for Spark-written scratch output (sink round-trips,
    federation catalog dims, capture re-writes).

    Spark directory writes are not atomic and ``mode("overwrite")`` deletes
    the target first, so two concurrent sessions sharing one scratch path
    race: round 7 measured it — two corpus validation runs both overwrote
    ``service_catalog.parquet`` and one read back an empty directory
    (``[PATH_NOT_FOUND]`` / 0-file write warning). Synth pcap writers are
    immune (tmp + os.replace, exists-guard); every path SPARK writes must
    instead be process-private. Dead processes' directories are reaped
    best-effort on first use so repeated runs don't accumulate."""
    root = os.path.join(cache_dir(), "spark_scratch")
    mine = os.path.join(root, f"pid-{os.getpid()}")
    if not os.path.isdir(mine):
        os.makedirs(mine, exist_ok=True)
        import shutil

        for entry in os.listdir(root):
            if not entry.startswith("pid-") or entry == f"pid-{os.getpid()}":
                continue
            try:
                os.kill(int(entry[4:]), 0)  # raises if pid is gone
            except (ProcessLookupError, ValueError):
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
            except PermissionError:
                pass  # live pid owned by someone else — leave it
    return mine


def build_glossary(
    use_tshark: bool | None = None,
) -> tuple[list[GlossaryProtocol], list[GlossaryField]]:
    """Build the glossary rows — from tshark when available, else builtin."""
    if use_tshark is None:
        use_tshark = check_tshark_installed()
    if use_tshark:
        return (
            parse_protocols_output(_run_tshark_g("protocols")),
            parse_fields_output(_run_tshark_g("fields")),
        )
    return list(BUILTIN_PROTOCOLS), list(BUILTIN_FIELDS)


def save_glossary(protocols, fields, directory: str | None = None) -> str:
    """Persist as parquet via pyarrow (no SparkSession needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    directory = directory or cache_dir()
    os.makedirs(directory, exist_ok=True)
    pq.write_table(
        pa.table({
            "full_name": [p.full_name for p in protocols],
            "short_name": [p.short_name for p in protocols],
            "filter_name": [p.filter_name for p in protocols],
            "can_enable": [p.can_enable for p in protocols],
            "is_displayed": [p.is_displayed for p in protocols],
            "is_filterable": [p.is_filterable for p in protocols],
        }),
        os.path.join(directory, "glossary_protocols.parquet"),
    )
    pq.write_table(
        pa.table({
            "field_name": [f.field_name for f in fields],
            "filter_name": [f.filter_name for f in fields],
            "field_type": [f.field_type for f in fields],
            "protocol_filter_name": [f.protocol_filter_name for f in fields],
            "encoding": [f.encoding for f in fields],
            "bitmask": [f.bitmask for f in fields],
            "description": [f.description for f in fields],
        }),
        os.path.join(directory, "glossary_fields.parquet"),
    )
    return directory


def load_fields(directory: str | None = None) -> list[GlossaryField]:
    """Load glossary fields from cache; build+save on cold start."""
    import pyarrow.parquet as pq

    directory = directory or cache_dir()
    path = os.path.join(directory, "glossary_fields.parquet")
    if not os.path.exists(path):
        protocols, fields = build_glossary()
        save_glossary(protocols, fields, directory)
        return fields
    t = pq.read_table(path)
    cols = {name: t.column(name).to_pylist() for name in t.column_names}
    return [
        GlossaryField(
            cols["field_name"][i], cols["filter_name"][i], cols["field_type"][i],
            cols["protocol_filter_name"][i], cols["encoding"][i],
            cols["bitmask"][i], cols["description"][i],
        )
        for i in range(t.num_rows)
    ]


def fetch_selected_fields(
    protocols: list[str], fields: list[GlossaryField] | None = None
) -> list[GlossaryField]:
    """Replicates FetchSelectedFields (cpp:53-78): the 5 default frame
    fields plus every field of the requested protocols, ordered
    frame-first, then requested protocols in argument order, then
    unknown-protocol fields (`_ws.col.info`) last; glossary insertion
    order within each rank."""
    fields = fields if fields is not None else load_fields()

    def rank(f: GlossaryField):
        if f.protocol_filter_name == "frame":
            return -1
        if f.protocol_filter_name in protocols:
            return 1 + protocols.index(f.protocol_filter_name)
        return 10**9  # NULL ordering in the reference CASE -> sorts last

    selected = [
        (i, f)
        for i, f in enumerate(fields)
        if f.filter_name in DEFAULT_FIELDS or f.protocol_filter_name in protocols
    ]
    selected.sort(key=lambda t: (rank(t[1]), t[0]))
    return [f for _, f in selected]


# ---------------------------------------------------------------------------
# Spark-facing API (reference A11/A13 parity)
# ---------------------------------------------------------------------------


def initialize_glossary(spark, force: bool = False, directory: str | None = None):
    """Build/refresh the glossary cache and register the two temp views.
    Returns the reference-shaped status DataFrame (A11, cpp:430-450)."""
    directory = directory or cache_dir()
    pp = os.path.join(directory, "glossary_protocols.parquet")
    fp = os.path.join(directory, "glossary_fields.parquet")
    if force or not (os.path.exists(pp) and os.path.exists(fp)):
        protocols, fields = build_glossary()
        save_glossary(protocols, fields, directory)
    spark.read.parquet(pp).createOrReplaceTempView("glossary_protocols")
    spark.read.parquet(fp).createOrReplaceTempView("glossary_fields")
    return spark.createDataFrame(
        [("glossary_protocols initialized",), ("glossary_fields initialized",)],
        "status_message: string",
    )
