"""PCAP → packet-table ingest (pure-Python parse, Spark-distributed).

Completes reference parity for S4: the reference replays PCAPs
packet-at-a-time through scapy into Kafka
(producer/reader/simulator.py:86-110, packet_to_json at :20-83); this
module is the batch twin — parse a directory of capture files straight
into the PACKET_SCHEMA relation that every sessionizer/query consumes.

Scale shape: PCAP framing is sequential (each record's length prefixes
the next), so a single capture file is NOT splittable — the unit of
parallelism is the file, exactly how Spark treats gzip. We read via the
``binaryFile`` source (one row per file, content as bytes) and parse in
``mapInPandas`` — Arrow-batched, executor-side, zero driver
involvement; 10k capture files → 10k-way parallel parse. Keep
individual captures to a few hundred MB (rotate at capture time) the
same way you'd size gzip shards.

Field semantics match the reference's packet_to_json:
- length = full frame length (len(pkt) there, captured length here);
- tcp_len = IP total length - IP header - TCP header (payload bytes);
- udp_len = UDP length field - 8 (payload bytes);
- flags decoded from the TCP flag bits; non-IP / non-TCP/UDP frames
  are dropped (simulator.py:25-26 returns None for those).
One deliberate divergence: the reference stamps packets with wall-clock
``datetime.now()`` during replay; we keep the capture's own record
timestamps (sec/usec, nanosecond variant supported) — deterministic and
faithful to the original traffic timing.

No scapy/libpcap dependency: the classic pcap container + Ethernet/
IPv4/TCP/UDP headers are fixed-layout structs, parsed with ``struct``.
pcapng is out of scope (convert with ``tshark -F pcap`` / ``editcap``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from anti_ddos_spark.schemas import PACKET_SCHEMA

# magic → (endianness, sub-second unit in ns)
_MAGIC_TABLE = {
    b"\xd4\xc3\xb2\xa1": ("<", 1_000),   # little-endian, microseconds
    b"\xa1\xb2\xc3\xd4": (">", 1_000),   # big-endian, microseconds
    b"\x4d\x3c\xb2\xa1": ("<", 1),       # little-endian, nanoseconds
    b"\xa1\xb2\x3c\x4d": (">", 1),       # big-endian, nanoseconds
}

ETH_HDR = 14
ETH_IPV4 = 0x0800
# 802.1Q / 802.1ad (QinQ) tags: 4 bytes each between src MAC and the
# real ethertype. Trunk/mirror-port captures wrap most traffic in 1-2 of
# them — a raw offset-12 ethertype check silently drops every frame.
ETH_VLAN = (0x8100, 0x88A8)
_MAX_VLAN_TAGS = 2


def parse_pcap_bytes(data: bytes) -> Iterator[dict]:
    """Yield PACKET_SCHEMA-shaped dicts from classic-pcap bytes.

    Tolerant reader: truncated trailing records and non-IPv4/TCP/UDP
    frames are skipped, mirroring the reference's per-packet
    try/except-continue loop (simulator.py:89-110).
    """
    if len(data) < 24:
        return
    entry = _MAGIC_TABLE.get(data[:4])
    if entry is None:
        raise ValueError("not a classic pcap file (pcapng? convert with editcap)")
    endian, subsec_ns = entry
    # global header: magic, ver_maj, ver_min, thiszone, sigfigs, snaplen, network
    network = struct.unpack(endian + "I", data[20:24])[0]
    if network != 1:  # LINKTYPE_ETHERNET
        raise ValueError(f"unsupported linktype {network} (want Ethernet=1)")

    import datetime as dt

    off = 24
    n = len(data)
    rec = struct.Struct(endian + "IIII")
    while off + 16 <= n:
        sec, sub, incl, _orig = rec.unpack_from(data, off)
        off += 16
        if off + incl > n:  # truncated capture tail
            return
        frame = memoryview(data)[off : off + incl]
        off += incl
        row = _parse_frame(frame, incl)
        if row is None:
            continue
        ts_us = sec * 1_000_000 + (sub * subsec_ns) // 1000
        row["timestamp"] = dt.datetime.fromtimestamp(
            ts_us / 1e6, tz=dt.timezone.utc
        )
        yield row


def _parse_frame(frame: memoryview, incl: int) -> dict | None:
    # walk over up to two VLAN tags (single-tagged + QinQ) to the real
    # ethertype; scapy's Dot1Q layer does the same in the reference path
    eth_off = 12
    for _ in range(_MAX_VLAN_TAGS + 1):
        if len(frame) < eth_off + 2:
            return None
        ethertype = struct.unpack_from("!H", frame, eth_off)[0]
        if ethertype not in ETH_VLAN:
            break
        eth_off += 4
    if ethertype != ETH_IPV4:
        return None
    hdr = eth_off + 2  # end of ethertype field = start of the IP header
    if len(frame) < hdr + 20:
        return None
    ip = frame[hdr:]
    vihl = ip[0]
    if vihl >> 4 != 4:
        return None
    ihl = (vihl & 0x0F) * 4
    if len(ip) < ihl:
        return None
    total_len = struct.unpack_from("!H", ip, 2)[0]
    # non-first IP fragments carry payload (not an L4 header) at the IP
    # payload start — parsing them would fabricate ports/flags from
    # payload bytes. The scapy reference drops them too (no TCP/UDP
    # layer → packet_to_json returns None, simulator.py:25-26).
    # Fragmented floods are a classic DDoS shape, so this path matters.
    frag_off = struct.unpack_from("!H", ip, 6)[0] & 0x1FFF
    if frag_off != 0:
        return None
    proto = ip[9]
    if proto not in (6, 17):
        return None
    src_ip = ".".join(str(b) for b in ip[12:16])
    dst_ip = ".".join(str(b) for b in ip[16:20])
    l4 = ip[ihl:]

    row = dict(
        src_ip=src_ip, dst_ip=dst_ip, length=incl, protocol=int(proto),
        udp_len=None, tcp_seq=None, tcp_ack=None, tcp_win=None, tcp_len=None,
        cwr_flag=0, ece_flag=0, urg_flag=0, ack_flag=0,
        psh_flag=0, rst_flag=0, syn_flag=0, fin_flag=0,
    )
    if proto == 6:
        if len(l4) < 20:
            return None
        sport, dport, seq, ack = struct.unpack_from("!HHII", l4, 0)
        dataofs = (l4[12] >> 4) * 4
        flags = l4[13]
        win = struct.unpack_from("!H", l4, 14)[0]
        row.update(
            src_port=sport, dst_port=dport,
            # PACKET_SCHEMA stores seq/ack as 32-bit signed; mask the
            # uint32 sign bit (features only ever use seq for sort ties)
            tcp_seq=int(seq & 0x7FFFFFFF), tcp_ack=int(ack & 0x7FFFFFFF),
            tcp_win=int(win),
            tcp_len=max(0, total_len - ihl - dataofs),
            fin_flag=flags & 1, syn_flag=(flags >> 1) & 1,
            rst_flag=(flags >> 2) & 1, psh_flag=(flags >> 3) & 1,
            ack_flag=(flags >> 4) & 1, urg_flag=(flags >> 5) & 1,
            ece_flag=(flags >> 6) & 1, cwr_flag=(flags >> 7) & 1,
        )
    else:
        if len(l4) < 8:
            return None
        sport, dport, ulen = struct.unpack_from("!HHH", l4, 0)
        row.update(
            src_port=sport, dst_port=dport,
            udp_len=max(0, ulen - 8), tcp_len=None,
        )
    return row


def pcap_to_packets(spark: SparkSession, path: str) -> DataFrame:
    """Distributed PCAP directory → PACKET_SCHEMA DataFrame.

    ``path`` is a file/dir/glob understood by the binaryFile source.
    Each file parses independently inside mapInPandas (Arrow-batched);
    the driver never sees packet bytes.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pcap")
        .load(path)
        .select("path", "content")
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for file_path, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows = list(parse_pcap_bytes(bytes(content)))
                except ValueError as ex:
                    # one unreadable file (pcapng behind a .pcap name,
                    # foreign linktype) must not abort a 10k-file ingest
                    # — quarantine it to executor stderr and move on,
                    # the per-packet analogue of the reference's
                    # try/except-continue loop (simulator.py:89-110)
                    import sys

                    print(f"pcap_to_packets: skipping {file_path}: {ex}", file=sys.stderr)
                    continue
                if rows:
                    yield pd.DataFrame(rows)[[f.name for f in PACKET_SCHEMA.fields]]

    return files.mapInPandas(parse, schema=PACKET_SCHEMA)


def write_pcap(path: str, rows: list[tuple[float, bytes]]) -> None:
    """Write (epoch_seconds, raw_ethernet_frame) records as classic pcap
    (little-endian, microsecond). Test/fixture helper — the inverse of
    parse_pcap_bytes for round-trip checks."""
    with open(path, "wb") as f:
        f.write(struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1))
        for ts, frame in rows:
            sec = int(ts)
            usec = int(round((ts - sec) * 1e6))
            f.write(struct.pack("<IIII", sec, usec, len(frame), len(frame)))
            f.write(frame)
