"""PCAP ingest: byte-level parse correctness + flow-feature stability.

Builds real Ethernet/IPv4/TCP+UDP frames with struct (no scapy), writes
a classic-pcap fixture, parses it through the distributed binaryFile +
mapInPandas path, and (a) checks decoded fields against the known frame
contents, (b) replays the packets through the batch sessionizer and
asserts the 77-feature output is hash-stable run-to-run (VERDICT r1
item 6 done-criterion).
"""

from __future__ import annotations

import struct

import pytest

from anti_ddos_spark.sources.pcap import (
    parse_pcap_bytes,
    pcap_to_packets,
    write_pcap,
)


def _ipv4(src: str, dst: str, proto: int, payload: bytes) -> bytes:
    total = 20 + len(payload)
    hdr = struct.pack(
        "!BBHHHBBH4s4s",
        0x45, 0, total, 0, 0, 64, proto, 0,
        bytes(int(o) for o in src.split(".")),
        bytes(int(o) for o in dst.split(".")),
    )
    return hdr + payload


def _tcp(sport, dport, seq, ack, flags, win, payload=b"") -> bytes:
    return (
        struct.pack("!HHIIBBHHH", sport, dport, seq, ack, 5 << 4, flags, win, 0, 0)
        + payload
    )


def _udp(sport, dport, payload=b"") -> bytes:
    return struct.pack("!HHHH", sport, dport, 8 + len(payload), 0) + payload


def _eth(ip_packet: bytes) -> bytes:
    return b"\x02" * 6 + b"\x04" * 6 + struct.pack("!H", 0x0800) + ip_packet


BASE_TS = 1_700_000_000.0


def _fixture_frames() -> list[tuple[float, bytes]]:
    frames = []
    # a TCP handshake + data exchange (flow A, both directions)
    frames.append((BASE_TS + 0.000001,
                   _eth(_ipv4("10.0.0.1", "10.0.1.1", 6,
                              _tcp(40000, 443, 100, 0, 0b00000010, 64240)))))  # SYN
    frames.append((BASE_TS + 0.000500,
                   _eth(_ipv4("10.0.1.1", "10.0.0.1", 6,
                              _tcp(443, 40000, 7000, 101, 0b00010010, 65535)))))  # SYN+ACK
    frames.append((BASE_TS + 0.001200,
                   _eth(_ipv4("10.0.0.1", "10.0.1.1", 6,
                              _tcp(40000, 443, 101, 7001, 0b00011000, 64240,
                                   b"x" * 1200)))))  # PSH+ACK bulk
    frames.append((BASE_TS + 0.002000,
                   _eth(_ipv4("10.0.1.1", "10.0.0.1", 6,
                              _tcp(443, 40000, 7001, 1301, 0b00010001, 65535)))))  # FIN+ACK
    # a UDP exchange (flow B)
    frames.append((BASE_TS + 0.003000,
                   _eth(_ipv4("10.0.0.2", "10.0.1.2", 17, _udp(5353, 53, b"q" * 40)))))
    frames.append((BASE_TS + 0.004000,
                   _eth(_ipv4("10.0.1.2", "10.0.0.2", 17, _udp(53, 5353, b"r" * 120)))))
    # noise the parser must skip: ARP frame and an ICMP (proto 1) packet
    frames.append((BASE_TS + 0.005000,
                   b"\x02" * 6 + b"\x04" * 6 + struct.pack("!H", 0x0806) + b"\x00" * 28))
    frames.append((BASE_TS + 0.006000,
                   _eth(_ipv4("10.0.0.3", "10.0.1.3", 1, b"\x08\x00\x00\x00"))))
    return frames


def test_parse_pcap_bytes_fields(tmp_path):
    p = str(tmp_path / "fix.pcap")
    write_pcap(p, _fixture_frames())
    rows = list(parse_pcap_bytes(open(p, "rb").read()))
    assert len(rows) == 6  # ARP + ICMP skipped

    syn = rows[0]
    assert (syn["src_ip"], syn["dst_ip"]) == ("10.0.0.1", "10.0.1.1")
    assert (syn["src_port"], syn["dst_port"]) == (40000, 443)
    assert syn["syn_flag"] == 1 and syn["ack_flag"] == 0
    assert syn["tcp_win"] == 64240 and syn["tcp_len"] == 0
    assert syn["timestamp"].timestamp() == pytest.approx(BASE_TS, abs=1e-5)

    bulk = rows[2]
    assert bulk["tcp_len"] == 1200 and bulk["psh_flag"] == 1
    assert bulk["length"] == 14 + 20 + 20 + 1200

    fin = rows[3]
    assert fin["fin_flag"] == 1 and fin["ack_flag"] == 1

    udp_q = rows[4]
    assert udp_q["protocol"] == 17 and udp_q["udp_len"] == 40
    assert udp_q["tcp_seq"] is None and udp_q["tcp_len"] is None


def test_fragmented_packets_skipped(tmp_path):
    """Non-first IP fragments carry payload where an L4 header would be —
    parsing them fabricates ports/flags (classic fragmented-flood shape);
    the parser must drop them like the scapy reference does."""
    frag_ip = struct.pack(
        "!BBHHHBBH4s4s",
        0x45, 0, 20 + 48, 1234,
        0x00B9,  # frag_offset = 185 (payload continues, no UDP header)
        64, 17, 0,
        bytes([10, 0, 0, 9]), bytes([10, 0, 1, 9]),
    ) + b"\xff" * 48
    p = str(tmp_path / "frag.pcap")
    write_pcap(p, [(BASE_TS, _eth(frag_ip)),
                   (BASE_TS + 1, _eth(_ipv4("10.0.0.2", "10.0.1.2", 17,
                                            _udp(5353, 53, b"q" * 10))))])
    rows = list(parse_pcap_bytes(open(p, "rb").read()))
    assert len(rows) == 1 and rows[0]["src_ip"] == "10.0.0.2"


def test_truncated_and_foreign_bytes(tmp_path):
    p = str(tmp_path / "trunc.pcap")
    write_pcap(p, _fixture_frames())
    data = open(p, "rb").read()
    # chop mid-record (150 B cuts into the UDP response, past the
    # trailing ARP+ICMP records the parser skips anyway): the parser
    # must yield the complete prefix, not raise
    rows = list(parse_pcap_bytes(data[:-150]))
    assert len(rows) == 5
    with pytest.raises(ValueError):
        list(parse_pcap_bytes(b"\x0a\x0d\x0d\x0a" + b"\x00" * 100))  # pcapng magic


def test_pcap_to_flow_features_hash_stable(spark, tmp_path):
    """Distributed parse → batch sessionizer twice; identical output."""
    from anti_ddos_spark.sessionize import flow_features

    d = tmp_path / "caps"
    d.mkdir()
    write_pcap(str(d / "a.pcap"), _fixture_frames())
    # second capture file proves per-file parallel parse unions cleanly;
    # shifted past the session gap so its flows stay distinct sessions
    shifted = [(ts + 3600.0, fr) for ts, fr in _fixture_frames()]
    write_pcap(str(d / "b.pcap"), shifted)

    def run():
        pkts = pcap_to_packets(spark, str(d))
        flows = flow_features(pkts)
        return sorted(tuple(str(v) for v in r) for r in flows.collect())

    first, second = run(), run()
    assert first == second
    assert len(first) == 4  # 2 files × (1 TCP + 1 UDP flow)
    # spot-check: the TCP flow saw the SYN and FIN and the 1200 B bulk
    cols = None
    from anti_ddos_spark.sessionize import flow_features as _ff

    pkts = pcap_to_packets(spark, str(d))
    fdf = _ff(pkts)
    tcp = fdf.filter("protocol = 6").orderBy("timestamp").first()
    assert tcp["syn_flag_count"] == 2  # SYN + SYN/ACK
    assert tcp["fin_flag_count"] == 1
    assert tcp["total_fwd_packets"] + tcp["total_backward_packets"] == 4
    assert tcp["max_packet_length"] == 14 + 20 + 20 + 1200


def _eth_vlan(ip_packet: bytes, tags: int = 1) -> bytes:
    """Ethernet frame wrapping the IP packet in 802.1Q / QinQ tags."""
    import struct as _s

    hdr = b"\x02" * 6 + b"\x04" * 6
    # outer 802.1ad for double-tagged, then 802.1Q, then the ethertype
    tpids = ([0x88A8] if tags == 2 else []) + [0x8100] * min(tags, 1)
    for i, tpid in enumerate(tpids):
        hdr += _s.pack("!HH", tpid, 100 + i)  # TCI: VLAN id 100+i
    return hdr + _s.pack("!H", 0x0800) + ip_packet


def test_vlan_tagged_frames_parsed(tmp_path):
    """ADVICE r2: trunk/mirror-port captures wrap frames in 1-2 VLAN
    tags; the parser must walk past them instead of dropping all
    traffic."""
    from anti_ddos_spark.sources.pcap import parse_pcap_bytes, write_pcap

    p = str(tmp_path / "vlan.pcap")
    ip = _ipv4("10.0.0.9", "10.0.1.9", 17, _udp(1000, 53, b"x" * 30))
    write_pcap(p, [
        (BASE_TS, _eth_vlan(ip, tags=1)),
        (BASE_TS + 1, _eth_vlan(ip, tags=2)),
        (BASE_TS + 2, _eth(ip)),  # untagged control
    ])
    rows = list(parse_pcap_bytes(open(p, "rb").read()))
    assert len(rows) == 3
    for r in rows:
        assert (r["src_ip"], r["dst_ip"], r["protocol"]) == ("10.0.0.9", "10.0.1.9", 17)
        assert r["udp_len"] == 30
