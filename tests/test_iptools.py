import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.iptools import (
    CidrTable,
    cidr_enrich,
    ipv4_to_u32,
)


def test_ipv4_parse_valid_and_invalid():
    got = ipv4_to_u32(pa.array([
        "0.0.0.0", "255.255.255.255", "10.1.2.3", "192.168.0.1",
        "256.0.0.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", None, "01.2.3.4",
    ], pa.string()))
    assert got[0] == 0
    assert got[1] == 0xFFFFFFFF
    assert got[2] == (10 << 24) | (1 << 16) | (2 << 8) | 3
    assert got[3] == (192 << 24) | (168 << 16) | 1
    assert list(got[4:9]) == [-1, -1, -1, -1, -1]
    assert got[9] == (1 << 24) | (2 << 16) | (3 << 8) | 4  # leading zero ok


def test_longest_prefix_wins():
    t = CidrTable([("10.0.0.0/8", "corp"),
                   ("10.1.0.0/16", "east"),
                   ("10.1.2.0/24", "lab"),
                   ("0.0.0.0/1", "low")])
    ips = ipv4_to_u32(pa.array(
        ["10.1.2.9", "10.1.9.9", "10.9.9.9", "11.0.0.1", "128.0.0.1"]))
    idx = t.lookup(ips)
    labels = [t.labels[i] if i >= 0 else None for i in idx]
    assert labels == ["lab", "east", "corp", "low", None]


def test_network_bits_beyond_prefix_ignored():
    t = CidrTable([("10.1.2.99/24", "lab")])  # host bits set in the cidr
    assert t.lookup(ipv4_to_u32(pa.array(["10.1.2.1"])))[0] == 0


def test_invalid_cidr_raises():
    with pytest.raises(ValueError):
        CidrTable([("10.0.0.0/0", "x")])
    with pytest.raises(ValueError):
        CidrTable([("10.0.0/8", "x")])


def test_cidr_enrich_dataset_and_default():
    tbl = pa.table({"ip": pa.array(
        ["10.1.2.3", "172.16.5.5", "8.8.8.8", "bogus"], pa.string())})
    out = cidr_enrich(rd.from_arrow(tbl), "ip",
                      [("10.0.0.0/8", "corp"), ("172.16.0.0/12", "vpn")])
    got = [r["net_label"] for r in out.take_all()]
    assert got == ["corp", "vpn", "other", "other"]


def test_lookup_matches_slow_reference():
    rng = np.random.default_rng(3)
    cidrs = []
    for i in range(40):
        plen = int(rng.integers(4, 29))
        net = int(rng.integers(0, 1 << 32)) & (~((1 << (32 - plen)) - 1))
        cidrs.append((f"{net >> 24 & 255}.{net >> 16 & 255}."
                      f"{net >> 8 & 255}.{net & 255}/{plen}", f"l{i}"))
    t = CidrTable(cidrs)
    ips = rng.integers(0, 1 << 32, 500).astype(np.int64)
    got = t.lookup(ips)
    # slow reference: longest prefix, first-listed wins within a length
    parsed = []
    for c, _ in cidrs:
        net_s, plen_s = c.split("/")
        a, b, cc, d = (int(x) for x in net_s.split("."))
        parsed.append(((a << 24) | (b << 16) | (cc << 8) | d, int(plen_s)))
    for ip, g in zip(ips, got):
        best = -1
        best_len = 0
        for j, (net, plen) in enumerate(parsed):
            if (int(ip) >> (32 - plen)) == (net >> (32 - plen)) \
                    and plen > best_len:
                best, best_len = j, plen
        assert g == best
