"""Per-IP admission budget: co-hosted hosts share the budget, resolved
and unresolved hosts behave per spec, deferred rows never consume it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.ipbudget import (
    apply_ip_budget,
    synthetic_ips,
)


def _admitted(spark, rows):
    # rows: (host, priority, depth, canon_url, admitted)
    return spark.createDataFrame(
        rows, ["host", "priority", "depth", "canon_url", "admitted"]
    )


def _dns(spark, pairs):
    return spark.createDataFrame(pairs, ["host", "ip"])


def test_cohosted_hosts_share_budget(spark):
    # Two hosts on one IP, 3 admitted rows each; ip_k=4 keeps only the
    # 4 best rows ACROSS both hosts (priority desc, depth, canon_url).
    rows = [
        (f"a.example.org", 100 - i, 0, f"http://a.example.org/{i}", True)
        for i in range(3)
    ] + [
        (f"b.example.org", 90 - i, 0, f"http://b.example.org/{i}", True)
        for i in range(3)
    ]
    dns = _dns(spark, [("a.example.org", "10.0.0.1"), ("b.example.org", "10.0.0.1")])
    out = apply_ip_budget(_admitted(spark, rows), dns, ip_k=4).collect()
    kept = sorted(r.canon_url for r in out if r.admitted)
    # a has priorities 100,99,98; b has 90,89,88 → top-4 = a(3) + b's 90
    assert kept == [
        "http://a.example.org/0",
        "http://a.example.org/1",
        "http://a.example.org/2",
        "http://b.example.org/0",
    ]
    assert all(r.ip == "10.0.0.1" for r in out)


def test_unresolved_host_never_coupled(spark):
    # c has no dns row → ip falls back to the host name, so it keeps its
    # own budget even when another IP is saturated.
    rows = [
        ("a.example.org", 100, 0, "http://a.example.org/0", True),
        ("c.example.org", 1, 0, "http://c.example.org/0", True),
    ]
    dns = _dns(spark, [("a.example.org", "10.0.0.9")])
    out = {r.host: r for r in apply_ip_budget(_admitted(spark, rows), dns, 1).collect()}
    assert out["c.example.org"].admitted
    assert out["c.example.org"].ip == "c.example.org"


def test_deferred_rows_do_not_consume_ip_budget(spark):
    # One deferred high-priority row on the same IP must not displace an
    # admitted one.
    rows = [
        ("a.example.org", 999, 0, "http://a.example.org/defer", False),
        ("b.example.org", 1, 0, "http://b.example.org/keep", True),
    ]
    dns = _dns(
        spark, [("a.example.org", "10.0.0.2"), ("b.example.org", "10.0.0.2")]
    )
    out = {r.canon_url: r for r in
           apply_ip_budget(_admitted(spark, rows), dns, 1).collect()}
    assert out["http://b.example.org/keep"].admitted
    assert not out["http://a.example.org/defer"].admitted


def test_synthetic_ips_deterministic_and_pooled(spark):
    hosts = spark.createDataFrame(
        [(f"h{i}.example.org",) for i in range(64)], ["host"]
    )
    one = {r.host: r.ip for r in synthetic_ips(hosts, pool=5).collect()}
    two = {r.host: r.ip for r in synthetic_ips(hosts.repartition(7), pool=5).collect()}
    assert one == two
    assert set(one.values()) <= {f"10.0.0.{k}" for k in range(5)}
    # pool of 5 over 64 hosts must actually co-host
    assert len(set(one.values())) < 64


def test_guards(spark):
    hosts = spark.createDataFrame([("h",)], ["host"])
    with pytest.raises(ValueError):
        synthetic_ips(hosts, pool=0)
    with pytest.raises(ValueError):
        apply_ip_budget(
            _admitted(spark, [("h", 1, 0, "u", True)]),
            _dns(spark, [("h", "10.0.0.1")]),
            0,
        )
