"""Per-IP admission budgets: politeness across virtual hosts.

Per-host tokens (C7) and per-domain budgets (operators/domain_budget.py)
key politeness by *names*. Shared hosting breaks that assumption: one
physical server (one IP) can front thousands of virtual hosts, and a
crawler that is polite per-host can still hammer the box (the Mercator
and IRLbot papers both call this out — politeness must ultimately be
enforced at the network endpoint). Production schedulers therefore
stack a third budget keyed by resolved IP.

DNS resolution is an external input, so the operator takes a resolver
TABLE ``dns(host, ip)`` rather than doing lookups: on a real cluster
that table is the resolver cache the fetch tier already maintains. In
this sandbox (no network) tests and oracles derive a deterministic
synthetic resolution via ``synthetic_ips`` — md5-bucketed into a small
pool so co-hosting actually occurs and the budget is non-vacuous.

Semantics (frozen, oracle-checked by ``c_ip_politeness``):
  rows already not admitted never consume IP budget; within each IP the
  host-admitted rows are ranked by the frozen HOST_ORDER (priority
  desc, depth asc, canon_url asc) and the first ``ip_k`` stay admitted,
  the rest are demoted to deferred (same lifecycle as a host-budget
  deferral). Hosts with no resolver row keep ``ip = host`` — an
  unresolved host can never be throttled by some *other* host's
  traffic, only by its own.

Scale shape: the left side is the post-politeness batch (bounded by
politeness_k x |hosts in batch|, never the raw frontier); ``dns`` joins
on host — pre-filter it with a semi-join against the batch's distinct
hosts if the resolver cache is large, and AQE turns the join broadcast
when the filtered side is small. The per-IP rank has the same bounded
fan-in argument as the domain budget: an IP needs ~10^5 admitted rows
in one batch before its window partition is hot, at which point salting
(C17) on the window key applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.frontier import host_order


def synthetic_ips(hosts: DataFrame, pool: int, host_col: str = "host") -> DataFrame:
    """Deterministic stand-in resolver: md5-bucket each host into a
    ``pool``-sized 10.0.0.0/8 address set (value-reproducible in any
    engine — the sandbox has no real DNS). One row per input row; feed
    it distinct hosts."""
    if pool <= 0:
        raise ValueError(f"pool must be positive, got {pool}")
    n = (
        F.conv(F.substring(F.md5(F.col(host_col)), 1, 8), 16, 10).cast("long")
        % F.lit(pool)
    )
    ip = F.concat(
        F.lit("10."),
        ((n / 65536).cast("long") % 256).cast("string"),
        F.lit("."),
        ((n / 256).cast("long") % 256).cast("string"),
        F.lit("."),
        (n % 256).cast("string"),
    )
    return hosts.select(F.col(host_col).alias("host"), ip.alias("ip"))


def apply_ip_budget(
    admitted: DataFrame,
    dns: DataFrame,
    ip_k: int,
    host_col: str = "host",
    admitted_col: str = "admitted",
) -> DataFrame:
    """Demote ``admitted`` rows past the per-IP budget.

    Input: the post-politeness frame (C7 output, optionally after the
    domain budget). ``dns``: (host, ip) resolver rows, at most one per
    host. Output: same columns plus ``ip`` and with ``admitted``
    tightened.
    """
    if ip_k <= 0:
        raise ValueError(f"ip_k must be positive, got {ip_k}")
    resolved = (
        admitted.join(
            dns.select(F.col("host").alias(host_col), "ip"), on=host_col, how="left"
        )
        .withColumn("ip", F.coalesce(F.col("ip"), F.col(host_col)))
    )
    w = Window.partitionBy("ip", admitted_col).orderBy(*host_order())
    return (
        resolved.withColumn("rn_ip", F.row_number().over(w))
        .withColumn(
            admitted_col,
            F.col(admitted_col) & (F.col("rn_ip") <= F.lit(ip_k)),
        )
        .drop("rn_ip")
    )
