"""Domain-level admission budgets on top of per-host politeness.

Per-host tokens (C7) stop a crawler from hammering one server; they do
NOT stop it from hammering one *site* spread across many hosts
(`img1..img200.example.com`, country mirrors under one registrable
domain, CDNs fronting a single origin). Production schedulers therefore
stack a second budget keyed by registrable domain (eTLD+1,
functions/domains.py) over the host budget.

Semantics (frozen, oracle-checked by ``c_domain_budget``):
  within each registrable domain, the host-admitted rows are ranked by
  the same frozen HOST_ORDER used inside hosts (priority desc, depth
  asc, canon_url asc) and the first ``domain_k`` stay admitted; the rest are
  demoted to deferred (remain enqueued in the frontier — identical
  lifecycle to a host-budget deferral).

Scale shape: one rank per domain. Domains are the skew unit this
operator exists for, so the rank runs through the same two-phase
pattern risk as C9 — but unlike the global sequence, the per-domain
fan-in is bounded by |hosts(domain)| × politeness_k (budgeted input,
not raw frontier), so a plain partitionBy(domain) window holds to
millions of domains; a domain would need ~10^5 admitted hosts in one
batch before its partition is hot, at which point salting (C17) on the
window key applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.domains import registrable_domain
from who_focus_crawler_spark.operators.frontier import host_order


def apply_domain_budget(
    admitted: DataFrame,
    domain_k: int,
    host_col: str = "host",
    admitted_col: str = "admitted",
) -> DataFrame:
    """Demote ``admitted`` rows past the per-domain budget.

    Input: the post-politeness frame (C7 output). Output: same columns
    plus ``domain`` and with ``admitted`` tightened; rows already not
    admitted are untouched and never consume domain budget.
    """
    dom = registrable_domain(F.col(host_col))
    w = Window.partitionBy("domain", admitted_col).orderBy(*host_order())
    return (
        admitted.withColumn("domain", dom)
        .withColumn("rn_dom", F.row_number().over(w))
        .withColumn(
            admitted_col,
            F.col(admitted_col) & (F.col("rn_dom") <= F.lit(domain_k)),
        )
        .drop("rn_dom")
    )
