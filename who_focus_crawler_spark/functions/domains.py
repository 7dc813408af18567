"""Registrable-domain (eTLD+1) extraction for host-level policy.

Politeness, authority scoring, and per-site quotas apply at the
*registrable domain* ("site"), not the raw host: `a.news.example.co.uk`
and `b.example.co.uk` are one site. The real rule set is the Mozilla
Public Suffix List; shipping the full PSL is a data-file concern, so
this module freezes a representative two-level-suffix subset (the PSL
entries that matter for the fixture/test hosts) behind the same
algorithm the full list uses:

  if the last TWO labels form a known multi-part suffix, the
  registrable domain is the last THREE labels; otherwise the last two.

Native expressions only (split + slice + array_join — codegen, no
Python); the suffix set is a plan-side literal array membership test,
exactly how a broadcast of the full PSL would look at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Frozen two-level public-suffix subset (PSL-style), kept sorted.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    "ac.uk",
    "co.in",
    "co.jp",
    "co.uk",
    "com.au",
    "com.br",
    "com.cn",
    "gov.uk",
    "or.jp",
    "org.uk",
)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 of a lowercase host (NULL passthrough; hosts with fewer
    labels than the rule needs return the host unchanged).

    IPv4 literals have no registrable domain (PSL semantics) and are
    returned whole — otherwise '192.168.0.1' and '10.9.0.1' would both
    collapse to '0.1' and unrelated hosts would share domain-level
    policy (budgets, rollups)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    suffixes = F.array(*[F.lit(s) for s in TWO_LEVEL_SUFFIXES])
    take = F.when(
        (n >= 3) & F.array_contains(suffixes, last2), F.lit(3)
    ).otherwise(F.least(n, F.lit(2)))
    eTLD1 = F.array_join(F.slice(labels, n - take + 1, take), ".")
    return F.when(host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$"), host).otherwise(eTLD1)
