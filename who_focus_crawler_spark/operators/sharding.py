"""Rendezvous (highest-random-weight) assignment of hosts to crawler
shards.

A distributed crawler must agree, with no coordination, on which worker
owns which host — and the assignment must be STABLE: adding or removing
one shard should only move the hosts that land on (or lose) that shard,
never reshuffle everyone (UbiCrawler's consistent host assignment —
Boldi, Codenotti, Santini & Vigna, "UbiCrawler: a scalable fully
distributed Web crawler", Software: Practice & Experience 2004;
weighting per Thaler & Ravishankar's highest-random-weight hashing,
IEEE/ACM ToN 1998).

``assign_shards`` gives every (host, shard) pair a deterministic
md5-derived 60-bit weight and assigns the host to the arg-max shard.
md5 (not xxhash64) so the DuckDB oracle reproduces the weights — the
same engine-portability convention as the LSH hyperplanes. The arg-max
is a native ``array_max`` over a per-row array of (weight, shard)
structs: no shuffle at all — shard assignment is a pure projection, so
at 10^9 hosts it pipelines inside whole-stage codegen.

The minimal-disruption property (only hosts whose arg-max IS the new
shard move when a shard is added) is pinned by a unit test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_weight(host: Column, shard: int) -> Column:
    """Deterministic 60-bit weight for (host, shard): first 15 hex
    digits of md5('<host>#<shard>') — reproducible in any engine."""
    return F.conv(
        F.substring(F.md5(F.concat(host, F.lit(f"#{shard}"))), 1, 15), 16, 10
    ).cast("long")


def shard_of(host: Column, n_shards: int) -> Column:
    """Rendezvous shard id (int) for a host column."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    pairs = F.array(
        *[
            F.struct(
                shard_weight(host, s).alias("w"), F.lit(s).alias("shard")
            )
            for s in range(n_shards)
        ]
    )
    return F.array_max(pairs)["shard"].cast("int")


def assign_shards(
    hosts: DataFrame, n_shards: int, host_col: str = "host"
) -> DataFrame:
    """(host, shard) for every row of ``hosts`` — pure projection."""
    return hosts.select(
        F.col(host_col).alias("host"),
        shard_of(F.col(host_col), n_shards).alias("shard"),
    )
