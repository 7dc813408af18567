"""Iceberg-style partition-spec transforms for the snapshot catalog shim.

A partition spec is a list of fields, each ``{"source": <data column>,
"transform": <transform>, "name": <partition column>}``. Transforms are
the Iceberg v2 set that makes sense over plain Parquet directories:

- ``identity``            — partition by the raw value
- ``bucket[N]``           — ``pmod(xxhash64(source), N)`` (Iceberg uses
                            murmur3-32; the shim standardizes on xxhash64,
                            the hash the rest of the engine already uses —
                            the *property* that matters, stable hash →
                            bounded bucket, is identical)
- ``truncate[W]``         — numeric: ``floor(v / W) * W``; string: first
                            ``W`` characters
- ``year``/``month``/``day``/``hour`` — calendar buckets of a date or
                            timestamp column, encoded as sortable strings
                            (``yyyy``, ``yyyy-MM``, ``yyyy-MM-dd``,
                            ``yyyy-MM-dd-HH``)

``transform_expr`` builds the Spark Column that computes a partition
value; writes use it with ``write.partitionBy`` so each file-set lands in
Hive-layout directories and Catalyst's native partition pruning applies
to reads that filter on the partition column. ``partition_value_expr``
builds the same transform over a LITERAL so point lookups can be turned
into a partition-column predicate (constant-foldable → directory
pruning).

Spec evolution (Iceberg `update_spec`): the catalog stores the CURRENT
spec per table plus, per committed file-set, the spec it was written
under. Changing the spec is a metadata-only commit — old file-sets keep
their directory layout and are planned under it; new writes use the new
layout; a read is one scan per distinct layout (mirroring
`read_table_evolved`'s one-scan-per-physical-schema).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNC_RE = re.compile(r"^truncate\[(\d+)\]$")
_CALENDAR = {
    "year": "yyyy",
    "month": "yyyy-MM",
    "day": "yyyy-MM-dd",
    "hour": "yyyy-MM-dd-HH",
}

_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def validate_spec(spec: list[dict], data_columns: list[str]) -> None:
    """Reject malformed specs before they reach a manifest: every field
    needs a known source column, a recognized transform, and a partition
    column name that collides with nothing (data columns or other
    partition fields)."""
    seen: set[str] = set(data_columns)
    for f in spec:
        missing = {"source", "transform", "name"} - set(f)
        if missing:
            raise ValueError(f"partition spec field {f!r}: missing {missing}")
        if f["source"] not in data_columns:
            raise ValueError(
                f"partition spec: unknown source column {f['source']!r}"
            )
        t = f["transform"]
        if not (
            t == "identity"
            or t in _CALENDAR
            or _BUCKET_RE.match(t)
            or _TRUNC_RE.match(t)
        ):
            raise ValueError(f"partition spec: unknown transform {t!r}")
        if f["name"] in seen:
            raise ValueError(
                f"partition spec: partition column {f['name']!r} collides "
                "with a data column or another partition field"
            )
        seen.add(f["name"])


def transform_expr(field: dict, src: Column, src_type: str) -> Column:
    """The partition value of ``src`` (a data column or a literal) under
    one spec field. ``src_type`` is the source column's Spark simpleString
    type — truncate needs it to pick numeric vs string semantics."""
    t = field["transform"]
    if t == "identity":
        return src
    m = _BUCKET_RE.match(t)
    if m:
        n = int(m.group(1))
        return F.pmod(F.xxhash64(src), F.lit(n)).cast("int")
    m = _TRUNC_RE.match(t)
    if m:
        w = int(m.group(1))
        if src_type in _NUMERIC_TYPES:
            return (F.floor(src / F.lit(w)) * F.lit(w)).cast(src_type)
        return F.substring(src, 1, w)
    return F.date_format(src, _CALENDAR[t])


def partition_value_expr(field: dict, value, src_type: str) -> Column:
    """The transform applied to a literal — used by the catalog's scan
    planner to compute, driver-side (one 1-row job), the partition value
    a point predicate maps to, so it can prune partition directories
    from the manifest the way Iceberg prunes on manifest partition
    tuples. The literal is cast to the SOURCE column's type first —
    xxhash64 hashes by physical width, so bucket(int 7) and
    bucket(bigint 7) would land in different buckets."""
    return transform_expr(field, F.lit(value).cast(src_type), src_type)


def transform_output_type(field: dict, src_type: str) -> str:
    """Spark simpleString type of the partition column one spec field
    produces from a source column of ``src_type``."""
    t = field["transform"]
    if t == "identity":
        return src_type
    if _BUCKET_RE.match(t):
        return "int"
    if _TRUNC_RE.match(t):
        return src_type if src_type in _NUMERIC_TYPES else "string"
    return "string"  # calendar buckets encode as sortable strings
