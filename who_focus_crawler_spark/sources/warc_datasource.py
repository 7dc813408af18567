"""WARC as a first-class Spark data source (Python Data Source API,
Spark 4): ``spark.read.format("warc").load(dir)``.

Where ``sources/warc.py::read_warc`` composes a binaryFile scan with a
mapInPandas parser, this module plugs the SAME verified record parser
(`_parse_file`) into Spark's source interface, which buys three things
the composition can't express:

- **Planner-visible partitions.** `partitions()` lists one
  InputPartition per WARC file — the unit Common Crawl shards by — so
  the scheduler sees the real parallelism and locality surface instead
  of a generic UDF stage.
- **Filter pushdown.** `pushFilters` accepts equality filters on the
  record-header columns (`warc_type`, `target_uri`, `warc_file`) and
  drops non-matching records INSIDE the parser loop, before anything is
  ferried to the JVM — the common "responses only" scan never
  materializes warcinfo/request records. Unsupported filters are handed
  back to Spark for post-scan evaluation (the API contract).
- **Catalog-style usability.** Any reader on the session can
  ``format("warc")`` after one `spark.dataSource.register` — no import
  of engine modules at the call site.

Listing happens driver-side with `os.scandir` (the shim's stand-in for
a FileIndex; a cloud profile would list the object store the same way).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

from who_focus_crawler_spark.sources.warc import WARC_RECORD, _parse_file

_PUSHABLE = {"warc_type", "target_uri", "warc_file"}


@dataclass
class WarcFilePartition(InputPartition):
    path: str


class WarcDataSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires a path: .load(<dir>)")
        self.path = path
        self.eq_filters: list[tuple[str, object]] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in _PUSHABLE
            ):
                self.eq_filters.append((f.attribute[0], f.value))
            else:
                yield f  # not ours: Spark evaluates it post-scan

    def partitions(self) -> list[WarcFilePartition]:
        if os.path.isfile(self.path):
            return [WarcFilePartition(self.path)]
        files = sorted(
            e.path
            for e in os.scandir(self.path)
            if e.is_file() and e.name.endswith(".warc")
        )
        if not files:
            raise FileNotFoundError(f"no *.warc files under {self.path}")
        return [WarcFilePartition(p) for p in files]

    def read(self, partition: WarcFilePartition):
        with open(partition.path, "rb") as fh:
            blob = fh.read()
        # read_warc's binaryFile twin reports file:// URIs; match it so
        # both readers produce identical rows
        name = "file:" + partition.path
        cols = [f.name for f in self.schema.fields]
        for rec in _parse_file(name, blob):
            if any(rec.get(k) != v for k, v in self.eq_filters):
                continue
            yield tuple(rec[c] for c in cols)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType:
        return WARC_RECORD

    def reader(self, schema: StructType) -> WarcDataSourceReader:
        return WarcDataSourceReader(schema, dict(self.options))


def register(spark) -> None:
    """Idempotently register the source on a session:
    ``spark.read.format("warc").load(dir)``. Also flips the runtime
    pushdown switch — a reader that implements pushFilters is an ERROR
    on sessions built without it (engine sessions set it statically;
    foreign sessions, e.g. a driver harness, get it here)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)
