"""SQL surface over a crawl checkpoint: temp views + spark.sql.

The engine's tables are plain DataFrames, so the whole Spark SQL
surface applies — this module just names them. After
``register_catalog_views``, users query crawl state exactly like any
warehouse table:

    register_catalog_views(spark, catalog)
    spark.sql("SELECT host, count(*) FROM crawl_order GROUP BY host")
    spark.sql("SELECT * FROM metrics WHERE batch = 3")

Views are snapshot-pinned: they read the file list of the catalog's
HEAD (or an explicit ``snapshot_id``) at registration time, so a query
sees one consistent snapshot even while a crawl keeps committing —
re-register to move the view window forward (the same contract as a
warehouse session catalog pointing at an Iceberg snapshot).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from who_focus_crawler_spark import schemas
from who_focus_crawler_spark.checkpoint.snapshot import SnapshotCatalog

CATALOG_TABLES = {
    "frontier": schemas.FRONTIER,
    "url_seen": schemas.URL_SEEN,
    "crawl_order": schemas.CRAWL_ORDER,
    "documents": schemas.DOCUMENTS_OUT,
    "metrics": schemas.METRICS,
    "robots_cache": schemas.ROBOTS_CACHE,
}


def register_catalog_views(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    snapshot_id: int | None = None,
    prefix: str = "",
) -> list[str]:
    """Create one temp view per catalog table at the given snapshot
    (default HEAD). Returns the view names registered; tables absent
    from the snapshot are skipped."""
    registered = []
    for name, schema in CATALOG_TABLES.items():
        df = catalog.read_table(spark, name, schema, snapshot_id=snapshot_id)
        if df is None:
            continue
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        registered.append(view)
    return registered
