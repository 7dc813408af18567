"""Mirror-host detection: hosts serving (near-)identical content sets.

Large crawls waste budget re-fetching mirrors (the same site under
several hostnames — CDNs, country mirrors, scraped clones). The classic
batch detector (Bharat & Broder, "Mirror, mirror on the web", WWW 1999)
compares hosts by the overlap of their page-content fingerprints. The
scalable relational shape:

  1. reduce the fetch log to DISTINCT (host, content_hash);
  2. drop *boilerplate* hashes held by more than ``max_hosts_per_hash``
     hosts — an error page or cookie banner shared by 10^5 hosts would
     otherwise contribute ~10^10 join rows; legitimate mirror evidence
     lives in content only a handful of hosts serve (the same
     too-common-shingle cap every MinHash pipeline applies);
  3. self-join on content_hash (host_a < host_b) — work is
     O(Σ per-hash host-pair combinations), bounded by the cap, never
     O(hosts²);
  4. per pair: shared distinct hashes + each side's page count →
     integer containment permille = 1000·shared / min(pages) —
     integer arithmetic so both engines agree bit-for-bit.

``mirror_clusters`` turns the surviving pair graph into host clusters
via the same hash-to-min propagation as near-dup doc clustering
(corpus/clusters.py) — a mirror *set* is rarely just two hosts.

Oracle: ``c_mirror_hosts`` value-checks pairs + containment against a
DuckDB twin on a synthesized fetch log with planted mirror groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.clusters import near_dup_clusters


def mirror_pairs(
    pages: DataFrame,
    min_shared: int = 2,
    min_containment_permille: int = 500,
    max_hosts_per_hash: int | None = 64,
) -> DataFrame:
    """Host pairs whose content overlap crosses both thresholds.

    ``pages``: (host, content_hash[, ...]) — one row per fetched page
    (duplicates collapse). Output: (host_a, host_b, shared, pages_a,
    pages_b, containment_permille), host_a < host_b.
    """
    ph = pages.select("host", "content_hash").distinct()
    sizes = ph.groupBy("host").agg(F.count("*").alias("pages"))
    joinable = ph
    if max_hosts_per_hash is not None:
        rare = (
            ph.groupBy("content_hash")
            .agg(F.count("*").alias("_nh"))
            .filter(F.col("_nh") <= max_hosts_per_hash)
            .select("content_hash")
        )
        joinable = ph.join(rare, "content_hash")
    a = joinable.select(F.col("host").alias("host_a"), "content_hash")
    b = joinable.select(F.col("host").alias("host_b"), "content_hash")
    pairs = (
        a.join(b, "content_hash")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))  # rows are distinct hashes
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("pages").alias("pages_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("pages").alias("pages_b"))
    out = (
        pairs.join(sa, "host_a")
        .join(sb, "host_b")
        .withColumn(
            "containment_permille",
            (F.lit(1000) * F.col("shared"))
            .cast("long")
            / F.least("pages_a", "pages_b").cast("long"),
        )
        .withColumn(
            "containment_permille",
            F.floor("containment_permille").cast("long"),
        )
        .filter(F.col("containment_permille") >= min_containment_permille)
    )
    return out.select(
        "host_a",
        "host_b",
        F.col("shared").cast("long"),
        F.col("pages_a").cast("long"),
        F.col("pages_b").cast("long"),
        "containment_permille",
    )


def mirror_clusters(pairs: DataFrame, **kwargs) -> DataFrame:
    """Mirror pair graph → (host, cluster_id, keep): cluster_id = min
    host of the connected mirror set; keep = the canonical host whose
    budget survives (the rest can be demoted/deduped)."""
    renamed = pairs.select(
        F.col("host_a").alias("doc_a"), F.col("host_b").alias("doc_b")
    )
    return near_dup_clusters(renamed, **kwargs).select(
        F.col("doc_id").alias("host"), F.col("cluster_id"), F.col("keep")
    )
