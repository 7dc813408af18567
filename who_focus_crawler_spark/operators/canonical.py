"""Canonical URL election over content-duplicate groups.

Exact content dedup (corpus/dedup.py) and mirror detection
(operators/mirrors.py) tell the crawler that many URLs carry one
document; something still has to decide WHICH URL is the document's
canonical address — the one kept in the corpus, emitted in WARC
metadata, and used to rewrite the link graph so in-links consolidate
instead of splitting across aliases. Search-engine pipelines call this
canonicalization/URL election (cf. the rel="canonical" convention,
RFC 6596 — this operator is the crawler-side election when the page
doesn't declare one).

Frozen preference order (oracle-checked by ``c_canonical_election``),
most-preferred first, all integer/native:

1. https over http (secure scheme wins);
2. fewer query parameters (tracking-param-free aliases win);
3. fewer '/' characters (shallower path wins);
4. shorter URL;
5. lexicographic canon_url (total-order tie-break).

Scale shape: ONE shuffle on content_hash; each group is a
content-duplicate cluster (bounded — clusters at web scale are heavy-
tailed but the per-group work is a rank over the cluster, and a
pathological cluster falls under C17 salting on the window key like
every other hot-key window). Output is one row per input URL, so the
operator composes with exact_dedup/mirror_clusters without fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _election_key(url: Column) -> list[Column]:
    https_rank = F.when(url.startswith("https://"), F.lit(0)).otherwise(F.lit(1))
    # F.get is NULL-safe past the array end (ANSI mode): no '?' → NULL
    after_q = F.get(F.split(url, r"\?", 2), 1)
    n_params = F.when(
        after_q.isNotNull(), F.size(F.split(after_q, "&"))
    ).otherwise(F.lit(0))
    n_slashes = F.length(url) - F.length(F.replace(url, F.lit("/"), F.lit("")))
    return [
        https_rank.asc(),
        n_params.asc(),
        n_slashes.asc(),
        F.length(url).asc(),
        url.asc(),
    ]


def elect_canonical(
    pages: DataFrame,
    url_col: str = "canon_url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Per-URL canonical mapping: (url, hash, canonical_url, is_canonical).

    ``pages``: one row per distinct (url, content hash) — run it on the
    crawl's page table after exact hashing. Groups of size 1 elect
    themselves (is_canonical = true), so the output is a total map over
    the input and can rewrite any URL column with one join.
    """
    url = F.col(url_col)
    w = Window.partitionBy(hash_col).orderBy(*_election_key(url))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        pages.select(url_col, hash_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("canonical_url", F.first(url_col).over(wf))
        .withColumn("is_canonical", F.col("_rn") == 1)
        .drop("_rn")
    )
