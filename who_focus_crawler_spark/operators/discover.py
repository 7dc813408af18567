"""C12 — link discovery & resolution from span sequences.

posexplode the ordered spans, keep kind='link', resolve
relative→absolute against the parent's canonical URL (RFC 3986 §5,
functions/urls.resolve_ref — all native string expressions),
canonicalize targets (C1 — native except the gated path fix-up), attach
lineage (seed → depth+1 → discovering batch) and the frozen in-batch
discovery tie-break key (parent_seq, span offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.urls import (
    canonicalize_df,
    host_bucket,
    resolve_ref,
    url_hash,
    url_host,
)


def has_meta_directive(spans, directive: str):
    """TRUE iff the span sequence carries a robots-meta span with the
    given directive (noindex / nofollow) — native `exists` over the
    array, no explode, no Python. Twin of
    sources/fixture_web.span_meta_directives."""
    return F.exists(
        spans,
        lambda s: (s["kind"] == F.lit("meta"))
        & F.coalesce(s["text"].contains(directive), F.lit(False)),
    )


def discover_links(fetched: DataFrame, num_buckets: int) -> DataFrame:
    """fetched docs → one row per (valid) link occurrence, in doc order.

    Columns: target_url/url_hash/host/host_bucket, depth (child), seed_id,
    parent_hash, parent_host, parent_seq, offset, batch.

    Pages whose body carries a robots-meta `nofollow` directive emit NO
    discovery events (the meta-tag companion of RFC 9309) — the check is
    an array predicate on the already-fetched spans, evaluated before
    the explode so nofollow pages never cost discovery bandwidth.
    """
    fetched = fetched.filter(~has_meta_directive(F.col("spans"), "nofollow"))
    # slim the spans BEFORE the explode: link discovery never reads the
    # text field, and text is the bulk of a span's bytes — exploding
    # full spans materializes every paragraph once per span row
    slim = F.transform(
        "spans",
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    links = fetched.select(
        F.col("seq").alias("parent_seq"),
        F.col("batch"),
        F.col("url_hash").alias("parent_hash"),
        F.col("host").alias("parent_host"),
        F.col("canon_url").alias("_base"),
        (F.col("depth") + 1).alias("depth"),
        F.col("seed_id"),
        F.posexplode(slim).alias("pos", "span"),
        # redirect targets enter discovery exactly like links (the
        # Location header is the page's only outlink) — same lineage,
        # same dedup, same tie-break; kinds beyond these never carry
        # URLs (fixture_web.extract_links is the frozen twin)
    ).filter(F.col("span.kind").isin("link", "redirect"))
    # RFC 3986 §5: most real-page hrefs are relative — resolve against
    # the parent canon_url BEFORE canonicalization (which would silently
    # drop anything without '://'). NULL/empty hrefs stay NULL and drop:
    # resolve_ref's RFC same-document rule would map them to the parent
    # URL itself, discovering a spurious self-link the golden extractor
    # (fixture_web.extract_links) correctly skips.
    raw_href = F.col("span.media_ref")
    links = links.withColumn(
        "href",
        F.when(
            raw_href.isNotNull() & (raw_href != ""),
            resolve_ref(F.col("_base"), raw_href),
        ),
    ).withColumn("offset", F.col("span.offset"))
    return (
        # fixpoint_guard: most resolved hrefs are already canonical —
        # the sound one-regex guard passes them through verbatim and
        # the staged parts/assembly pipeline sees NULL input for them
        canonicalize_df(links, "href", "target_url", fixpoint_guard=True)
        .drop("pos", "span", "href", "_base")
        .withColumn("url_hash", url_hash(F.col("target_url")))
        .withColumn("host", url_host(F.col("target_url")))
        .withColumn("host_bucket", host_bucket(F.col("host"), num_buckets))
    )
