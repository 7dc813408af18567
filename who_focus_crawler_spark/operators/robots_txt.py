"""RFC 9309 robots.txt TEXT parser — raw fetched bytes → the structured
rule rows the gate (operators/robots.py) consumes.

The gate's cache stores parsed (allow, pattern) rules; production feeds
it raw robots.txt responses. This operator is that missing step, as
pure native dataflow (no Python in the parse):

  1. split to lines, strip comments ('#' to end of line), trim;
  2. 'field: value' with a case-insensitive field name (RFC 9309 §2.1;
     unknown fields are ignored per §2.2.4);
  3. GROUPS (§2.2.1): a run of consecutive User-agent lines opens a
     group; Allow/Disallow/Crawl-delay lines bind to the last opened
     group; rules before any User-agent line are ignored;
  4. group selection (§2.2.1): the crawler obeys the single group whose
     user-agent token best matches its own product token — frozen v1
     match rule: a group's UA value matches when it is '*' or a
     case-insensitive PREFIX of the crawler token; the chosen group is
     the one holding the LONGEST matching UA (ties: lowest group id;
     '*' has length 0, so any specific match beats it);
  5. Sitemap lines are global (§2.3 "other records") — they apply to
     every crawler regardless of group, and are returned for the
     sitemap discovery channel (operators/sitemap.py).

Output is one tall frame, one row per effective directive:
(host, directive, allow, value) with directive in
{'rule', 'crawl_delay', 'sitemap'}; 'rule' rows carry allow +
value=pattern in group order (the gate's longest-match evaluation is
order-independent, but the order is kept deterministic for the
oracle). Hosts whose chosen group has no rules — or with no matching
group at all — emit zero rows: allow-all by default (§2.3.1).

Every window partitions by host; nothing is global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ws_strip(col):
    """Strip RFC 9309 WS (spaces + tabs) from both ends; F.trim only
    strips U+0020, which would leak tabs (and formerly the trailing
    \\r of CRLF input) into field names and rule patterns."""
    return F.regexp_replace(col, r"^[ \t]+|[ \t]+$", "")


def parse_robots_txt(
    robots: DataFrame,
    agent: str = "wfc-bot",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → tall directive frame (see module docstring)."""
    token = agent.lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        # RFC 9309 §2.1: lines end in CR, LF, or CRLF — split on all three
        # (CRLF first so it doesn't produce an empty phantom line per pair).
        F.posexplode(F.split(F.col(text_col), "\r\n|\r|\n")).alias(
            "line_no", "raw"
        ),
    )
    clean = lines.select(
        "host",
        "line_no",
        _ws_strip(F.substring_index(F.col("raw"), "#", 1)).alias("ln"),
    ).filter(F.col("ln") != "")
    parsed = clean.select(
        "host",
        "line_no",
        F.lower(_ws_strip(F.substring_index(F.col("ln"), ":", 1))).alias(
            "field"
        ),
        F.when(
            F.instr("ln", ":") > 0,
            _ws_strip(
                F.col("ln").substr(F.instr("ln", ":") + 1, F.lit(100_000))
            ),
        ).alias("value"),
    ).filter(
        F.col("field").isin(
            "user-agent", "allow", "disallow", "crawl-delay", "sitemap"
        )
        & F.col("value").isNotNull()
    )

    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = (F.col("field") == "user-agent").cast("int")
    grouped = parsed.withColumn("_ua", is_ua).withColumn(
        "_new_grp",
        (F.col("_ua") == 1)
        & (F.coalesce(F.lag("_ua").over(w), F.lit(0)) == 0),
    )
    grouped = grouped.withColumn(
        "grp",
        F.sum(F.col("_new_grp").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).filter(F.col("grp") > 0)

    # group selection: longest matching UA per group, best group per host
    uas = grouped.filter(F.col("field") == "user-agent").select(
        "host",
        "grp",
        F.lower(F.col("value")).alias("ua"),
    )
    matching = uas.withColumn(
        "match_len",
        F.when(F.col("ua") == "*", F.lit(0)).when(
            F.lit(token).startswith(F.col("ua")), F.length("ua")
        ),
    ).filter(F.col("match_len").isNotNull())
    best = (
        matching.groupBy("host")
        .agg(
            F.max(
                F.struct(F.col("match_len"), (-F.col("grp")).alias("ng"))
            ).alias("_b")
        )
        .select("host", (-F.col("_b.ng")).cast("long").alias("grp"))
    )

    chosen = grouped.join(best, ["host", "grp"]).filter(
        F.col("field") != "user-agent"
    )
    rules = chosen.filter(F.col("field").isin("allow", "disallow")).select(
        "host",
        F.lit("rule").alias("directive"),
        (F.col("field") == "allow").alias("allow"),
        F.col("value"),
        "line_no",
    )
    delays = chosen.filter(
        (F.col("field") == "crawl-delay")
        & F.col("value").rlike("^[0-9]+$")
    ).select(
        "host",
        F.lit("crawl_delay").alias("directive"),
        F.lit(None).cast("boolean").alias("allow"),
        F.col("value"),
        "line_no",
    )
    # sitemaps are global: taken from EVERY group and outside selection
    maps = parsed.filter(F.col("field") == "sitemap").select(
        "host",
        F.lit("sitemap").alias("directive"),
        F.lit(None).cast("boolean").alias("allow"),
        F.col("value"),
        "line_no",
    )
    # empty-pattern Disallow: means allow-all (RFC 9309 §2.2.2) — drop it
    out = rules.filter(F.col("value") != "").unionByName(delays).unionByName(maps)
    return out.select("host", "directive", "allow", "value", "line_no")
