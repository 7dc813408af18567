"""Python UDTF lateral expansion vs its native hot-path twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from who_focus_crawler_spark.functions.udtfs import (
    explode_url_params,
    register_udtfs,
)

URLS = [
    "http://h.test/p?a=1&b=2&c=3",
    "http://h.test/p?a=9",
    "http://h.test/plain",          # no query → no rows
    "http://h.test/p?=orphan&k=v",  # key-less fragment skipped
    "http://h.test/p?flag",         # valueless param → empty value
    None,
]


def test_udtf_and_native_expansion_agree(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["canon_url"])
    df.createOrReplaceTempView("_t_udtf")
    register_udtfs(spark)
    via_udtf = sorted(
        (r.canon_url, r.pos, r.pkey, r.pval)
        for r in spark.sql(
            "SELECT canon_url, p.pos, p.pkey, p.pval "
            "FROM _t_udtf, LATERAL parse_params(canon_url) p"
        ).collect()
    )
    via_native = sorted(
        (r.canon_url, r.pos, r.pkey, r.pval)
        for r in explode_url_params(df).collect()
    )
    assert via_udtf == via_native
    # and the expected shape, pinned explicitly
    assert via_udtf == [
        ("http://h.test/p?=orphan&k=v", 1, "k", "v"),
        ("http://h.test/p?a=1&b=2&c=3", 0, "a", "1"),
        ("http://h.test/p?a=1&b=2&c=3", 1, "b", "2"),
        ("http://h.test/p?a=1&b=2&c=3", 2, "c", "3"),
        ("http://h.test/p?a=9", 0, "a", "9"),
        ("http://h.test/p?flag", 0, "flag", ""),
    ]


def test_native_expansion_plan_has_no_python(spark):
    df = spark.createDataFrame([("http://h.test/p?a=1",)], ["canon_url"])
    plan = explode_url_params(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDTF" not in plan
