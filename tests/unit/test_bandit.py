"""Integer UCB1 host scheduling (operators/bandit.py).

Checked against an exact Python reference (math.isqrt is safe as the
reference because the engine's floor(IEEE sqrt(x)) equals isqrt(x) for
the bounded x here — sqrt(k^2 - 1) sits ~1/(2k) below k, orders of
magnitude more than the 0.5-ulp rounding error at x <= 1e12).
"""

from __future__ import annotations

import math

from who_focus_crawler_spark.operators.bandit import (
    SCORE_UNTRIED_MILLI,
    select_bandit_hosts,
    ucb_host_scores,
)


def _ref(stats, c=1414):
    t = sum(p for _, p, _ in stats)
    ldig = len(str(t)) - 1
    out = {}
    for h, pulls, rsum in stats:
        if pulls == 0:
            mean, bonus = 0, SCORE_UNTRIED_MILLI
        else:
            mean = rsum // pulls
            bonus = (c * math.isqrt((1_000_000 * ldig) // pulls)) // 1000
        out[h] = (pulls, mean, bonus, mean + bonus)
    return out


STATS = [
    ("h0", 100, 55_000),   # well-explored, mediocre mean 550
    ("h1", 4, 3_900),      # barely tried, strong mean 975
    ("h2", 1, 100),        # single poor pull — big bonus anyway
    ("h3", 895, 900_000),  # heavily exploited winner, mean ~1005
    ("h4", 0, 0),          # never pulled — optimism sentinel
]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "host string, pulls long, reward_milli_sum long"
    )


def test_scores_match_python_reference(spark):
    got = {
        r.host: (r.pulls, r.mean_milli, r.bonus_milli, r.score_milli)
        for r in ucb_host_scores(_df(spark, STATS)).collect()
    }
    assert got == _ref(STATS)


def test_untried_host_always_selected_first(spark):
    top = select_bandit_hosts(_df(spark, STATS), 1).collect()
    assert [r.host for r in top] == ["h4"]
    assert top[0].score_milli == SCORE_UNTRIED_MILLI


def test_exploration_beats_exploitation_when_undersampled(spark):
    """With all hosts tried, the barely-pulled strong arm outranks the
    heavily-pulled winner: UCB1's bonus term dominates at low n."""
    stats = [s for s in STATS if s[1] > 0]
    order = [r.host for r in select_bandit_hosts(_df(spark, stats), 4).collect()]
    ref = _ref(stats)
    want = sorted(ref, key=lambda h: (-ref[h][3], h))
    assert order == want
    assert order.index("h2") < order.index("h3")  # n=1 bonus > exploited mean


def test_parallelism_invariance(spark):
    rows = [(f"h{i}", (i * 7) % 23, (i * i * 31) % 50_000) for i in range(300)]
    df1 = _df(spark, rows).coalesce(1)
    df8 = _df(spark, rows).repartition(8, "host")
    s1 = sorted(map(tuple, ucb_host_scores(df1).collect()))
    s8 = sorted(map(tuple, ucb_host_scores(df8).collect()))
    assert s1 == s8
