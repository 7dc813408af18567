"""operators/redirects.py — pointer-doubling redirect-chain resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from who_focus_crawler_spark.operators.redirects import resolve_redirect_chains


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_url string, dst_url string")


def _as_map(df):
    return {
        r["src_url"]: (r["terminal_url"], r["hops"], r["resolved"])
        for r in df.collect()
    }


def test_chain_resolves_with_hop_counts(spark):
    # a → b → c → d (terminal): every source lands on d with its distance
    out = _as_map(
        resolve_redirect_chains(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        )
    )
    assert out == {
        "a": ("d", 3, True),
        "b": ("d", 2, True),
        "c": ("d", 1, True),
    }


def test_loop_and_self_loop_unresolved(spark):
    # x → y → x is a loop; s → s a self-loop; a → x enters the loop.
    out = _as_map(
        resolve_redirect_chains(
            _edges(spark, [("x", "y"), ("y", "x"), ("s", "s"), ("a", "x")]),
            max_hops=8,
        )
    )
    assert out == {
        "x": (None, None, False),
        "y": (None, None, False),
        "s": (None, None, False),
        "a": (None, None, False),
    }


def test_chain_longer_than_max_hops_unresolved(spark):
    # n0 → n1 → ... → n6 (terminal), cap at 4: sources deeper than 4
    # hops from the terminal are unresolved, shallower ones resolve
    chain = [(f"n{i}", f"n{i + 1}") for i in range(6)]
    out = _as_map(resolve_redirect_chains(_edges(spark, chain), max_hops=4))
    assert out["n5"] == ("n6", 1, True)
    assert out["n2"] == ("n6", 4, True)
    assert out["n1"] == (None, None, False)
    assert out["n0"] == (None, None, False)


def test_forked_source_raises_in_engine_mode(spark):
    with pytest.raises(ValueError, match="functional"):
        resolve_redirect_chains(
            _edges(spark, [("a", "b"), ("a", "c")])
        ).collect()


def test_duplicate_edges_collapse(spark):
    out = _as_map(
        resolve_redirect_chains(
            _edges(spark, [("a", "b"), ("a", "b"), ("b", "c")])
        )
    )
    assert out == {"a": ("c", 2, True), "b": ("c", 1, True)}


def test_fixed_rounds_mode_matches_engine_mode(spark):
    # 40-long chain + an 8-loop: 7 doubling rounds converge both; the
    # lazy fixed-round form (the oracle twin) must equal engine mode
    pairs = [(f"c{i}", f"c{i + 1}") for i in range(40)]
    pairs += [(f"l{i}", f"l{(i + 1) % 8}") for i in range(8)]
    e = _edges(spark, pairs)
    eng = _as_map(resolve_redirect_chains(e, max_hops=64))
    fixed = _as_map(resolve_redirect_chains(e, max_hops=64, n_rounds=7))
    assert eng == fixed
    assert eng["c0"] == ("c40", 40, True)
    assert eng["l0"] == (None, None, False)


def test_round_count_is_logarithmic(spark):
    # the engine loop is bounded by bit_length(max_hops)+1 rounds, so a
    # 30-hop chain under max_hops=32 needs ≤ 6 joins — spot-check the
    # fixed-round twin resolves it in exactly ceil(log2(30)) = 5 rounds
    pairs = [(f"k{i}", f"k{i + 1}") for i in range(30)]
    out = _as_map(
        resolve_redirect_chains(_edges(spark, pairs), max_hops=32, n_rounds=5)
    )
    assert out["k0"] == ("k30", 30, True)
