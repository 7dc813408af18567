"""BPE training/apply vs an independent pure-Python reference (classic
Sennrich-style merge learning over a word-frequency vocab)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from who_focus_crawler_spark.corpus.bpe import (
    bpe_apply,
    bpe_train,
    segment_word,
    word_vocab,
)

CORPUS = [
    ("d1", "low lower lowest low low"),
    ("d2", "new newer newest new"),
    ("d3", "wider wide wide new low"),
    ("d4", "the newest lowest widest"),
]


def ref_bpe_train(word_counts: dict[str, int], num_merges: int, min_count: int):
    """Independent reference: dict/Counter implementation."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            n = word_counts[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        pair = best[0]
        merges.append(pair)
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(pair[0] + pair[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    wc = Counter()
    for _, text in CORPUS:
        wc.update(text.split())
    want = ref_bpe_train(dict(wc), num_merges=12, min_count=2)
    got = bpe_train(word_vocab(docs), num_merges=12, min_count=2)
    assert got == want
    assert len(got) >= 6  # non-vacuous: real merges learned
    # the shared-suffix merges the corpus was built to teach
    joined = {"".join(p) for p in got}
    assert "lo" in joined or "ow" in joined  # 'low' family compresses


def test_bpe_apply_matches_segment_word(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe_train(word_vocab(docs), num_merges=8, min_count=2)
    out = {
        r.doc_id: (list(r.subwords), r.n_subwords)
        for r in bpe_apply(docs, merges).collect()
    }
    for doc_id, text in CORPUS:
        want = []
        for w in text.split():
            want += segment_word(w, merges)
        assert out[doc_id] == (want, len(want)), doc_id
    # compression is real: subwords < characters, >= words
    for doc_id, text in CORPUS:
        n_chars = sum(len(w) for w in text.split())
        assert len(text.split()) <= out[doc_id][1] < n_chars


def test_bpe_early_stop_and_determinism(spark):
    docs = spark.createDataFrame([("d", "ab ab xy")], ["doc_id", "text"])
    # only 'ab' reaches min_count=2; 'xy' pairs occur once
    merges = bpe_train(word_vocab(docs), num_merges=10, min_count=2)
    assert merges == [("a", "b")]
    # rerun under different parallelism → identical model
    again = bpe_train(
        word_vocab(docs.repartition(7)), num_merges=10, min_count=2
    )
    assert again == merges


def test_bpe_local_equals_distributed_rounds(spark):
    """bpe_train (one collect + local incremental pair counts) must
    produce the IDENTICAL merge list as the per-round distributed
    formulation it replaced — on a corpus with ties, repeated chars
    ("aaa" overlap counting) and early-stop tails."""
    from who_focus_crawler_spark.corpus.bpe import bpe_train_rounds

    rng_words = []
    # deterministic pseudo-corpus with overlaps + ties
    for i in range(40):
        rng_words.append("ab" * (1 + i % 3))
        rng_words.append("a" * (1 + i % 4))
        rng_words.append(f"w{i % 7}xyz")
    docs = spark.createDataFrame(
        [("d0", " ".join(rng_words)), ("d1", "zz zz qqq aaa aaa bab")],
        ["doc_id", "text"],
    )
    v = word_vocab(docs)
    for k, mc in [(5, 2), (25, 2), (60, 3)]:
        assert bpe_train(v, num_merges=k, min_count=mc) == bpe_train_rounds(
            v, num_merges=k, min_count=mc
        ), (k, mc)


def test_bpe_train_auto_picks_local_and_rounds(spark):
    """The auto-router measures the vocab, takes the collect-once local
    path under budget, the distributed per-round path over it — and
    both produce the identical merge list."""
    from who_focus_crawler_spark.corpus.bpe import bpe_train_auto

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id long, text string",
    )
    vocab = word_vocab(docs)
    big, small = {}, {}
    local = bpe_train_auto(
        vocab, num_merges=8, max_driver_vocab_bytes=1 << 30, stats_out=big
    )
    rounds = bpe_train_auto(
        vocab, num_merges=8, max_driver_vocab_bytes=1, stats_out=small
    )
    assert big["path"] == "local" and small["path"] == "rounds"
    assert small["est_bytes"] == big["est_bytes"] > small["budget"]
    assert local == rounds == bpe_train(vocab, num_merges=8)


def test_bpe_train_auto_env_budget(spark, monkeypatch):
    from who_focus_crawler_spark.corpus.bpe import bpe_train_auto

    docs = spark.createDataFrame([(1, "aa ab aa")], "doc_id long, text string")
    monkeypatch.setenv("WFC_BPE_DRIVER_VOCAB_BYTES", "1")
    st = {}
    bpe_train_auto(word_vocab(docs), num_merges=2, stats_out=st)
    assert st["path"] == "rounds" and st["budget"] == 1
