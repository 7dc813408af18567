"""Text analysis over the `documents` corpus (SURVEY.md task brief:
language-ID, quality scoring, token counting, fingerprinting).

Everything here is native Spark column expressions (whole-stage codegen,
no Python UDFs — the 100 TB hot path stays JVM-side) and every function
has an exact DuckDB-SQL twin in harness/corpus_queries.py so the driver's
oracle can verify values, not just row counts.

Frozen conventions (shared with the oracle SQL):
- token     = maximal run of [a-z0-9] in lower(text)
- tok_hash  = first 15 hex digits of md5(token) parsed base-16 (60-bit,
              engine-portable — Spark xxhash64 has no DuckDB twin)
- shingle_k = k consecutive tokens joined by a single space
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

# marker-word sets for the language-ID heuristic; disjoint across languages
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "das", "ein"),
    "en": ("the", "a", "of", "is"),
    "es": ("el", "y", "los", "una"),
    "fr": ("le", "et", "la", "un"),
}

# English stopwords used by the quality score (subset; frozen)
QUALITY_STOPWORDS = ("the", "a", "of", "is", "and", "to", "in", "that")

PUNCT_RE = r"[^.!?,;:]"  # negated: everything that is NOT punctuation


def tokens(text: Column) -> Column:
    """Ordered token list of a document (frozen tokenizer)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), F.lit(0))


def md5_hash60(s: Column) -> Column:
    """Engine-portable 60-bit integer hash (md5-hex prefix, base-16)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def positional_ngrams(toks: Column, k: int) -> Column:
    """All k-token grams in order (positional — duplicates kept), each
    joined by one space; [] if < k tokens."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(toks: Column, k: int) -> Column:
    """Distinct k-token shingles (the set form of positional_ngrams)."""
    return F.array_distinct(positional_ngrams(toks, k))


def lang_scores(toks: Column) -> dict[str, Column]:
    """Marker-hit count per language over the token list."""
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(toks: Column) -> Column:
    """argmax language with lexicographic tie-break; 'und' when all zero.

    Implemented as a greatest-of-structs trick so it stays one expression:
    pack (score, negated-lang-rank) and take the max.
    """
    scores = lang_scores(toks)
    # rank languages reverse-lexicographically so that on equal score the
    # lexicographically SMALLEST language wins under greatest()
    ordered = sorted(scores.keys(), reverse=True)
    packed = [
        F.struct(
            scores[lang].alias("s"), F.lit(i).alias("r"), F.lit(lang).alias("lang")
        )
        for i, lang in enumerate(ordered)
    ]
    best = F.greatest(*packed)
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality features (frozen formulas, shared with SQL)."""
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(text, PUNCT_RE, ""))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*QUALITY_STOPWORDS)))
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tokens,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(
            n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 6
        ),
        "mean_token_len": F.round(mean_tok_len, 6),
    }


def quality_score(text: Column) -> Column:
    """Quality score in integer points 0..1000 (long): length term (≤500)
    + stopword term (≤300) + punctuation term (≤200). Integer arithmetic
    end-to-end (floor of exact int ratios) so the value is bit-identical
    across engines — float rounding at decimal midpoints is engine-
    dependent (found empirically vs DuckDB)."""
    f = quality_features(text)
    n_tokens = f["n_tokens"]
    length_term = F.least(n_tokens, F.lit(100)) * 5
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*QUALITY_STOPWORDS)))
    stop_term = F.least(
        F.floor(n_stop * 1500 / F.greatest(n_tokens, F.lit(1))), F.lit(300)
    )
    n_chars = f["n_chars"]
    n_punct = F.length(F.regexp_replace(text, PUNCT_RE, ""))
    punct_term = F.greatest(
        F.lit(200) - F.floor(n_punct * 2000 / F.greatest(n_chars, F.lit(1))),
        F.lit(0),
    )
    return (length_term + stop_term + punct_term).cast("long")


# ------------------------------------------------------------------- PII ---

# Redaction patterns restricted to the Java-regex ∩ RE2 common subset so
# the DuckDB oracle evaluates them identically (no backrefs, no lookaround).
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d\- ]{7,}\d"


def redact_pii(text: Column) -> Column:
    """Training-data PII scrub: emails → <EMAIL>, phone-like sequences
    (international form, ≥ 9 digits/separators) → <PHONE>, IPv4 → <IP>.
    Native chained regexp_replace — codegen'd, no Python. Email first so
    its host part can't be half-eaten by the IP pattern."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4_RE, "<IP>")


def pii_counts(text: Column) -> dict[str, Column]:
    """Occurrence counts per PII class (on the raw text)."""
    return {
        "n_emails": F.size(
            F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), F.lit(0))
        ).cast("long"),
        "n_phones": F.size(
            F.regexp_extract_all(text, F.lit(PII_PHONE_RE), F.lit(0))
        ).cast("long"),
        "n_ips": F.size(
            F.regexp_extract_all(text, F.lit(PII_IPV4_RE), F.lit(0))
        ).cast("long"),
    }


# ------------------------------------------------------- repetition (Gopher) ---


def ngrams_all(toks: Column, k: int) -> Column:
    """ALL k-token grams in order (with repeats — unlike shingles())."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_gram_count(toks: Column, k: int = 2) -> Column:
    """Occurrences of the document's most frequent k-gram — the Gopher
    repetition signal (Rae et al. 2021 §A1.1: drop docs whose top n-gram
    covers too much of the text). Computed per row as a sorted-array
    max-run fold (one pass, no explode/shuffle): equal grams are adjacent
    after array_sort, so the longest run IS the top count."""
    sorted_g = F.array_sort(ngrams_all(toks, k))
    state = F.aggregate(
        sorted_g,
        F.struct(
            F.lit(0).alias("cur"), F.lit(0).alias("best"), F.lit("").alias("prev")
        ),
        lambda acc, g: F.struct(
            F.when(g == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            g.alias("prev"),
        ),
    )
    return state["best"].cast("long")


def repetition_stats(text: Column, k: int = 2) -> dict[str, Column]:
    toks = tokens(text)
    n_grams = F.size(ngrams_all(toks, k)).cast("long")
    top = top_gram_count(toks, k)
    return {
        "n_grams": n_grams,
        "top_gram_count": top,
        "top_gram_frac": F.round(
            top.cast("double") / F.greatest(n_grams, F.lit(1)), 6
        ),
    }


def fingerprint(toks: Column, k: int = 4) -> Column:
    """Document fingerprint: minimum md5 over all k-token rolling windows
    (winnowing-style min-sampling with a single global window). Documents
    sharing any hot k-gram region collide — a cheap near-dup prefilter."""
    grams = shingles(toks, k)
    return F.array_min(F.transform(grams, lambda g: F.md5(g)))


def winnow_fingerprints(toks: Column, k: int = 4, w: int = 5) -> Column:
    """Positional winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003): hash every k-token gram, slide a window of ``w`` consecutive
    gram hashes, and select each window's minimum — ties broken by the
    RIGHTMOST position (the paper's rule) — recording each selected
    (position, hash) once. Guarantee: any two documents sharing a token
    run of length >= w + k - 1 share at least one fingerprint, while
    only ~2/(w+1) of grams are kept — a local, position-aware near-dup
    / plagiarism signal that the single global-min ``fingerprint`` (and
    MinHash, which is order-blind) cannot give.

    All native array expressions (whole-stage codegen, zero shuffle —
    embarrassingly parallel at 100 TB). The rightmost-min tie-break is
    encoded into one sortable key per gram: 15-hex md5 prefix ||
    zero-padded (999999 - pos), so ``array_min`` over a window slice
    picks (min hash, max pos) in one comparison — the identical
    construction is engine-portable to the DuckDB oracle twin.

    Returns array<struct<pos:int, gram_hash:string>> sorted by pos;
    documents with fewer than ``k`` tokens yield []. With fewer grams
    than ``w`` the single (shorter) window still selects one
    fingerprint — frozen edge semantics shared with the oracle.
    """
    grams = positional_ngrams(toks, k)
    keys = F.transform(
        grams,
        lambda g, i: F.concat(
            F.substring(F.md5(g), 1, 15),
            F.lpad((F.lit(999998) - i).cast("string"), 6, "0"),
        ),
    )

    def _windows(ks: Column) -> Column:
        m = F.size(ks)
        # sequence() descends when start > stop — gate on m >= 1
        return F.when(
            m >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(m - F.lit(w - 1), F.lit(1))
                    ),
                    lambda i: F.array_min(F.slice(ks, i, w)),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    # Bind `keys` to a lambda variable so the md5-per-gram map runs ONCE
    # per document: referencing the raw expression from inside the
    # window transform would re-inline it into every slice — O(m²) md5
    # evaluations per doc (measured ~100× slower at sf0.1). transform
    # over a 1-element wrapper array is the Column-level let-binding.
    selected = F.element_at(
        F.transform(F.array(keys), lambda ks: _windows(ks)), 1
    )
    return F.array_sort(
        F.transform(
            selected,
            lambda s: F.struct(
                (F.lit(999999) - F.substring(s, 16, 6).cast("int")).alias(
                    "pos"
                ),
                F.substring(s, 1, 15).alias("gram_hash"),
            ),
        )
    )


# --------------------------------------------------------------------------
# Unicode normalization — the one text stage that genuinely needs Python
# (Spark has no built-in NFC/NFD; ICU lives JVM-side but isn't exposed
# as a SQL function). Arrow-batched pandas UDFs, NEVER row-at-a-time:
# one JVM↔Python crossing per batch, pandas .str ops inside. DuckDB's
# nfc_normalize / strip_accents are the oracle twins (agreement
# verified over composed, decomposed, and ascii-only inputs).


def _series_udf(fn):
    """Wrap a Series→Series function as an Arrow-batched pandas UDF.
    (`from __future__ import annotations` stringifies hints, so the real
    pd.Series annotation objects are attached explicitly.)"""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf("string")(fn)


def normalize_nfc(text: Column) -> Column:
    """Unicode NFC normalization (canonical composition): decomposed
    sequences like 'e' + U+0301 collapse to 'é', so hash-based dedup and
    equality joins treat canonically-equal strings as equal — run this
    BEFORE exact/minhash dedup on any real-web corpus."""

    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _series_udf(_nfc)(text)


def strip_accents(text: Column) -> Column:
    """Accent folding: NFD-decompose, drop combining marks (category
    Mn), leaving base letters — matches DuckDB strip_accents. Used as a
    retrieval/matching normalization, not a storage transform."""

    def _strip(s):
        import unicodedata

        def fold(x):
            if x is None:
                return None
            return "".join(
                c
                for c in unicodedata.normalize("NFD", x)
                if unicodedata.category(c) != "Mn"
            )

        return s.map(fold)

    return _series_udf(_strip)(text)


# --------------------------------------------------------------------------
# Document-level quality rule bundles from the published LLM-corpus
# pipelines — all arithmetic integer permille (engine-portable, no
# floats), all expressions native (codegen'd scan-side projection).


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Appendix A1.1),
# frozen to an exact-integer subset. Words = whitespace-split runs.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3  # chars, inclusive
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_MAX_SYMBOL_PERMILLE = 100  # '#' or '...' per word <= 0.1
GOPHER_MAX_BULLET_PERMILLE = 900  # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_PERMILLE = 300  # lines ending with '...'
GOPHER_MIN_ALPHA_PERMILLE = 800  # words containing an alphabetic char
GOPHER_MIN_STOPWORDS = 2  # distinct required stopwords present


def _words(text: Column) -> Column:
    return F.filter(
        F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0
    )


def gopher_stats(text: Column) -> dict[str, Column]:
    """The Gopher rule measurements, exact integers/permilles."""
    ws = _words(text)
    lines = F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_words = F.size(ws)
    n_lines = F.size(lines)
    sum_len = F.aggregate(ws, F.lit(0), lambda a, w: a + F.length(w))
    n_symbol = (
        F.size(F.split(text, "#", -1))
        - 1
        + F.size(F.split(text, r"\.\.\.", -1))
        - 1
    )
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.startswith(F.trim(l), F.lit("- "))
            | F.startswith(F.trim(l), F.lit("* ")),
        )
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda l: F.endswith(F.rtrim(l), F.lit("...")))
    )
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    lw = F.transform(ws, lambda w: F.lower(w))
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(lw, s),
        )
    )
    pm = lambda num, den: F.when(  # noqa: E731
        den > 0, F.floor(num * F.lit(1000) / den).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return {
        "n_words": n_words.cast("long"),
        "n_lines": n_lines.cast("long"),
        "sum_word_len": sum_len.cast("long"),
        "symbol_permille": pm(n_symbol, n_words),
        "bullet_permille": pm(n_bullet, n_lines),
        "ellipsis_permille": pm(n_ellipsis, n_lines),
        "alpha_permille": pm(n_alpha, n_words),
        "n_stopwords": n_stop.cast("long"),
    }


def gopher_keep(text: Column) -> Column:
    """True iff the document passes every frozen Gopher rule. The mean
    word-length bounds compare as 3*n <= sum_len <= 10*n — exact, no
    division."""
    s = gopher_stats(text)
    n, sl = s["n_words"], s["sum_word_len"]
    return (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (sl >= F.lit(GOPHER_MIN_MEAN_WORD_LEN) * n)
        & (sl <= F.lit(GOPHER_MAX_MEAN_WORD_LEN) * n)
        & (s["symbol_permille"] <= GOPHER_MAX_SYMBOL_PERMILLE)
        & (s["bullet_permille"] <= GOPHER_MAX_BULLET_PERMILLE)
        & (s["ellipsis_permille"] <= GOPHER_MAX_ELLIPSIS_PERMILLE)
        & (s["alpha_permille"] >= GOPHER_MIN_ALPHA_PERMILLE)
        & (s["n_stopwords"] >= GOPHER_MIN_STOPWORDS)
    )


# C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer", §2.2),
# line-level filter + document-level drops, frozen subset.
C4_MIN_LINE_WORDS = 5


def c4_line_keep(line: Column) -> Column:
    """C4's per-line rule: terminal punctuation, >= 5 words, and no
    'javascript' marker."""
    t = F.rtrim(line)
    terminal = (
        F.endswith(t, F.lit("."))
        | F.endswith(t, F.lit("!"))
        | F.endswith(t, F.lit("?"))
        | F.endswith(t, F.lit('"'))
    )
    return (
        terminal
        & (F.size(_words(line)) >= C4_MIN_LINE_WORDS)
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_stats(text: Column) -> dict[str, Column]:
    """Line filter + doc-level flags; kept_text is the rebuilt document
    (kept lines joined by newline) — the actual C4 output artifact."""
    lines = F.split(text, "\n")
    kept = F.filter(lines, lambda l: c4_line_keep(l))
    low = F.lower(text)
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept": F.size(kept).cast("long"),
        "has_lorem": F.contains(low, F.lit("lorem ipsum")),
        "has_brace": F.contains(text, F.lit("{")),
        "kept_text": F.array_join(kept, "\n"),
    }


def c4_filter(
    docs: DataFrame, text_col: str = "text", min_kept_lines: int = 3
) -> DataFrame:
    """Apply C4: drop lorem-ipsum/brace documents, keep only qualifying
    lines, drop documents with fewer than ``min_kept_lines`` surviving
    lines; ``text_col`` is rewritten to the cleaned text."""
    s = c4_stats(F.col(text_col))
    return (
        docs.withColumn("_c4_kept", s["kept_text"])
        .withColumn("_c4_n", s["n_kept"])
        .filter(
            ~s["has_lorem"] & ~s["has_brace"] & (F.col("_c4_n") >= min_kept_lines)
        )
        .withColumn(text_col, F.col("_c4_kept"))
        .drop("_c4_kept", "_c4_n")
    )


# -------------------------------------------------------------- soft-404 ---

# Error-page markers (lowercased-substring rules). A "soft 404" is an
# error page served with HTTP 200 — crawlers must detect it from content
# (Bar-Yossef, Broder, Kumar & Tomkins, "Sic transit gloria telae:
# towards an understanding of the web's decay", WWW 2004) or the corpus
# fills with boilerplate error shells.
SOFT404_STRONG = ("page not found", "404 not found", "no longer available")
SOFT404_WEAK = ("404", "not found", "error")


def soft404_score(text: Column) -> Column:
    """Soft-404 likelihood in integer points (long): +500 per strong
    marker kind present, +100 per weak marker kind, +200 when the page
    has fewer than 20 tokens (error shells are short). Integer
    arithmetic end-to-end — bit-identical across engines; classify with
    score >= 500."""
    t = F.lower(text)
    strong = sum(
        (F.when(t.contains(m), F.lit(500)).otherwise(F.lit(0)) for m in SOFT404_STRONG),
        F.lit(0),
    )
    weak = sum(
        (F.when(t.contains(m), F.lit(100)).otherwise(F.lit(0)) for m in SOFT404_WEAK),
        F.lit(0),
    )
    short = F.when(F.size(tokens(text)) < 20, F.lit(200)).otherwise(F.lit(0))
    return (strong + weak + short).cast("long")


def dedup_lines(
    docs: "DataFrame",
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Intra-document line dedup — (doc_id, n_lines, n_dup_lines,
    clean_text): drop every repeat of a line WITHIN the same document
    (first occurrence wins, original order preserved), rebuild the text
    with single newlines.

    The within-doc counterpart of the cross-doc substring removal
    (corpus/substring.py): scraped pages repeat nav/footer lines many
    times inside one document, which n-gram repetition stats flag but
    don't fix. Deduplicating lines is also the first step of C4's
    three-sentence-span dedup (Raffel et al. 2020 §2.2).

    All native: split → posexplode → min-index per (doc, line) partial+
    final agg → ordered rebuild. Shuffles are keyed by doc (+ line for
    the first-occurrence agg) — no cross-doc exchange at all, so the
    operator scales embarrassingly with the corpus.
    """
    base = docs.select(doc_col, text_col).filter(F.col(doc_col).isNotNull())
    lines = base.select(
        doc_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    firsts = lines.groupBy(doc_col, "line").agg(F.min("idx").alias("idx"))
    rebuilt = firsts.groupBy(doc_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    totals = base.select(
        doc_col,
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    return totals.join(rebuilt, doc_col).select(
        doc_col,
        "n_lines",
        (F.col("n_lines") - F.col("n_kept")).cast("long").alias("n_dup_lines"),
        "clean_text",
    )


def dedup_lines_global(
    docs: "DataFrame",
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 10,
) -> "DataFrame":
    """CROSS-document line dedup — the CCNet paragraph-dedup step
    (Wenzek et al. LREC 2020 §3.1: hash every paragraph, keep only the
    first occurrence corpus-wide) applied at line granularity: scraped
    corpora repeat boilerplate lines (cookie banners, nav, footers)
    across millions of pages, and per-doc dedup can't see that.

    Frozen v1 rule: a NON-SHORT line (>= ``min_len`` chars — short/empty
    lines are structure, not boilerplate, and dedup'ing "" corpus-wide
    would weld every document together) survives only at its first
    occurrence, ordered by (doc_id, line index); all later copies are
    dropped and each text is rebuilt in original order.

    Output: (doc_id, n_lines, n_dropped, clean_text). Scale shape: one
    shuffle keyed by the line text for the first-occurrence agg (a slim
    (line, doc, idx) payload), one keyed by doc for the rebuild — never
    all-pairs, map-side partial aggs throughout.
    """
    base = docs.select(doc_col, text_col).filter(F.col(doc_col).isNotNull())
    lines = base.select(
        doc_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    longs = lines.filter(F.length("line") >= min_len)
    winners = longs.groupBy("line").agg(
        F.min(F.struct(F.col(doc_col), F.col("idx"))).alias("w")
    )
    kept = (
        lines.join(winners, "line", "left")
        .filter(
            (F.length("line") < min_len)
            | ((F.col("w")[doc_col] == F.col(doc_col)) & (F.col("w")["idx"] == F.col("idx")))
        )
        .drop("w")
    )
    rebuilt = kept.groupBy(doc_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("idx"), F.col("line")))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    totals = base.select(
        doc_col,
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    return totals.join(rebuilt, doc_col, "left").select(
        doc_col,
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def char_entropy_milli(text: Column) -> Column:
    """Shannon entropy of the character distribution in millibits
    (floor(H·1000) as long — floor, not round: round's half-way rule
    differs between engines): near-zero for degenerate repetition,
    ~4200 for English prose, pushing the ~log2(alphabet) ceiling for
    random/encoded blobs — the classic junk detector that catches
    base64/hex dumps and minified blobs that token-level stats miss.

    One per-row expression: split to characters, sort the DISTINCT
    alphabet (sorted so the float summation order — and therefore the
    final double — is identical on every engine), count each symbol
    with a vectorized filter, fold -Σ p·log2(p). O(alphabet × length)
    per row, interpreted — spread the scan (corpus/dedup.py::_spread)
    before calling this over a single-file corpus."""
    chars = F.filter(F.split(text, ""), lambda c: F.length(c) > 0)
    n = F.size(chars)
    alphabet = F.array_sort(F.array_distinct(chars))
    h = F.aggregate(
        alphabet,
        F.lit(0.0),
        lambda acc, c: acc
        - (
            F.size(F.filter(chars, lambda x: x == c)).cast("double") / n
        )
        * F.log2(
            F.size(F.filter(chars, lambda x: x == c)).cast("double") / n
        ),
    )
    return F.when(n > 0, F.floor(h * 1000).cast("long")).otherwise(
        F.lit(0).cast("long")
    )


# ---------------------------------------------------------------------------
# Readability (Flesch reading ease, integer milli-points)

SYLLABLE_RE = "[aeiouy]+"  # vowel groups ~ syllables (frozen heuristic)
SENTENCE_RE = "[.!?]+"  # terminator runs ~ sentence breaks


def readability_stats(text: Column) -> dict[str, Column]:
    """Flesch reading ease in exact integer milli-points.

    FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    with syllables ≈ vowel-group count (the standard no-dictionary
    heuristic) and sentences ≈ terminator runs, both floored at 1 so
    fragments still score. Millis + floor division keep the value
    bit-identical across engines (the same reasoning as
    ``quality_score``); the classic 0–100 band maps to 0–100,000.
    Empty/wordless docs score NULL (nothing to read).
    """
    n_words = F.size(tokens(text))
    n_sentences = F.greatest(
        F.size(F.regexp_extract_all(text, F.lit(SENTENCE_RE), F.lit(0))),
        F.lit(1),
    )
    n_syllables = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(SYLLABLE_RE), F.lit(0))
    )
    w = n_words.cast("long")
    s = n_sentences.cast("long")
    y = n_syllables.cast("long")

    def _idiv(a: Column, b: Column) -> Column:
        # exact integer division in long arithmetic (a, b >= 0): the
        # subtraction makes the numerator exactly divisible, so the
        # double division is exact — no float-rounding parity risk
        return ((a - a % b) / b).cast("long")

    fre = (
        F.lit(206835)
        - _idiv(F.lit(1015) * w, s)
        - _idiv(F.lit(84600) * y, w)
    )
    return {
        "n_words": w,
        "n_sentences": s,
        "n_syllables": y,
        "fre_milli": F.when(w > 0, fre.cast("long")),
    }


# ---------------------------------------------------------------------------
# Lexicon topic tagging (focused-crawl relevance categories)

# Frozen mini-taxonomy. Real deployments broadcast a curated lexicon
# table; the mechanics (token-membership counts + deterministic argmax)
# are what this freezes.
TOPIC_LEXICON: dict[str, tuple[str, ...]] = {
    "health": ("health", "disease", "vaccine", "patient", "clinic",
               "virus", "epidemic", "medicine"),
    "data": ("data", "query", "table", "row", "column", "join",
             "hash", "index"),
    "web": ("http", "url", "link", "page", "site", "crawl",
            "host", "robots"),
}


def topic_scores(toks: Column) -> dict[str, Column]:
    """Occurrence count of each topic's lexicon terms (multiplicity
    kept — a page that says 'vaccine' ten times is more about health
    than one that says it once). Native array filter, no shuffle."""
    out = {}
    for topic, terms in TOPIC_LEXICON.items():
        lex = F.array(*[F.lit(t) for t in terms])
        out[topic] = F.size(
            F.filter(toks, lambda tok: F.array_contains(lex, tok))
        ).cast("long")
    return out


def predict_topic(toks: Column) -> Column:
    """Argmax topic with deterministic tie-break (score desc, topic
    asc); 'other' when no lexicon term occurs at all."""
    scores = topic_scores(toks)
    pairs = F.array(
        *[
            F.struct(
                (-scores[topic]).alias("neg"), F.lit(topic).alias("topic")
            )
            for topic in sorted(TOPIC_LEXICON)
        ]
    )
    best = F.array_min(pairs)
    return F.when(-best["neg"] > 0, best["topic"]).otherwise(F.lit("other"))


# ------------------------------------------------- payment-card PII (Luhn) ---

# candidate span: 13-23 chars of digits with optional space/dash
# separators, digit-anchored both ends, RE2-safe (\b, no lookaround)
CARD_CAND_RE = r"\b[0-9][0-9 \-]{11,21}[0-9]\b"


def luhn_valid(digits: Column) -> Column:
    """TRUE iff a digits-only string is a plausible payment-card number:
    13-19 digits passing the Luhn mod-10 checksum (ISO/IEC 7812 — the
    published check digit scheme every card number satisfies). Pure
    native expressions: reverse the digit array, double every second
    digit (minus 9 when it overflows), sum mod 10."""
    arr = F.reverse(F.regexp_extract_all(digits, F.lit("[0-9]"), F.lit(0)))
    n = F.size(arr)
    total = F.aggregate(
        F.zip_with(
            arr,
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
            lambda c, i: F.when(
                i % 2 == 1,
                F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9).otherwise(
                    c.cast("int") * 2
                ),
            ).otherwise(c.cast("int")),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def card_candidates(text: Column) -> Column:
    """Array of (candidate, digits, valid) structs for every card-shaped
    span in the text — the audit view of `redact_cards`."""
    cands = F.regexp_extract_all(text, F.lit(CARD_CAND_RE), F.lit(0))
    return F.transform(
        cands,
        lambda c: F.struct(
            c.alias("candidate"),
            F.regexp_replace(c, "[^0-9]", "").alias("digits"),
            luhn_valid(F.regexp_replace(c, "[^0-9]", "")).alias("valid"),
        ),
    )


def redact_cards(text: Column) -> Column:
    """Replace every Luhn-VALID card-shaped span with <CARD>; invalid
    lookalikes (order ids, phone groups) stay — the checksum is what
    separates a real card number from 16 arbitrary digits. Fold of
    literal replaces over the validated candidates; no Python."""
    valid = F.filter(card_candidates(text), lambda s: s["valid"])
    return F.aggregate(
        valid,
        text,
        lambda acc, s: F.replace(acc, s["candidate"], F.lit("<CARD>")),
    )


# --------------------------------------------------------- Unicode script ---

# Principal Unicode block ranges per script (inclusive codepoints) —
# the coarse web-scale signal: language-ID models are per-language, but
# a crawler first needs to know WHAT SCRIPT a page is in to route it to
# the right tokenizer/model. Ranges are the published Unicode blocks.
SCRIPT_RANGES: dict[str, tuple[tuple[int, int], ...]] = {
    "latin": ((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)),
    "cyrillic": ((0x400, 0x4FF),),
    "greek": ((0x370, 0x3FF),),
    "arabic": ((0x600, 0x6FF),),
    "devanagari": ((0x900, 0x97F),),
    "cjk": ((0x3040, 0x30FF), (0x4E00, 0x9FFF)),  # kana + unified han
    "hangul": ((0xAC00, 0xD7AF),),
}


def _codepoints(text: Column) -> Column:
    """Per-character Unicode codepoints — ascii() returns the full
    codepoint of a single-char string identically in Spark and DuckDB
    (probed; see d_text_script's oracle)."""
    return F.transform(
        F.filter(F.split(text, ""), lambda c: c != ""), lambda c: F.ascii(c)
    )


def script_counts(text: Column) -> dict[str, Column]:
    """Character count per script class over the whole document."""
    cps = _codepoints(text)

    def in_ranges(cp, ranges):
        cond = F.lit(False)
        for lo, hi in ranges:
            cond = cond | ((cp >= lo) & (cp <= hi))
        return cond

    def matcher(ranges):
        # single-param lambda: a 2-param lambda would receive the element
        # INDEX as its second argument from F.filter
        return lambda cp: in_ranges(cp, ranges)

    return {
        name: F.size(F.filter(cps, matcher(ranges))).cast("long")
        for name, ranges in SCRIPT_RANGES.items()
    }


def predict_script(text: Column) -> Column:
    """argmax script with lexicographic tie-break; 'und' when no script
    character occurs (digits/punctuation-only). Same greatest-of-structs
    trick as predict_lang."""
    counts = script_counts(text)
    ordered = sorted(counts.keys(), reverse=True)
    packed = [
        F.struct(counts[s].alias("n"), F.lit(i).alias("r"), F.lit(s).alias("script"))
        for i, s in enumerate(ordered)
    ]
    best = F.greatest(*packed)
    return F.when(best["n"] > 0, best["script"]).otherwise(F.lit("und"))
