"""Text-analysis operators for large-scale training-data pipelines:
language-ID (n-gram/stopword heuristic), quality scoring, token counting,
document fingerprinting.

All JVM-native column expressions (no Python in the hot path); every
hash is md5-based so an independent engine (DuckDB) reproduces values
bit-for-bit. At 100 TB these are embarrassingly parallel scans — no
shuffle at all until a downstream aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny marker-word lists per language (public stopwords).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "y", "las"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

STOPWORDS = LANG_MARKERS["en"] + ["a", "in", "it", "on", "for"]


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization of trimmed text (empty text -> [])."""
    return F.split(F.trim(F.col(col)), r"\s+")


def token_count(col: str = "text") -> Column:
    return F.when(F.trim(F.col(col)) == "", F.lit(0)).otherwise(
        F.size(tokens(col))
    ).cast("long")


def bpe_ish_token_count(col: str = "text") -> Column:
    """Sub-word-ish token count: word pieces + digits + punctuation as
    separate tokens (a BPE-grained proxy by regex, no vocab needed)."""
    return F.size(
        F.regexp_extract_all(
            F.col(col), F.lit(r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]"), F.lit(0)
        )
    ).cast("long")


def _count_matches(col: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), F.lit(0)))


def lang_scores(col: str = "text") -> dict[str, Column]:
    return {lang: _count_matches(F.col(col), ws) for lang, ws in LANG_MARKERS.items()}


def lang_id_from_scores(scores: dict[str, Column]) -> Column:
    """argmax of marker-word hits; deterministic tiebreak by language code
    order; 'und' (undetermined) when nothing matches.

    Implemented as array_max over (score, -index) structs so every score
    expression appears exactly ONCE in the plan. The naive chained
    when/otherwise accumulator re-embeds each earlier score per step, and
    Spark's subexpression elimination skips conditional branches — with 5
    languages that re-ran the marker regexes ~20x per row (measured 8x
    slowdown of the whole text_analysis stage)."""
    langs = sorted(scores)
    packed = F.array_max(
        F.array(
            *[
                F.struct(scores[lang].alias("s"), F.lit(-i).alias("ni"))
                for i, lang in enumerate(langs)
            ]
        )
    )
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    # `packed` is referenced 3x — callers on the hot path should pass
    # pre-staged score COLUMNS (cheap refs) so duplication is free.
    return F.when(packed.getField("s") <= 0, F.lit("und")).otherwise(
        F.element_at(lang_arr, -packed.getField("ni") + 1)
    )


def lang_id(col: str = "text") -> Column:
    return lang_id_from_scores(lang_scores(col))


def punct_ratio(col: str = "text") -> Column:
    n_punct = F.length(F.regexp_replace(F.col(col), r"[^.,;:!?'\"()-]", ""))
    # No rounding: both engines compute the identical IEEE-754 division,
    # while round() HALF_UP (Spark) vs HALF_EVEN (DuckDB) could diverge.
    return n_punct / F.greatest(F.length(F.col(col)), F.lit(1))


def stopword_ratio(col: str = "text") -> Column:
    n_stop = _count_matches(F.col(col), STOPWORDS)
    return n_stop / F.greatest(token_count(col), F.lit(1))


def quality_score(col: str = "text") -> Column:
    """Composite [0,1] quality heuristic: length band + punctuation sanity
    + stopword presence (Gopher-rule-flavored, deterministic)."""
    n_tok = token_count(col)
    len_ok = (n_tok >= 10) & (n_tok <= 10_000)
    punct_ok = punct_ratio(col) <= 0.2
    stop_ok = stopword_ratio(col) >= 0.01
    mean_word_len = F.length(
        F.regexp_replace(F.col(col), r"\s+", "")
    ) / F.greatest(n_tok, F.lit(1))
    word_len_ok = (mean_word_len >= 2.0) & (mean_word_len <= 12.0)
    score = (
        len_ok.cast("int") + punct_ok.cast("int")
        + stop_ok.cast("int") + word_len_ok.cast("int")
    )
    return score / F.lit(4.0)


def doc_fingerprint(col: str = "text", n_hex: int = 16) -> Column:
    """Content fingerprint: md5 over whitespace-normalized lowercased text
    (the deterministic stand-in for a rolling Rabin hash; same dedup
    contract: equal normalized content <=> equal fingerprint)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))
    return F.substring(F.md5(norm), 1, n_hex)


def analyze(df: DataFrame, col: str = "text") -> DataFrame:
    """Staged evaluation: the expensive scans (tokenize, stopword regex,
    punct strip) are computed once in a first projection and the derived
    ratios/scores reference those attributes — the naive all-in-one
    select re-runs each regex per consuming column (token_count alone is
    referenced 4x across the outputs)."""
    scores = lang_scores(col)
    staged = df.select(
        "*",
        token_count(col).alias("n_tokens"),
        _count_matches(F.col(col), STOPWORDS).alias("__n_stop"),
        F.length(F.regexp_replace(F.col(col), r"[^.,;:!?'\"()-]", "")).alias("__n_punct"),
        F.length(F.regexp_replace(F.col(col), r"\s+", "")).alias("__n_nonspace"),
        F.length(F.col(col)).alias("__n_chars"),
        bpe_ish_token_count(col).alias("n_subword_tokens"),
        # stage each language's marker scan once; the argmax in the next
        # projection references these as cheap column refs
        *[scores[lang].alias(f"__s_{lang}") for lang in sorted(scores)],
        doc_fingerprint(col).alias("fingerprint"),
    ).withColumn(
        "detected_lang",
        lang_id_from_scores({lang: F.col(f"__s_{lang}") for lang in scores}),
    )
    n_tok1 = F.greatest(F.col("n_tokens"), F.lit(1))
    p_ratio = F.col("__n_punct") / F.greatest(F.col("__n_chars"), F.lit(1))
    s_ratio = F.col("__n_stop") / n_tok1
    mean_word_len = F.col("__n_nonspace") / n_tok1
    score = (
        ((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 10_000)).cast("int")
        + (p_ratio <= 0.2).cast("int")
        + (s_ratio >= 0.01).cast("int")
        + ((mean_word_len >= 2.0) & (mean_word_len <= 12.0)).cast("int")
    )
    return staged.select(
        *[c for c in df.columns],
        "n_tokens",
        "n_subword_tokens",
        "detected_lang",
        p_ratio.alias("punct_ratio"),
        s_ratio.alias("stopword_ratio"),
        (score / F.lit(4.0)).alias("quality_score"),
        "fingerprint",
    )


# ----------------------------------------------------------- redaction
#
# PII-ish scrubbing for training corpora: regex redaction of emails,
# IPv4 addresses, and long digit runs (phone/account numbers). Pure
# regexp_replace chain — JVM codegen, no shuffle, and bit-identical in
# any engine with POSIX-ish regex (the DuckDB oracle runs the same
# patterns). Order matters: emails first (their domains would otherwise
# partially match the digit-run pattern), then IPs, then digit runs.

REDACTION_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("digits", r"\b\d{7,}\b", "<NUM>"),
]


def redact_pii(col: str = "text") -> Column:
    """Redacted text column: each pattern class replaced by its tag."""
    out = F.col(col)
    for _name, pat, tag in REDACTION_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def redaction_counts(col: str = "text") -> dict[str, Column]:
    """Per-class redaction counts (how many spans each pattern hit),
    computed on the PRE-redaction text so classes don't steal each
    other's matches; emails are excluded from the digit-run count the
    same way the sequential replace excludes them."""
    counts: dict[str, Column] = {}
    stripped = F.col(col)
    for name, pat, _tag in REDACTION_PATTERNS:
        counts[name] = F.size(
            F.regexp_extract_all(stripped, F.lit(pat), F.lit(0))
        ).cast("long")
        stripped = F.regexp_replace(stripped, pat, " ")
    return counts


# ------------------------------------------------------ repetition stats
#
# Gopher-style repetition filters: documents dominated by repeated lines
# or by one token are low-quality. Both ratios are computed with array
# expressions (no explode, no shuffle) and are exactly reproducible in
# SQL (list functions in DuckDB).


def lines(col: str = "text") -> Column:
    """Non-empty trimmed lines."""
    return F.filter(
        F.transform(F.split(F.col(col), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def dup_line_fraction(col: str = "text") -> Column:
    """1 - distinct/total over non-empty lines (0.0 for <=1 line)."""
    ls = lines(col)
    n = F.size(ls)
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(ls)) / n
    )


def top_token_share(col: str = "text") -> Column:
    """Share of the most frequent whitespace token (0.0 for empty).

    Computed as the longest equal-run over the SORTED token list with a
    single aggregate() fold carrying (prev, run, best) — O(n log n) per
    row, all inside one row's expressions: no explode, no groupBy, no
    shuffle. (The naive count-per-distinct-token shape is O(n^2) per
    row — ruinous on 10k-token documents.)"""
    toks = F.array_sort(tokens(col))
    n = token_count(col)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    folded = F.aggregate(
        toks,
        init,
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(acc.getField("prev").eqNullSafe(t), acc.getField("run") + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc.getField("best"),
                F.when(
                    acc.getField("prev").eqNullSafe(t), acc.getField("run") + 1
                ).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.getField("best"),
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(folded / n)
