"""Text-analysis column expressions for the training-data pipeline.

These are beyond the reference's surface (SURVEY.md section 2.6 notes the
reference has no string functions) — they are the LLM-pipeline operators the
engine adds as first-class components: tokenization, language-ID heuristic,
quality scoring, token counting, document fingerprinting.

Design constraints:
- pure native column expressions (JVM codegen, no UDFs) — at 100 TB these run
  inside the parquet scan stage with zero shuffles;
- every expression has a DuckDB mirror in ``plans/oracle_sql.py`` built from
  the SAME constants in this module, and uses only integer or
  order-deterministic double arithmetic so both engines produce identical
  values (the driver hash-compares).

Hashing is md5-based (both engines implement identical md5) — NOT
Spark ``hash()``/DuckDB ``hash()`` which are different algorithms.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shared constants — the DuckDB oracle builders import these same values
TOKEN_SPLIT_RE = "[^a-z0-9]+"
HASH_MOD = 1_000_000_007  # keeps a*h below 2^60 in both engines' BIGINT math
FINGERPRINT_GRAM = 8  # char-gram width for the winnowing-style fingerprint

# PII patterns — restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): literal classes, +, and bounded repetition only
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_NUMBER_RE = "[0-9]{7,}"  # long digit runs: phone numbers, SSNs, card numbers

# tiny per-language stopword lists for the language-ID heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "por", "con", "para"],
}
QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Lowercased alnum word tokens; identical to the oracle's
    ``list_filter(string_split_regex(lower(text), ...), x -> x != '')``."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda x: x != "")


def hash60(s: Column) -> Column:
    """Deterministic 60-bit integer hash of a string via md5 — identical in
    Spark (``conv(substr(md5,1,15),16,10)``) and DuckDB
    (``CAST('0x'||substr(md5,1,15) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash32(s: Column) -> Column:
    """32-bit md5-derived hash (8 hex chars) for simhash bit sampling."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def hash_mod(s: Column) -> Column:
    return hash60(s) % HASH_MOD


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-gram word shingles as strings ('w1 w2 w3'); empty when < n tokens.

    Built with sequence+transform — element_at is 1-based, matching the
    oracle's 1-based list indexing.
    """
    cnt = F.size(toks) - (n - 1)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    # sequence(1, m) would count DOWN for m < 1, so gate short docs explicitly
    return F.when(cnt >= 1, sh).otherwise(F.array().cast("array<string>"))


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """Count of tokens (with multiplicity) in ``words`` — no dedup, matching
    the oracle's list_filter+list_contains."""
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))


def langid_expr(text: Column) -> Column:
    """Heuristic language ID: the language whose stopword list hits the most
    tokens; ties and zero-hit texts fall back to 'und' (undetermined).

    Deterministic integer comparisons only.
    """
    toks = tokens(text)
    hit_cols = {lang: stopword_hits(toks, words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*hit_cols.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties (CASE evaluates in order below)
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when(hit_cols[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring feature set (all exact-integer or round-stable):

    n_chars, n_tokens, mean_token_len, stopword_ratio, alnum_ratio.
    The composite ``quality_score`` is a simple bounded heuristic:
    stopword presence + reasonable token length + alnum density.
    """
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_tok = F.when(n_tokens > 0, tok_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0,
        stopword_hits(toks, QUALITY_STOPWORDS).cast("double") / n_tokens,
    ).otherwise(F.lit(0.0))
    alnum_chars = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
    alnum_ratio = F.when(n_chars > 0, alnum_chars.cast("double") / n_chars).otherwise(F.lit(0.0))
    score = (
        F.least(stop_ratio * 4, F.lit(1.0))
        + F.when((mean_tok >= 3) & (mean_tok <= 10), 1.0).otherwise(0.0)
        + alnum_ratio
    ) / 3.0
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": F.round(mean_tok, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
        "alnum_ratio": F.round(alnum_ratio, 4),
        "quality_score": F.round(score, 4),
    }


def token_counts(text: Column) -> dict[str, Column]:
    """Whitespace token count + a BPE-ish subword proxy: alpha runs count as
    ceil(len/4) pieces (typical BPE token ~4 chars), digits and other symbols
    one piece each.  Integer-exact in both engines."""
    ws = F.size(F.filter(F.split(text, "\\s+"), lambda x: x != ""))
    alpha_runs = F.filter(F.split(F.lower(text), "[^a-z]+"), lambda x: x != "")
    bpe_alpha = F.aggregate(
        alpha_runs, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("int")
    )
    others = F.length(F.regexp_replace(F.lower(text), "[a-z\\s]", ""))
    return {
        "n_ws_tokens": ws.cast("long"),
        "n_bpe_tokens": (bpe_alpha + others).cast("long"),
    }


def repetition_features(text: Column) -> dict[str, Column]:
    """Gopher-style repetition quality signals (Rae et al. 2021, table A1):
    the fraction of duplicate tokens, the share of the most frequent token,
    and the share of the most frequent word bigram.  Repetitive documents
    (boilerplate, keyword stuffing, generation loops) score high and are
    dropped by training-data quality filters.

    All ratios are exact integer divisions rounded at the output — the
    DuckDB oracle reproduces them bit-for-bit.  Per-row cost is
    O(unique x total) HOF work inside the scan stage: no shuffle, no UDF.
    """
    toks = tokens(text)
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))

    def top_count(arr: Column) -> Column:
        # max multiplicity via one run-length pass over the sorted array.
        # NOT transform(distinct, g -> size(filter(arr, = g))): HOF lambdas
        # re-evaluate captured expression trees per element (no CSE on the
        # interpreted path), which made the nested form ~100x slower.
        init = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def step(st: Column, x: Column) -> Column:
            run = F.when(x == st["prev"], st["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(st["best"], run).alias("best"),
            )

        return F.aggregate(F.array_sort(arr), init, step, lambda st: st["best"])

    def top_frac(arr: Column, size_col: Column) -> Column:
        return F.when(
            size_col > 0, top_count(arr).cast("double") / size_col
        ).otherwise(F.lit(0.0))

    bigrams = word_shingles(toks, 2)
    nb = F.size(bigrams)
    dup_frac = F.when(n > 0, (n - n_uniq).cast("double") / n).otherwise(F.lit(0.0))
    return {
        "n_tokens": n.cast("long"),
        "dup_token_frac": F.round(dup_frac, 4),
        "top_token_frac": F.round(top_frac(toks, n), 4),
        "top_bigram_frac": F.round(top_frac(bigrams, nb), 4),
    }


def pii_features(text: Column) -> dict[str, Column]:
    """PII detection + redaction: emails and long digit runs are counted and
    replaced with typed placeholders.  Pure regexp expressions (Spark
    replaces globally by default; the oracle passes the 'g' flag) — at
    100 TB this is a scan-stage rewrite with zero shuffles.
    """
    redacted = F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"), PII_NUMBER_RE, "<NUMBER>"
    )
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), F.lit(0))).cast("long"),
        "n_numbers": F.size(F.regexp_extract_all(text, F.lit(PII_NUMBER_RE), F.lit(0))).cast("long"),
        "redacted_text": redacted,
    }


def fingerprint_expr(text: Column, width: int = FINGERPRINT_GRAM) -> Column:
    """Winnowing-style document fingerprint: minimum 60-bit hash over all
    sliding ``width``-char grams (the public MOSS/winnowing idea, reduced to
    one global min).  Equal texts -> equal fingerprints; near-equal texts
    usually share it.
    """
    lt = F.lower(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(lt) - (width - 1), F.lit(1)))
    hashes = F.transform(idx, lambda i: hash60(lt.substr(i, F.lit(width))))
    return F.array_min(hashes)
