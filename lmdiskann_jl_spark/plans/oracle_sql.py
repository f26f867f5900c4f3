"""DuckDB SQL fragment builders mirroring the engine's Spark expressions.

Every fragment is built from the SAME constants as the Spark side
(``functions/text.py``, ``operators/dedup.py``) and uses arithmetic that is
bit-identical across engines:

- distances: element-wise double math folded left-to-right in list order
  (``list_reduce`` with first-element init == Spark ``aggregate`` with 0.0
  init, since 0.0 + x == x exactly) — verified bit-exact on testdata;
- hashing: md5-derived (both engines implement the same md5), parsed via
  ``CAST('0x'||hex AS BIGINT)`` (DuckDB) / ``conv(hex,16,10)`` (Spark);
- integer arithmetic everywhere else; doubles only at final, rounded outputs.
"""

from __future__ import annotations

from lmdiskann_jl_spark.functions.text import (
    FINGERPRINT_GRAM,
    HASH_MOD,
    LANG_STOPWORDS,
    QUALITY_STOPWORDS,
    TOKEN_SPLIT_RE,
)
from lmdiskann_jl_spark.operators.dedup import minhash_perms


def tokens(e: str) -> str:
    return f"list_filter(string_split_regex(lower({e}), '{TOKEN_SPLIT_RE}'), x -> x != '')"


def hash60(e: str) -> str:
    return f"CAST('0x' || substr(md5({e}), 1, 15) AS BIGINT)"


def hash32(e: str) -> str:
    return f"CAST('0x' || substr(md5({e}), 1, 8) AS BIGINT)"


def hash_mod(e: str) -> str:
    return f"({hash60(e)} % {HASH_MOD})"


def bpe_tokens(e: str) -> str:
    """Mirror of functions.text.token_counts['n_bpe_tokens']: alpha runs
    count ceil(len/4) pieces, digits/symbols one each."""
    return (
        f"CAST(COALESCE(list_sum(list_transform("
        f"list_filter(string_split_regex(lower({e}), '[^a-z]+'), x -> x != ''),"
        f" t -> CAST(ceil(length(t) / 4.0) AS INT))), 0)"
        f" + length(regexp_replace(lower({e}), '[a-z\\s]', '', 'g')) AS BIGINT)"
    )


def dlist(e: str) -> str:
    """Cast a FLOAT[] to DOUBLE[] element-wise."""
    return f"list_transform({e}, x -> CAST(x AS DOUBLE))"


def sq_euclidean(a: str, b: str) -> str:
    d = "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    return f"list_reduce(list_transform(list_zip({a}, {b}), p -> {d}*{d}), (x,y) -> x+y)"


def euclidean(a: str, b: str) -> str:
    return f"sqrt({sq_euclidean(a, b)})"


def dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)), (x,y) -> x+y)"
    )


def norm(a: str) -> str:
    return f"sqrt(list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))"


def cosine_dist(a: str, b: str) -> str:
    return f"(1.0 - {dot(a, b)} / ({norm(a)} * {norm(b)}))"


def cosine_sim(a: str, b: str) -> str:
    return f"({dot(a, b)} / ({norm(a)} * {norm(b)}))"


def metric(name: str, a: str, b: str) -> str:
    return {"euclidean": euclidean, "sqeuclidean": sq_euclidean, "cosine": cosine_dist}[name](a, b)


def word_shingles(t: str, n: int = 3) -> str:
    """Mirror of functions.text.word_shingles: 1-based windows of n tokens."""
    parts = " || ' ' || ".join(f"{t}[i+{j}]" if j else f"{t}[i]" for j in range(n))
    return f"list_transform(range(1, greatest(len({t}) - {n - 1}, 0) + 1), i -> {parts})"


def stopword_hits(t: str, words: list[str]) -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({t}, x -> list_contains({lit}, x)))"


def perms_values(n_perm: int) -> str:
    """VALUES list for the shared minhash permutation constants."""
    return ", ".join(f"({i}, {a}, {b})" for i, a, b in minhash_perms(n_perm))


def langid_hit_columns(toks: str) -> str:
    """Per-language stopword hit counts as select-list columns (h_en, h_de, ...)."""
    return ", ".join(
        f"{stopword_hits(toks, ws)} AS h_{lang}" for lang, ws in LANG_STOPWORDS.items()
    )


def langid_case() -> str:
    """CASE over the h_<lang> columns; first language in dict order wins ties,
    zero hits -> 'und' — matching functions.text.langid_expr exactly."""
    best = "greatest(" + ", ".join(f"h_{lang}" for lang in LANG_STOPWORDS) + ")"
    branches = " ".join(f"WHEN h_{lang} = {best} THEN '{lang}'" for lang in LANG_STOPWORDS)
    return f"CASE WHEN {best} = 0 THEN 'und' {branches} ELSE 'und' END"


__all__ = [
    "FINGERPRINT_GRAM",
    "HASH_MOD",
    "LANG_STOPWORDS",
    "QUALITY_STOPWORDS",
    "cosine_dist",
    "cosine_sim",
    "dlist",
    "dot",
    "euclidean",
    "hash32",
    "hash60",
    "hash_mod",
    "langid_case",
    "langid_hit_columns",
    "metric",
    "norm",
    "perms_values",
    "sq_euclidean",
    "stopword_hits",
    "tokens",
    "word_shingles",
]
