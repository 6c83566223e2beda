"""Text-analysis expression kernel for the LLM-data-pipeline operators.

Everything here is a JVM-side Column expression (no Python UDFs): tokenize,
n-gram shingles, deterministic 60-bit hashes, token statistics. Each helper
has a ``sql_*`` twin emitting the equivalent DuckDB SQL so dedup/similarity
queries stay oracle-checkable — the hash is md5-based, so both engines
produce bit-identical values.

Scale notes (100 TB): all helpers are per-row expressions — no explode, no
shuffle, no driver round-trip. Shingling a document produces one array col;
the only data growth is the array itself (bounded by doc length).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large 31-bit prime for modular hashing; products with 31-bit multipliers
# stay under 2^62, so all arithmetic fits in a BIGINT on both engines.
HASH_P = 2_147_483_647

# Tokenizer: ASCII-lowercase, split on any non-[a-z0-9] run, drop empties.
_TOKEN_SPLIT = "[^a-z0-9]+"
# ASCII-ONLY case fold via translate, NOT lower(): full Unicode lowercasing
# is locale/engine-dependent — Java lowers 'İ' to "i"+combining-dot (two
# code points, which the split regex then severs into extra tokens) while
# DuckDB lowers it to plain "i" — so lower() silently diverges the token
# stream between the engine and its oracle on non-ASCII text. translate
# over the 26 ASCII letters is bit-identical everywhere; non-ASCII chars
# fall through unchanged and act as separators on both engines alike.
_ASCII_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LO = "abcdefghijklmnopqrstuvwxyz"


def tokens(col: Column) -> Column:
    """ASCII-lower-cased alphanumeric tokens of a text column (array<string>)."""
    return F.filter(
        F.split(F.translate(col, _ASCII_UP, _ASCII_LO), _TOKEN_SPLIT),
        lambda x: x != "",
    )


def sql_tokens(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array("
        f"translate({expr}, '{_ASCII_UP}', '{_ASCII_LO}'), '{_TOKEN_SPLIT}'), x -> x <> '')"
    )


def token_ngrams(toks: Column, n: int, sep: str = " ") -> Column:
    """Distinct word n-gram shingles of a token array.

    Guarded for short docs: Spark's ``sequence(1, k)`` runs DESCENDING for
    k < 1, so an unguarded expression would explode on docs with < n tokens.
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(sep, F.slice(toks, i, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def sql_token_ngrams(toks_expr: str, n: int, sep: str = " ") -> str:
    # DuckDB generate_series(1, k) is already empty for k < 1.
    return (
        f"list_distinct(list_transform(generate_series(1, len({toks_expr}) - {n - 1}), "
        f"i -> array_to_string(({toks_expr})[i:i+{n - 1}], '{sep}')))"
    )


ROLL_A = 1_000_003  # positional multiplier for combined shingle hashes


def token_hashes(toks: Column) -> Column:
    """Per-token 31-bit hashes (array<bigint>) — bind this as its OWN
    projected column before deriving shingles: a shared expensive array
    subtree referenced element-wise gets re-evaluated per access otherwise.
    """
    return F.transform(toks, lambda t: hashed(t))


def token_ngram_hashes_from(hashes: Column, n: int) -> Column:
    """Distinct hashed word n-gram shingles from a bound hash-array column,
    built ARITHMETICALLY: ``((h_i*A + h_{i+1})*A + h_{i+2}) mod P``.

    Cheaper than materializing shingle strings and hashing each (no
    per-position string concat, set ops on longs, one text hash per TOKEN
    not per shingle). Implementation is zip_with over shifted slices —
    never per-element ``element_at`` (which re-evaluates the array subtree
    per access, measured 5x slower). The 2^31 hash space makes per-doc
    shingle collisions negligible, and both engines compute identical
    values.
    """
    return F.array_distinct(token_ngram_hashes_positional(hashes, n))


def token_ngram_hashes(toks: Column, n: int) -> Column:
    """Convenience composition; prefer binding :func:`token_hashes` as a
    column first when the result feeds multiple consumers."""
    return token_ngram_hashes_from(token_hashes(toks), n)


def token_ngram_hashes_positional(hashes: Column, n: int) -> Column:
    """POSITIONAL (non-distinct, in order) hashed n-gram spans — one entry
    per window start, multiplicity preserved. The span-level dedup detectors
    need every occurrence: a phrase repeated inside one doc that also occurs
    in another doc is duplicated text at EACH of its positions."""
    cnt = F.size(hashes) - (n - 1)
    acc = F.slice(hashes, F.lit(1), cnt)
    for k in range(1, n):
        nxt = F.slice(hashes, F.lit(k + 1), cnt)
        acc = F.zip_with(acc, nxt, lambda x, y: (x * ROLL_A + y) % HASH_P)
    return F.when(F.size(hashes) >= n, acc).otherwise(
        F.array().cast("array<bigint>")
    )


def sql_token_hashes(toks_expr: str) -> str:
    """BIGINT[] of per-token hashes — bind as a named column, then feed
    :func:`sql_token_ngram_hashes_from`."""
    return f"list_transform({toks_expr}, t -> {sql_hashed('t')})"


def sql_token_ngram_hashes_from(hashes_col: str, n: int) -> str:
    """The shingle combination over an already-bound hash-array column.

    DuckDB's list indexing on a bound column is cheap, so the
    list_transform-with-index form is fine here (unlike Spark, where the
    slice/zip_with form avoids subtree re-evaluation).
    """
    return f"list_distinct({sql_token_ngram_hashes_positional(hashes_col, n)})"


def sql_token_ngram_hashes_positional(hashes_col: str, n: int) -> str:
    """DuckDB twin of :func:`token_ngram_hashes_positional` (no distinct,
    window order preserved)."""
    inner = f"{hashes_col}[i]"
    for k in range(1, n):
        inner = f"(({inner}) * {ROLL_A} + {hashes_col}[i+{k}]) % {HASH_P}"
    return (
        f"list_transform("
        f"generate_series(1, len({hashes_col}) - {n - 1}), i -> {inner})"
    )


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit positive hash: first 15 hex chars of md5.

    Identical in any engine with md5 — the cross-engine workhorse for
    MinHash/SimHash parity (DuckDB twin: :func:`sql_md5_long`).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def sql_md5_long(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def hashed(col: Column, mod: int = HASH_P) -> Column:
    """md5_long reduced mod a 31-bit prime (safe multiplier domain)."""
    return md5_long(col) % mod


def sql_hashed(expr: str, mod: int = HASH_P) -> str:
    return f"({sql_md5_long(expr)} % {mod})"


# --- token statistics (quality-scoring inputs) ---------------------------

# Tiny embedded stopword lists per language for the lang-id heuristic and
# stopword-ratio quality signal. Deliberately small: the operator semantics
# (score → argmax with deterministic tie-break) is the point; swap in real
# lists in production.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on"),
    "de": ("der", "die", "das", "und", "ist", "von"),
    "fr": ("le", "la", "les", "et", "est", "des"),
    "es": ("el", "la", "los", "y", "es", "de"),
    "zh": ("de", "le", "shi", "zai", "he"),
}


def stopword_count(toks: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def sql_stopword_count(toks_expr: str, lang: str = "en") -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks_expr}, t -> t IN ({lst})))"


def token_len_sum(toks: Column) -> Column:
    """Total characters across tokens (exact integer fold).

    NULL token list → 0, matching the oracle's COALESCE(list_sum(...), 0):
    without the outer coalesce Spark's F.aggregate returns NULL for a NULL
    array and the two engines would diverge on NULL ``documents.text``.
    """
    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
    return F.coalesce(total, F.lit(0).cast("bigint"))


def sql_token_len_sum(toks_expr: str) -> str:
    # DuckDB list_sum returns HUGEINT (arrives as float in the harness) and
    # NULL for empty lists; CAST+COALESCE pin it to Spark's bigint-0 result.
    return (
        f"CAST(COALESCE(list_sum(list_transform({toks_expr},"
        f" t -> CAST(len(t) AS BIGINT))), 0) AS BIGINT)"
    )
