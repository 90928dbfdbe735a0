"""Text primitives for the large-scale pipeline operators (dedup,
quality, language-ID, fingerprinting).

Everything here is built from JVM-side ``pyspark.sql.functions`` only —
no Python UDFs — and each primitive has an exact DuckDB twin used by the
oracle queries, so results are bit-identical across engines:

* tokens: ``\\s+`` split, empties dropped
* 60-bit string hash: first 15 hex chars of md5 parsed as an integer
  (15 hex = 60 bits keeps the value positive in a signed 64-bit lane on
  both engines — no overflow, no sign mismatch)
* word n-gram shingles and char k-gram shingles
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TOKEN_SPLIT = r"\s+"


def tokens(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, TOKEN_SPLIT), lambda t: t != "")


def hash60(col: Column | str, seed: str | Column | None = None) -> Column:
    """Deterministic 60-bit hash of a string: int(md5(seed:val)[:15], 16).

    DuckDB twin: ``('0x' || substr(md5(<seed> || ':' || v), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        s = F.lit(seed) if isinstance(seed, str) else seed
        c = F.concat(s, F.lit(":"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, seed_expr: str | None = None) -> str:
    inner = f"{seed_expr} || ':' || {expr}" if seed_expr is not None else expr
    return f"('0x' || substr(md5({inner}), 1, 15))::BIGINT"


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles; texts shorter than n words shingle to the
    whole text (so no document vanishes from set-similarity measures).

    Built as a chain of ``zip_with`` joins of the token array against
    its own 1..(n-1)-shifted slices — the token array is evaluated a
    constant number of times per row. (An earlier form indexed the
    array with ``element_at`` inside a ``transform`` lambda;
    higher-order-function lambdas are interpreted without common
    subexpression elimination, so the regexp tokenization re-ran per
    gram — O(words²) splits per row.)

    DuckDB twin (n=3)::

        CASE WHEN len(words) < 3 THEN [text]
             ELSE [array_to_string(words[i:i+2], ' ')
                   for i in range(1, len(words) - 1)] END
    """
    col = F.col(text) if isinstance(text, str) else text
    ws = tokens(col)
    size = F.size(ws)
    acc = ws
    for j in range(1, n):
        shifted = F.slice(ws, j + 1, size - j)
        # zip_with pads the shorter side with null; concat(null) -> null
        # marks the incomplete tail grams, dropped by the slice below.
        acc = F.zip_with(
            acc, shifted, lambda g, w: F.concat(g, F.lit(" "), w)
        )
    grams = F.slice(acc, 1, size - (n - 1))
    return F.when(size < n, F.array(col)).otherwise(grams)


def char_shingles(text: Column | str, k: int = 8) -> Column:
    """Char k-gram shingles; texts shorter than k chars shingle to the
    whole text. DuckDB twin: ``[substr(text, i, 8) for i in
    range(1, len(text) - 6)]`` guarded by a CASE on length.
    """
    col = F.col(text) if isinstance(text, str) else text
    n = F.length(col)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.substring(col, i, F.lit(k)),
    )
    return F.when(n < k, F.array(col)).otherwise(grams)
