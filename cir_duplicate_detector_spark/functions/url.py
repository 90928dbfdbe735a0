"""URL normalization as a pure Catalyst expression.

Reference semantics (``cir_duplicate_detector/url.py:11-29`` —
``extract_base_url``): lowercase the WHOLE url, parse, and emit
``netloc + path [+ ";"params] [+ "?"query]`` — i.e. drop the scheme and
the fragment, keep everything else. Python's ``urlparse`` routes
scheme-less input entirely into ``path``, so ``example.com/p`` and
``https://example.com/p#x`` normalize equal
(reference ``tests/unit/test_url.py:28-47``).

That behavior is exactly: strip a leading ``scheme://`` if present, strip
a ``#fragment`` suffix, over the lowercased string. Two regexp_replace
calls — fully codegen'd, no UDF, and the same RE2-compatible patterns run
verbatim in the DuckDB oracle. (Spark's ``parse_url`` does NOT match the
scheme-less case, so it is deliberately not used.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# RFC 3986 scheme: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) — after
# lowercasing, [a-z][a-z0-9+.\-]* followed by "://".
SCHEME_PATTERN = r"^[a-z][a-z0-9+.\-]*://"
FRAGMENT_PATTERN = r"#.*$"


def normalize_url(url: Column | str) -> Column:
    """Lowercase, drop ``scheme://`` prefix and ``#fragment`` suffix."""
    col = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(
        F.regexp_replace(F.lower(col), SCHEME_PATTERN, ""),
        FRAGMENT_PATTERN,
        "",
    )


# The same normalization for the DuckDB oracle (ANSI SQL, RE2 regex).
def normalize_url_sql(expr: str) -> str:
    return (
        "regexp_replace(regexp_replace(lower(" + expr + "), "
        "'^[a-z][a-z0-9+.\\-]*://', ''), '#.*$', '')"
    )
