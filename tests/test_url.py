"""URL normalization + url-duplicate grouping unit tests.

Ports the reference's ``tests/unit/test_url.py`` table of normalization
cases (``:28-47``) and grouping semantics.
"""

from __future__ import annotations

import warnings


from cir_duplicate_detector_spark.functions.url import normalize_url
from cir_duplicate_detector_spark.operators.url_dedup import find_url_duplicates

from .conftest import rows_by_index

NORMALIZE_CASES = [
    (
        "https://example.com/path;param1=val1?arg=value&arg2=value2#15213",
        "example.com/path;param1=val1?arg=value&arg2=value2",
    ),
    ("http://hello.example.com/otherpath#page=123", "hello.example.com/otherpath"),
    (
        "https://example.com/path?differentarg=value#yes=no",
        "example.com/path?differentarg=value",
    ),
    (
        "https://test123.anotherexample.com/path2?arg=value#42",
        "test123.anotherexample.com/path2?arg=value",
    ),
    ("https://EXAMPLE.com/Path?arg=value", "example.com/path?arg=value"),
    ("example.com/path", "example.com/path"),
    ("https://example.com/path#1523", "example.com/path"),
]


def test_normalize_url_table(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in NORMALIZE_CASES], "url string"
    ).select("url", normalize_url("url").alias("norm"))
    got = {r["url"]: r["norm"] for r in df.collect()}
    for url, expected in NORMALIZE_CASES:
        assert got[url] == expected, url


def test_url_duplicates_golden(golden_df):
    out = find_url_duplicates(golden_df)
    got = rows_by_index(out)
    assert set(got) == {"UW0001", "UW0002", "UW0003", "UW0004", "UW0007"}
    assert got["UW0001"]["url_duplicates"] == ["UW0002", "UW0003"]
    assert got["UW0004"]["url_duplicates"] == ["UW0007"]


def test_url_duplicates_probe_filter(golden_df):
    out = find_url_duplicates(golden_df, indexes_to_check=["UW0004"])
    got = rows_by_index(out)
    # Only the probed group survives, but all its members are emitted.
    assert set(got) == {"UW0004", "UW0007"}


def test_url_duplicates_empty_probe_warns(golden_df):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = find_url_duplicates(golden_df, indexes_to_check=[])
        assert out.count() == 0
    assert any("empty" in str(x.message) for x in w)


def test_url_duplicates_null_urls_dropped(spark):
    rows = [("A", "x.com/1"), ("B", None), ("C", "x.com/1")]
    out = find_url_duplicates(spark.createDataFrame(rows, "index string, url string"))
    got = rows_by_index(out)
    assert set(got) == {"A", "C"}


def test_no_duplicates_empty_result(spark):
    rows = [("A", "x.com/1"), ("B", "x.com/2")]
    out = find_url_duplicates(spark.createDataFrame(rows, "index string, url string"))
    assert out.count() == 0


def test_url_duplicates_max_group_size_drops_planted_hot_key(spark):
    # One viral url shared by 50 rows, one normal pair. The opt-in cap
    # drops the mega-group before the window materializes its member
    # array; the pair survives; default None keeps reference semantics.
    import pytest

    rows = [(f"V{i:03d}", "https://viral.example.com/hot") for i in range(50)]
    rows += [("P1", "https://a.example.com/x"), ("P2", "http://a.example.com/x")]
    df = spark.createDataFrame(rows, "index string, url string")

    capped = find_url_duplicates(df, max_group_size=10)
    got = rows_by_index(capped)
    assert set(got) == {"P1", "P2"}
    assert got["P1"]["url_duplicates"] == ["P2"]

    uncapped = find_url_duplicates(df)
    assert uncapped.count() == 52
    # A bound the group fits under changes nothing.
    assert find_url_duplicates(df, max_group_size=50).count() == 52

    with pytest.raises(ValueError, match="max_group_size"):
        find_url_duplicates(df, max_group_size=0)
