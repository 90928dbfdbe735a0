"""Reference API-surface parity (SURVEY §2.6, VERDICT r1 #5): every
public name a reference caller imports must exist here with matching
scalar semantics, so porting requires no edits.

Reference symbol table: ``cir_duplicate_detector/__init__.py`` exports
``detect_duplicates``; ``pdq_dup_detect_algorithms/utils.py:19,32,55,90``
defines ``calculate_absolute_threshold``, ``hex_to_binary``,
``drop_literal_series_duplicates``, ``hamming_distance``;
``naive_duplicate_detector.py:39`` defines ``get_pdq_fuzzy_duplicates``.
"""

from __future__ import annotations

import pytest

REFERENCE_SYMBOLS = [
    "detect_duplicates",
    "find_url_duplicates",
    "find_pdq_hash_duplicates",
    "get_pdq_fuzzy_duplicates",
    "calculate_absolute_threshold",
    "hex_to_binary",
    "hamming_distance",
    "drop_literal_series_duplicates",
]


def test_reference_symbols_importable():
    import cir_duplicate_detector_spark as cds

    for name in REFERENCE_SYMBOLS:
        assert hasattr(cds, name), f"missing reference symbol {name}"
        assert name in cds.__all__, f"{name} not in __all__"


def test_hex_to_binary_reference_semantics():
    from cir_duplicate_detector_spark import hex_to_binary

    assert hex_to_binary("") == ""
    assert hex_to_binary("f") == "1111"
    assert hex_to_binary("f", 8) == "00001111"
    # No leading-zero padding without an explicit length (format(int, 'b')).
    assert hex_to_binary("0f") == "1111"
    assert hex_to_binary("8" + "0" * 63, 256) == "1" + "0" * 255


def test_hamming_distance_reference_semantics():
    from cir_duplicate_detector_spark import hamming_distance

    assert hamming_distance("1010", "1010") == 0
    assert hamming_distance("1010", "1011") == 1
    # Mixed lengths: left-aligned mismatches + length difference
    # (rapidfuzz padded behavior; '' vs s costs len(s)).
    assert hamming_distance("", "1111") == 4
    assert hamming_distance("10", "1011") == 2
    assert hamming_distance("11", "1011") == 3


def test_drop_literal_series_duplicates(spark):
    from cir_duplicate_detector_spark import drop_literal_series_duplicates

    df = spark.createDataFrame(
        [("a", "h1"), ("a", "h1"), ("a", "h2"), ("b", "h1")],
        "index string, hash string",
    )
    got = sorted(tuple(r) for r in drop_literal_series_duplicates(df).collect())
    assert got == [("a", "h1"), ("a", "h2"), ("b", "h1")]


def test_get_pdq_fuzzy_duplicates_pairs(spark):
    from cir_duplicate_detector_spark import get_pdq_fuzzy_duplicates

    zeros = "0" * 64
    one_bit = "0" * 63 + "1"  # distance 1 from zeros
    far = "f" * 64  # distance 256 from zeros
    df = spark.createDataFrame(
        [("a", [zeros]), ("b", [one_bit]), ("c", [far])],
        "index string, pdq_hash array<string>",
    )
    got = sorted(
        tuple(r)
        for r in get_pdq_fuzzy_duplicates(
            df, pqd_hash_similarity_threshold=0.9
        ).collect()
    )
    assert got == [("a", "b", 1), ("b", "a", 1)]


def test_pdq_rejects_non_string_hash_elements(spark):
    # Reference P5 (`pdq_hash.py:165-176`): non-string hash elements are
    # a ValueError. Typed schemas make this a plan-time check.
    from cir_duplicate_detector_spark import find_pdq_hash_duplicates

    df = spark.createDataFrame(
        [("a", [1, 2])], "index string, pdq_hash array<int>"
    )
    with pytest.raises(ValueError, match="array<string>"):
        find_pdq_hash_duplicates(df)


def test_empty_string_hashes_never_match(spark):
    # Both physical paths must drop '' hashes (reference: distance 256).
    from cir_duplicate_detector_spark import find_pdq_hash_duplicates
    from cir_duplicate_detector_spark.operators.pdq import exploded_hashes

    df = spark.createDataFrame(
        [("a", [""]), ("b", [""]), ("c", ["0" * 64])],
        "index string, pdq_hash array<string>",
    )
    assert exploded_hashes(df).count() == 1
    assert (
        find_pdq_hash_duplicates(
            df, pqd_hash_similarity_threshold=0.8, max_hex_len=64
        ).count()
        == 0
    )
    # General-length path (forced via max_hex_len > 64) agrees.
    assert (
        find_pdq_hash_duplicates(
            df, pqd_hash_similarity_threshold=0.8, max_hex_len=65
        ).count()
        == 0
    )


def test_compat_pdq_hash_tree_is_functional():
    # Ported reference code that builds a PDQHashTree directly must RUN
    # and produce the reference answers (reference bk_tree.py:22-97
    # shapes): construct from (id, binary-hash) pairs, probe with
    # get_duplicates, self-excluded by id, dist <= n, distance-sorted.
    import pytest

    import cir_duplicate_detector_spark as cds
    from cir_duplicate_detector_spark.functions.hashes import hex_to_binary

    zeros = hex_to_binary("00" * 32, 256)
    three = hex_to_binary("07" + "00" * 31, 256)  # dist 3 from zeros
    far = hex_to_binary("ff" * 32, 256)  # dist 256 from zeros
    corpus = {"A": zeros, "B": three, "C": far, "D": zeros}

    tree = cds.PDQHashTree(corpus)
    assert len(tree) == 4

    # t=0.9 -> n=26: A matches D (dist 0) then B (dist 3); never itself.
    out = tree.get_duplicates({"A": zeros}, 0.9)
    assert out == [
        [{"index": "D", "dist": 0}, {"index": "B", "dist": 3}]
    ]
    # Bidirectional shape: probing C finds nothing at t=0.9...
    assert tree.get_duplicates({"C": far}, 0.9) == [[]]
    # ...and everything at t=0.0 (n=256), self still excluded,
    # distance-sorted: B is 253 bits away, A/D the full 256.
    assert [h["index"] for h in tree.get_duplicates({"C": far}, 0.0)[0]] == [
        "B",
        "A",
        "D",
    ]

    with pytest.raises(ValueError):
        tree.get_duplicates({"A": zeros}, 1.1)
    with pytest.warns(UserWarning, match="empty"):
        assert tree.get_duplicates({}, 0.9) == []


def test_compat_run_in_parallel_is_functional():
    # Reference utils.py:108-146 semantics: tuple tasks unpack as
    # *args, non-tuples pass whole, results keep task order.
    import cir_duplicate_detector_spark as cds

    assert cds.run_in_parallel(lambda a, b: a + b, [(1, 2), (3, 4)]) == [3, 7]
    assert cds.run_in_parallel(lambda x: x * 2, [5, 6], num_workers=4) == [10, 12]
