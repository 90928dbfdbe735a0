"""Compatibility shims for reference execution-harness symbols.

The reference exposes two public symbols that are artifacts of its
pandas/multiprocessing EXECUTION strategy rather than of the query
semantics this engine re-implements:

* ``PDQHashTree`` (reference ``pdq_dup_detect_algorithms/bk_tree.py:22``)
  — an in-memory BK-tree index probed row by row on the driver. The
  Spark engine fills the same pruning role with the banded/MIH
  equi-join (``operators.pdq``; ``duplicate_detection_method="banded"``,
  with ``"bk-tree"`` accepted as an alias), which scales out across
  executors instead of building one driver-resident tree.
* ``run_in_parallel`` (reference ``pdq_dup_detect_algorithms/utils.py:116``)
  — a ``multiprocessing.Pool`` map over probe rows. Spark's scheduler
  IS the parallel harness here; every operator in this package already
  distributes, so there is nothing to wrap.

User code ported from the reference that touches these gets an
immediate, actionable error instead of an ``AttributeError`` deep in a
pipeline. The scalar building blocks the reference uses around them
(``hamming_distance``, ``hex_to_binary``, threshold conversion) DO have
working twins in :mod:`.functions.hashes`.
"""

from __future__ import annotations

from typing import Any, NoReturn


class PDQHashTree:
    """Shim for the reference's driver-resident BK-tree index.

    Not implemented in the Spark engine by design — raise with the
    replacement recipe rather than silently building a single-machine
    index that cannot hold a 100 TB corpus.
    """

    def __init__(self, *args: Any, **kwargs: Any) -> NoReturn:
        raise NotImplementedError(
            "PDQHashTree is a single-process BK-tree from the reference "
            "implementation; this engine replaces its pruning role with "
            "a distributed banded equi-join. Use "
            "find_pdq_hash_duplicates(..., duplicate_detection_method="
            "'banded') (or 'bk-tree', accepted as an alias) instead of "
            "building an in-memory tree."
        )


def run_in_parallel(*args: Any, **kwargs: Any) -> NoReturn:
    """Shim for the reference's multiprocessing harness."""
    raise NotImplementedError(
        "run_in_parallel is the reference's multiprocessing.Pool "
        "harness; Spark's scheduler already parallelizes every operator "
        "in this package. Call the operator directly — e.g. "
        "find_pdq_hash_duplicates(entries, ...) distributes across all "
        "executors without a wrapper."
    )
