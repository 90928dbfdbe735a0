"""Canonical logical-plan fingerprints for the query registry.

The per-round ``_ROUND_EDITS`` lint enforces that package edits are
*declared*, but a prose declaration of "results unchanged" is not
machine-checkable (VERDICT r10 item 2). This module makes the claim
checkable at the PLAN level: every registered query's ANALYZED logical
plan at sf0.001 is canonicalized (session-varying ids normalized) and
hashed; ``scripts/plan_fingerprints.py`` persists the map as
``PLANS_r<N>.json`` each round, and the lint
(`tests/test_plans.py::test_plan_fingerprints_vs_previous_round`)
diffs consecutive rounds with :func:`fingerprint_violations`:

* fingerprint CHANGED ⇒ the query must be queued in ``_PLAN_CHANGED``
  (voiding its stale driver rows — the driver re-verifies it) or be
  brand-new (it leads the rotation anyway). A physical-only rewrite
  that the author *believes* is result-identical still re-verifies:
  cheap insurance, and the prose rationale stays for the reviewer.
* fingerprint UNCHANGED ⇒ no driver-facing action needed; the plan the
  driver last vouched for is literally the same tree.
* fingerprint VOLATILE (differs across two fresh sessions at build
  time — e.g. a plan embedding a session-random staging path) ⇒
  excluded from the diff, visibly recorded as such in the artifact.

The fingerprint is the ANALYZED plan, not the optimized/physical one:
it is stable under Catalyst version-to-version optimization changes
and AQE, captures exactly what the author wrote (including literals —
a threshold change IS a result change), and exists before any eager
work. Canonicalization strips what varies per session: expression ids
(``#123``), generated lambda-variable counters (``x_2``), temp staging
paths, and JVM object hashes.
"""

from __future__ import annotations

import hashlib
import re

_EXPR_ID = re.compile(r"#\d+")
# Generated-name counters, ANCHORED to the forms Spark actually emits
# (a blanket `\w*?_\d+` would also collapse a user's foo_1 -> foo_2
# column rename — a REAL plan change — into the same canonical text):
# single-letter higher-order-function lambda variables (x_2, y_14).
_GEN_NAME = re.compile(r"\b([A-Za-z])_\d+\b")
# memory-sink view names get a random hex suffix (stream_sess_6f4fcd6b)
_HEX_NAME = re.compile(r"\b([A-Za-z]\w*?)_[0-9a-f]{8,}\b")
# Temp paths normalize to a token that PRESERVES the mkdtemp FAMILY
# PREFIX (round 15, ADVICE r14 medium): `/tmp/knn_bf_9ac3m1x2/topk.
# parquet` → `/TMP/knn_bf_`. Under the old blanket `/TMP` rule the two
# ANN recall rows hashed IDENTICALLY (the artifact dir was the only
# token distinguishing their plans), so a cross-wired shared cache
# would have produced no fingerprint change and the lint could not
# void the driver's vouched rows. The family prefix is the
# deterministic `prefix` argument of tracked_mkdtemp/shared_artifact
# (`[A-Za-z]\w*_` + tempfile's 8-char [a-z0-9_] suffix); everything
# after the first segment is still dropped (it held no entropy before
# and may hold session-random subdirs for non-family paths).
_TMP_PATH = re.compile(r"/tmp/([\w.+=-]+)[\w/.+=-]*")
_TMP_FAMILY = re.compile(r"([A-Za-z]\w*?_)[a-z0-9_]{8}$")


def _tmp_repl(m: "re.Match[str]") -> str:
    fam = _TMP_FAMILY.fullmatch(m.group(1))
    return "/TMP/" + (fam.group(1) if fam else "")
_OBJ_HASH = re.compile(r"@[0-9a-f]{6,}")
# repartition counts derive from defaultParallelism (cluster width) —
# physical layout only, environment-dependent by design. Two anchored
# forms (a lazy `[^\n]*? \d+` would grab the FIRST number on the line,
# which for RepartitionByExpression is a plan-bearing expression
# literal, not the count): `Repartition N, shuffle` puts the count
# first; `RepartitionByExpression [exprs], N` puts it last.
_REPART = re.compile(r"\b(Repartition) \d+")
# Anchored to the trailing `, N` at end-of-line (ADVICE r11): a lazy
# `\[[^\]]*\]` stops at the FIRST `]`, so an expression list that
# itself prints brackets (array indexing a#1[0], nested sort orders)
# would leak the environment-dependent partition count.
_REPART_EXPR = re.compile(
    r"\b(RepartitionByExpression .*), \d+$", re.MULTILINE
)


def canonical_plan(df) -> str:
    """The analyzed logical plan with session-varying tokens
    normalized. Deterministic across fresh sessions for every
    registered query except those recorded volatile by the artifact
    script (which the lint then skips)."""
    s = df._jdf.queryExecution().analyzed().toString()
    s = _EXPR_ID.sub("#", s)
    s = _GEN_NAME.sub(r"\1_", s)
    s = _HEX_NAME.sub(r"\1_", s)
    s = _TMP_PATH.sub(_tmp_repl, s)
    s = _OBJ_HASH.sub("@", s)
    s = _REPART.sub(r"\1 N", s)
    s = _REPART_EXPR.sub(r"\1, N", s)
    return s


def plan_fingerprint(df) -> str:
    return hashlib.sha256(canonical_plan(df).encode()).hexdigest()[:16]


def fingerprint_violations(
    prev: "dict[str, str]",
    cur: "dict[str, str]",
    plan_changed: "list[str]",
) -> "list[str]":
    """The lint rule, as pure dict logic (no Spark — testable with a
    deliberately-mutated simulation): queries present in BOTH rounds
    whose fingerprint changed and which are NOT queued in
    ``_PLAN_CHANGED``. Entries whose PREVIOUS value was volatile
    (``VOLATILE``) or errored (``ERR``) are skipped — there is no
    stable baseline to diff against. A query that goes stable →
    VOLATILE/ERR is a VIOLATION, not a skip: an edit that makes a plan
    session-random (or unbuildable) absolutely changed the plan, and
    letting it escape the queue would reopen the silent-edit hole this
    module exists to close (a result-changing edit could hide behind a
    deliberately-volatile plan). Brand-new queries (absent from
    ``prev``) are fine: never-verified queries lead the rotation."""
    bad = []
    for name, fp in cur.items():
        old = prev.get(name)
        if old is None:
            continue
        if old.startswith(("VOLATILE", "ERR")):
            continue
        if fp != old and name not in plan_changed:
            bad.append(name)
    return sorted(bad)
