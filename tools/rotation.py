"""Mechanical rotation-due accounting for the driver's 50-query window.

THE invariant (workloads/__init__.py): every registry query is
driver-certified at least every third round.  Round 10 proved that
hand-enumerated due lists drift — six r7-certified queries missed their
r10 window while the comments claimed "zero slips" — so the due set is
now DERIVED from the CORRECTNESS_r*.json history instead of narrated:
``tests/test_rotation.py`` fails the suite whenever the upcoming
round's first-50 window would leave any due entry uncertified.

Also usable from the command line while planning a round:

    python tools/rotation.py            # print the due set + staleness
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_STALENESS = 3  # certified in round R -> due again by round R + 3
# The registry outgrew the window's 3-round capacity in round 11
# (153 entries > 3 x 50 slots), so the every-third-round target is no
# longer always SATISFIABLE: a round's due set can exceed 50.  The
# policy extension, kept mechanical: when oversubscribed, the window
# must be FILLED with dues in stalest-first priority order and only
# the LEAST-stale dues may defer — and deferral is bounded by a HARD
# ceiling of MAX_STALENESS + 1 rounds that no entry may ever cross
# (capacity 4 x 50 = 200 >= registry size, so the ceiling is always
# satisfiable).  tests/test_rotation.py enforces both halves.
HARD_CEILING = MAX_STALENESS + 1


def _is_green(rec: dict) -> bool:
    """A driver record counts as a certification only if every check the
    driver ran passed: rows + schema always, hash when an oracle was
    paired (hash_match is None for rows-only entries), and no error."""
    return (
        rec.get("rows_match") is True
        and rec.get("schema_match") is True
        and rec.get("hash_match") in (True, None)
        and not rec.get("err")
    )


def correctness_files(repo_root: str = REPO_ROOT) -> dict[int, str]:
    out: dict[int, str] = {}
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            out[int(m.group(1))] = path
    return out


def certification_history(
    repo_root: str = REPO_ROOT, before_round: int | None = None
) -> dict[str, list[int]]:
    """query name -> sorted rounds with a GREEN driver record.

    ``before_round`` restricts the history to rounds STRICTLY BELOW it —
    the dues for round N are a function of the history before N, so a
    window built for round N stays well-defined (and checkable) even
    after CORRECTNESS_rN.json lands on disk (the handoff state that
    turned the suite red at the end of rounds 11 and 12)."""
    hist: dict[str, list[int]] = {}
    for rnd, path in sorted(correctness_files(repo_root).items()):
        if before_round is not None and rnd >= before_round:
            continue
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            if _is_green(rec):
                hist.setdefault(name, []).append(rnd)
    return hist


def latest_recorded_round(repo_root: str = REPO_ROOT) -> int:
    files = correctness_files(repo_root)
    if not files:
        raise FileNotFoundError(f"no CORRECTNESS_r*.json under {repo_root}")
    return max(files)


def last_certified(
    registry_names,
    repo_root: str = REPO_ROOT,
    before_round: int | None = None,
) -> dict[str, int]:
    """query -> last green round (0 = never driver-certified)."""
    hist = certification_history(repo_root, before_round)
    return {n: max(hist.get(n, [0])) for n in registry_names}


def due_now(
    registry_names,
    repo_root: str = REPO_ROOT,
    upcoming_round: int | None = None,
    max_staleness: int = MAX_STALENESS,
    registered_rounds: dict[str, int] | None = None,
    plan_changed_rounds: dict[str, int] | None = None,
) -> dict[str, int]:
    """Entries that MUST appear in the upcoming round's driver window.

    ``upcoming_round`` defaults to (latest recorded round) + 1 — the
    round currently being built.  An entry last certified in round R is
    due in every round >= R + max_staleness.  Never-certified entries
    (last = 0) are due in every round STRICTLY AFTER their registration
    round from ``registered_rounds`` (workloads._REGISTERED_ROUND — an
    entry registered mid-round behind an already-full window takes its
    first certification the next round, the embedding_finite_gate
    precedent); an unannotated never-certified entry is ALWAYS due.
    An entry whose PHYSICAL PLAN changed in round R
    (``plan_changed_rounds`` = workloads._PLAN_CHANGED_ROUND) has every
    certification from rounds < R VOIDED: it is due in every round
    >= R until a green record from round >= R exists — the
    "plan-changed queries re-certify the same round" policy, mechanical
    since round 12 (before that it was narrated, the same drift risk
    the r10 staleness slip exposed).
    Returns {name: last_certified_round}.
    """
    if upcoming_round is None:
        upcoming_round = latest_recorded_round(repo_root) + 1
    reg = registered_rounds or {}
    pc = plan_changed_rounds or {}
    # The dues for round N are defined by the history BEFORE N (a green
    # record from round N itself is the window's OUTPUT, not its input).
    last = last_certified(registry_names, repo_root, upcoming_round)

    def is_due(n: str, r: int) -> bool:
        changed = pc.get(n, 0)
        if changed and r < changed <= upcoming_round:
            return True  # certification predates the current plan
        if r:
            return r + max_staleness <= upcoming_round
        return upcoming_round > reg.get(n, 0)

    return {n: r for n, r in last.items() if is_due(n, r)}


def effective_last(
    registry_names,
    repo_root: str = REPO_ROOT,
    registered_rounds: dict[str, int] | None = None,
    plan_changed_rounds: dict[str, int] | None = None,
    upcoming_round: int | None = None,
) -> dict[str, int]:
    """query -> the round its staleness clock started: the last green
    driver round, or for never-certified entries their registration
    round (the first-cert precedent: due strictly after registration,
    aging on the same clock as everyone else).  A plan-changed entry
    whose certifications are voided gets clock 0 — an INVALID
    certification is staler than any old-but-valid one, so the
    stalest-first window serves it first and the hard-ceiling tier
    forbids deferring it at all.  The void applies only for change
    rounds <= ``upcoming_round`` — a future-dated ledger entry must not
    zero a clock for a round where ``due_now`` would not yet void it
    (the r12 ADVICE inconsistency: clock 0 leading the ordering while
    not due)."""
    reg = registered_rounds or {}
    pc = plan_changed_rounds or {}
    if upcoming_round is None:
        upcoming_round = latest_recorded_round(repo_root) + 1
    last = last_certified(registry_names, repo_root, upcoming_round)
    return {
        n: (
            0
            if r < pc.get(n, 0) <= upcoming_round
            else (r if r else reg.get(n, 0))
        )
        for n, r in last.items()
    }


def prioritized_dues(
    registry_names,
    repo_root: str = REPO_ROOT,
    upcoming_round: int | None = None,
    registered_rounds: dict[str, int] | None = None,
    plan_changed_rounds: dict[str, int] | None = None,
) -> list[str]:
    """The due set ordered stalest-first (effective_last ascending;
    plan-changed entries carry clock 0 and lead) — when a round is
    oversubscribed, the window must be exactly a prefix of this
    ordering.  Within one clock value, NEVER-certified entries outrank
    re-certifications (first evidence beats an Nth confirmation — the
    r12 verdict's first-cert priority), then name breaks the tie."""
    if upcoming_round is None:
        upcoming_round = latest_recorded_round(repo_root) + 1
    due = due_now(
        registry_names,
        repo_root,
        upcoming_round,
        registered_rounds=registered_rounds,
        plan_changed_rounds=plan_changed_rounds,
    )
    eff = effective_last(
        registry_names,
        repo_root,
        registered_rounds,
        plan_changed_rounds,
        upcoming_round,
    )
    last = last_certified(registry_names, repo_root, upcoming_round)
    return sorted(due, key=lambda n: (eff[n], 0 if last[n] == 0 else 1, n))


def main() -> None:  # pragma: no cover - CLI convenience
    import sys

    sys.path.insert(0, REPO_ROOT)
    from duckdb_webhook_gateway_spark.workloads import (
        _PLAN_CHANGED_ROUND,
        _REGISTERED_ROUND,
        all_entries,
    )

    names = list(all_entries())
    if "--emit-window" in sys.argv:
        # print the exact _CHECK_FIRST tuple for the upcoming round —
        # paste into workloads/__init__.py (and bump _WINDOW_ROUND) as
        # the round's first commit
        win = prioritized_dues(
            names,
            registered_rounds=_REGISTERED_ROUND,
            plan_changed_rounds=_PLAN_CHANGED_ROUND,
        )[:50]
        print(f"# _WINDOW_ROUND = {latest_recorded_round() + 1}")
        print("_CHECK_FIRST = (")
        for n in win:
            print(f'    "{n}",')
        print(")")
        return
    upcoming = latest_recorded_round() + 1
    due = due_now(
        names,
        registered_rounds=_REGISTERED_ROUND,
        plan_changed_rounds=_PLAN_CHANGED_ROUND,
    )
    eff = effective_last(
        names,
        registered_rounds=_REGISTERED_ROUND,
        plan_changed_rounds=_PLAN_CHANGED_ROUND,
    )
    window = set(names[:50])
    print(f"registry: {len(names)} entries; upcoming round r{upcoming}")
    print(f"due ({len(due)}):")
    for n in prioritized_dues(
        names,
        registered_rounds=_REGISTERED_ROUND,
        plan_changed_rounds=_PLAN_CHANGED_ROUND,
    ):
        mark = "OK(window)" if n in window else "DEFERRED"
        print(f"  clock r{eff[n] or '-'}: {n}  [{mark}]")
    missing = sorted(set(due) - window)
    hard = sorted(
        n for n in missing if upcoming - eff[n] > MAX_STALENESS
    )
    if hard:
        print(
            f"HARD SLIP: {len(hard)} entries would cross the "
            f"{HARD_CEILING}-round ceiling: {hard}"
        )
        raise SystemExit(1)
    if missing and len(due) <= 50:
        print(f"SLIP: {len(missing)} due entries outside the first-50 window")
        raise SystemExit(1)
    if missing:
        print(
            f"oversubscribed round: {len(due)} dues > 50 slots; "
            f"{len(missing)} least-stale dues defer one round "
            f"(ceiling-checked): {missing}"
        )
    else:
        print("window covers every due entry")


if __name__ == "__main__":
    main()
