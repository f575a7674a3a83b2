"""Rotation-staleness accounting MUST be mechanical, not narrated.

Round 10's verdict found six queries whose driver certifications had
gone three rounds stale while hand-maintained comments claimed "zero
slips".  These tests derive the due set from the CORRECTNESS_r*.json
history itself and fail the suite whenever the upcoming round's driver
window (the first 50 registered queries) would miss a due entry — the
invariant "every query driver-certified at least every third round"
now lives in code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

import rotation  # noqa: E402

from duckdb_webhook_gateway_spark import workloads


def test_driver_window_covers_every_due_entry():
    """Two-tier capacity-aware invariant (the registry outgrew the
    window's 3-round capacity in round 11: 153 entries > 3 x 50),
    evaluated AS OF the round the committed window was built for
    (workloads._WINDOW_ROUND) so the suite stays green in the handoff
    state right after the driver records that round's CORRECTNESS file
    (rounds 11 and 12 both ended structurally red on exactly that
    artifact — a bar that is red every handoff teaches people to
    ignore red).  The forcing function survives: _WINDOW_ROUND may be
    at most one round behind the recorded history, so a round that
    runs the driver against the PREVIOUS round's window turns the
    suite red at ITS handoff.
    Tier 1 (HARD): no entry may sit past MAX_STALENESS rounds
    un-served — anything already over the line must be in the window,
    so nothing ever crosses the MAX_STALENESS + 1 ceiling.
    Tier 2: when the due set fits the 50-slot window it must be fully
    covered; when OVERSUBSCRIBED the window must be EXACTLY
    prioritized_dues()[:50] — minimal deferral, stalest-first, with
    never-certified entries ahead of equally-stale re-certs."""
    names = list(workloads.all_entries())
    reg = workloads._REGISTERED_ROUND
    pc = workloads._PLAN_CHANGED_ROUND
    w_round = workloads._WINDOW_ROUND
    latest = rotation.latest_recorded_round()
    assert w_round in (latest, latest + 1), (
        f"committed window was built for r{w_round} but the recorded "
        f"history is at r{latest}: rebuild _CHECK_FIRST from "
        f"`python tools/rotation.py` and bump _WINDOW_ROUND as the "
        f"round's first commit"
    )
    due = rotation.due_now(
        names,
        upcoming_round=w_round,
        registered_rounds=reg,
        plan_changed_rounds=pc,
    )
    eff = rotation.effective_last(
        names,
        registered_rounds=reg,
        plan_changed_rounds=pc,
        upcoming_round=w_round,
    )
    window = set(names[:50])
    missing = sorted(set(due) - window)
    hard = [
        n for n in missing if w_round - eff[n] > rotation.MAX_STALENESS
    ]
    assert not hard, (
        f"HARD rotation slip: {len(hard)} entries would cross the "
        f"{rotation.HARD_CEILING}-round ceiling: "
        f"{[(n, f'clock r{eff[n]}') for n in hard]}"
    )
    if len(due) <= 50:
        assert not missing, (
            f"rotation slip: {len(missing)} due entries missing from a "
            f"non-full window: "
            f"{[(n, f'clock r{eff[n]}') for n in missing]}"
        )
    else:
        want = rotation.prioritized_dues(
            names,
            upcoming_round=w_round,
            registered_rounds=reg,
            plan_changed_rounds=pc,
        )[:50]
        assert list(names[:50]) == want, (
            f"oversubscribed window must be EXACTLY "
            f"prioritized_dues()[:50] for r{w_round}; diff: "
            f"{[(a, b) for a, b in zip(names[:50], want) if a != b]}"
        )


def test_every_never_certified_entry_has_a_registration_round():
    """A never-certified entry gets its due round from _REGISTERED_ROUND
    (due strictly after registration — the embedding_finite_gate
    precedent).  Every such entry MUST be annotated, every annotation
    must name a real registry entry, and no annotation may claim a
    FUTURE round — otherwise a new query could silently defer its first
    certification forever."""
    names = list(workloads.all_entries())
    last = rotation.last_certified(names)
    upcoming = rotation.latest_recorded_round() + 1
    reg = workloads._REGISTERED_ROUND
    unknown = sorted(set(reg) - set(names))
    assert not unknown, f"_REGISTERED_ROUND names not in registry: {unknown}"
    never = sorted(n for n, r in last.items() if r == 0)
    unannotated = sorted(set(never) - set(reg))
    assert not unannotated, (
        f"never-certified entries missing a _REGISTERED_ROUND "
        f"annotation: {unannotated}"
    )
    future = {n: r for n, r in reg.items() if r >= upcoming + 1}
    assert not future, f"registration rounds beyond the upcoming: {future}"


def test_plan_change_ledger_is_valid_and_forces_recertification():
    """_PLAN_CHANGED_ROUND entries must name real registry queries,
    never claim a round beyond the one being built, and while an
    entry's last green round predates its change round it must be DUE
    with priority clock 0 (a voided certification outranks every
    merely-stale one and may never defer).  Once a green record from
    >= the change round exists, the normal staleness clock resumes —
    checked both ways against the real history."""
    names = list(workloads.all_entries())
    reg = workloads._REGISTERED_ROUND
    pc = workloads._PLAN_CHANGED_ROUND
    upcoming = rotation.latest_recorded_round() + 1
    unknown = sorted(set(pc) - set(names))
    assert not unknown, f"_PLAN_CHANGED_ROUND names not in registry: {unknown}"
    future = {n: r for n, r in pc.items() if r >= upcoming + 1}
    assert not future, f"plan-change rounds beyond the upcoming: {future}"
    last = rotation.last_certified(names)
    due = rotation.due_now(
        names, registered_rounds=reg, plan_changed_rounds=pc
    )
    eff = rotation.effective_last(
        names, registered_rounds=reg, plan_changed_rounds=pc
    )
    for n, changed in pc.items():
        if last[n] < changed <= upcoming:
            assert n in due, f"voided-but-uncertified entry not due: {n}"
            assert eff[n] == 0, (n, eff[n])
        elif last[n] >= changed:
            # re-certified after the change: normal clock, no void
            assert eff[n] == last[n], (n, eff[n], last[n])


def test_history_green_definition_matches_driver_records():
    """Every record shape the driver has ever emitted must classify
    cleanly: green iff all ran checks passed and err is empty."""
    hist_files = rotation.correctness_files()
    assert hist_files, "no CORRECTNESS history found"
    import json

    for _rnd, path in sorted(hist_files.items()):
        with open(path) as fh:
            for name, rec in json.load(fh).items():
                green = rotation._is_green(rec)
                if rec.get("err"):
                    assert not green, (name, rec)
                elif rec.get("rows_match") is True and rec.get(
                    "schema_match"
                ) is True:
                    assert rec.get("hash_match") in (True, None, False), rec
                    assert green == (
                        rec.get("hash_match") in (True, None)
                    ), (name, rec)


def test_check_first_window_size_and_membership():
    """_CHECK_FIRST must fit the driver's 50-slot window and contain
    only real registry names (all_entries itself raises on typos)."""
    assert len(workloads._CHECK_FIRST) <= 50
    assert len(set(workloads._CHECK_FIRST)) == len(workloads._CHECK_FIRST)
    names = list(workloads.all_entries())
    assert list(names[: len(workloads._CHECK_FIRST)]) == list(
        workloads._CHECK_FIRST
    )


def test_bench_suite_names_are_registry_entries():
    """bench.py runs `[n for n in SUITE if n in entries]` — a typo'd or
    renamed suite name would silently vanish from the timing instead of
    failing, making a round's bench row quietly incomparable.  Every
    name in every suite must be a real registry entry."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        ),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    entries = set(workloads.all_entries())
    for suite in (
        bench.BENCH_QUERIES,
        bench.EXTENDED_QUERIES,
        bench.EXTENDED2_QUERIES,
        bench.EXTENDED3_QUERIES,
        bench.EXTENDED4_QUERIES,
    ):
        missing = [n for n in suite if n not in entries]
        assert not missing, f"bench suite names not in registry: {missing}"


def test_oversubscription_mechanism_is_satisfiable_for_next_round(
    tmp_path,
):
    """Forward simulation of the capacity problem the registry created
    in round 11 (153 entries > 3 x 50): pretend the current window all
    certifies green this round, build the NEXT round's window as
    prioritized_dues()[:50] (what the next builder must do), and assert
    it satisfies both tiers — the hard ceiling holds, deferral is
    minimal, and only the least-stale dues defer.  If this ever fails,
    the policy has become arithmetically unsatisfiable (registry grew
    past 4 x 50) and must be revisited BEFORE a round discovers it."""
    import json
    import shutil

    names = list(workloads.all_entries())
    reg = workloads._REGISTERED_ROUND
    pc = workloads._PLAN_CHANGED_ROUND
    # Clone the history STRICTLY BELOW the committed window's round and
    # append a synthetic all-green record for the window in ITS round
    # (anchoring on _WINDOW_ROUND, not latest+1, keeps this simulation
    # identical before and after the driver records that round — the
    # handoff state must not flip it red)
    this_round = workloads._WINDOW_ROUND
    for rnd, path in rotation.correctness_files().items():
        if rnd < this_round:
            shutil.copy(path, tmp_path / os.path.basename(path))
    synth = {
        n: {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        }
        for n in names[:50]
    }
    (tmp_path / f"CORRECTNESS_r{this_round}.json").write_text(
        json.dumps(synth)
    )
    root = str(tmp_path)
    upcoming = this_round + 1
    due = rotation.due_now(
        names, root, upcoming, registered_rounds=reg,
        plan_changed_rounds=pc,
    )
    eff = rotation.effective_last(
        names, root, registered_rounds=reg, plan_changed_rounds=pc
    )
    window = set(
        rotation.prioritized_dues(
            names, root, upcoming, registered_rounds=reg,
            plan_changed_rounds=pc,
        )[:50]
    )
    missing = sorted(set(due) - window)
    hard = [
        n for n in missing if upcoming - eff[n] > rotation.MAX_STALENESS
    ]
    assert not hard, hard
    if len(due) > 50:
        assert len(missing) == len(due) - 50
        newest_served = max(eff[n] for n in due if n in window)
        assert not [n for n in missing if eff[n] < newest_served]
    else:
        assert not missing


def test_never_certified_outranks_equally_stale_recerts(tmp_path):
    """The r12 verdict's first-cert priority, pinned directly (the r14
    window depends on it: the 8 deferred first-certs and the 45
    r11-certified re-certs share clock r11, and the first-certs must
    lead).  Synthetic history: 'seen' certified in round 1, 'fresh'
    registered in round 1 and never certified — both carry clock 1 for
    round 4, and prioritized_dues must order the never-certified entry
    first regardless of name order."""
    import json

    for fresh, seen in (("aaa_fresh", "zzz_seen"), ("zzz_fresh", "aaa_seen")):
        root = tmp_path / f"h_{fresh}"
        root.mkdir()
        (root / "CORRECTNESS_r1.json").write_text(
            json.dumps(
                {
                    seen: {
                        "rows_match": True,
                        "schema_match": True,
                        "hash_match": True,
                        "err": None,
                    }
                }
            )
        )
        order = rotation.prioritized_dues(
            [seen, fresh],
            str(root),
            upcoming_round=4,
            registered_rounds={fresh: 1},
        )
        assert order == [fresh, seen], (fresh, seen, order)
