"""Unit tests for the rotation planner's pure suggestion logic.

The planner enforces the repo's driver-evidence discipline (no query
older than two rounds, changed queries re-verify immediately, rows-only
diagnostics never rotate without their oracled twins). A silent planner
bug breaks that discipline without any test going red elsewhere — so the
invariants are pinned here against synthetic registries, no Spark or
CORRECTNESS files needed.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "window_planner",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "window_planner.py"),
)
wp = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(wp)
plan_window = wp.plan_window


def test_oldest_first_and_window_bound():
    queries = [f"q{i}" for i in range(10)]
    ages = {f"q{i}": i for i in range(10)}  # q9 oldest
    sugg, pulled, skipped = plan_window(
        queries, ages, [], window=4, co_rotate={}, twinned=set())
    assert sugg == ["q9", "q8", "q7", "q6"]
    assert not pulled and not skipped


def test_never_run_outranks_merely_stale():
    queries = ["stale", "fresh", "never"]
    ages = {"stale": 3, "fresh": 0}  # "never" absent = never-run
    sugg, _, _ = plan_window(queries, ages, [], window=2,
                             co_rotate={}, twinned=set())
    assert sugg == ["never", "stale"]


def test_changed_pass_never_displaced_by_pool(
):
    """Driver ADVICE r7: a changed query's group must fit against the
    WHOLE window, even when stale pool singles would otherwise fill it —
    here the changed group lands first although every pool entry is
    infinitely stale."""
    queries = ["changed_q", "twin_a", "twin_b"] + [f"p{i}" for i in range(8)]
    ages = {}  # everyone never-run
    co = {"changed_q": ["twin_a", "twin_b"]}
    sugg, pulled, skipped = plan_window(
        queries, ages, ["changed_q"], window=3, co_rotate=co, twinned=set())
    assert sugg == ["changed_q", "twin_a", "twin_b"]
    assert pulled == {"twin_a": "changed_q", "twin_b": "changed_q"}
    assert not skipped


def test_changed_group_skipped_only_when_alone_overflows_window():
    queries = ["changed_q", "t1", "t2", "t3", "p0"]
    co = {"changed_q": ["t1", "t2", "t3"]}
    sugg, _, skipped = plan_window(
        queries, {}, ["changed_q"], window=3, co_rotate=co, twinned=set())
    assert "changed_q" not in sugg
    assert skipped and skipped[0][0] == "changed_q"
    # the pool still fills the window
    assert "p0" in sugg


def test_co_rotate_transitive_closure_and_cycles():
    """main -> twin -> diagnostic chains are pulled whole, and the
    bidirectional twin<->diagnostic entries (round 8) must not loop."""
    queries = ["main", "twin", "diag", "other"]
    co = {"main": ["twin"], "twin": ["diag"], "diag": ["twin"]}  # cycle
    sugg, pulled, _ = plan_window(
        queries, {}, [], window=4, co_rotate=co, twinned={"diag"})
    assert sugg[:3] == ["main", "twin", "diag"]
    assert pulled == {"twin": "main", "diag": "main"}


def test_twinned_diagnostic_excluded_from_pool():
    queries = ["diag", "twin", "single"]
    sugg, _, _ = plan_window(
        queries, {}, [], window=3,
        co_rotate={"twin": ["diag"]}, twinned={"diag"})
    # diag enters only by being pulled, never on its own pool merit
    assert sugg.index("twin") < sugg.index("diag")


def test_changed_diagnostic_pulls_its_oracled_twin():
    """The round-8 review finding: a rows-only diagnostic arriving via
    --changed must bring the oracled twin that pins it — a lone rows-only
    driver row looks like evidence while proving nothing."""
    queries = ["diag", "twin", "p0", "p1"]
    co = {"twin": ["diag"], "diag": ["twin"]}
    sugg, pulled, _ = plan_window(
        queries, {}, ["diag"], window=3, co_rotate=co, twinned={"diag"})
    assert sugg[:2] == ["diag", "twin"]
    assert pulled == {"twin": "diag"}


def test_group_members_already_in_window_are_not_duplicated():
    queries = ["a", "b", "shared", "c"]
    co = {"a": ["shared"], "b": ["shared"]}
    sugg, _, _ = plan_window(queries, {}, [], window=4,
                             co_rotate=co, twinned=set())
    assert sugg.count("shared") == 1


def test_real_registry_contract_smoke():
    """The real CO_ROTATE map keeps its invariants: every diagnostic in
    TWINNED_ROWS_ONLY has a path INTO the window through some CO_ROTATE
    edge, and each of the round-8 bidirectional pairs closes both ways."""
    co, twinned = wp.CO_ROTATE, wp.TWINNED_ROWS_ONLY
    pulled_targets = {t for ts in co.values() for t in ts}
    for diag in twinned:
        assert diag in pulled_targets, f"{diag} unreachable by co-rotation"
        assert co.get(diag), f"{diag} cannot pull its twin when --changed"


def test_converging_co_rotate_edges_enter_target_once():
    """ADVICE r8: two same-level frontier members pulling the SAME target
    must not enter it twice — the duplicate inflated the group size and
    spuriously skipped the changed query at a window it actually fits."""
    queries = ["q", "a", "b", "x"]
    co = {"q": ["a", "b"], "a": ["x"], "b": ["x"]}
    sugg, pulled, skipped = plan_window(
        queries, {}, ["q"], window=4, co_rotate=co, twinned=set())
    assert sugg == ["q", "a", "b", "x"]  # x exactly once, group fits
    assert pulled == {"a": "q", "b": "q", "x": "q"}
    assert not skipped
