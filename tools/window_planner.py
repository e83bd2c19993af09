"""Rotation planner for the driver's ~50-row correctness window.

The driver hash-checks the first ~50 registry queries each round
(`_SWEEP_FIRST` controls the order), so registration order decides which
queries get fresh driver evidence. The repo's discipline: no query's
freshest driver row may be older than two rounds, and queries whose
operators changed in the current round re-verify immediately.

This tool reads every CORRECTNESS_r*.json, computes each query's freshest
driver evidence (round + class: hash-green vs rows-only), and prints the
staleness table plus a suggested next window: changed queries (pass names
via --changed) first, then never-run, then oldest-first. Rows-only
diagnostics whose oracled twins are fresher are listed separately — a
rows-only re-run spends a slot without adding evidence, so they rotate
only when their twins do.

Usage:
    python tools/window_planner.py [--round N] [--changed q1,q2,...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_ecommerce_data_spark.plans.queries import QUERIES, _SWEEP_FIRST  # noqa: E402

WINDOW = 50

# rows-only diagnostics pinned by an oracled twin: re-running them adds no
# hash evidence, so they inherit their twin's urgency instead of their own
TWINNED_ROWS_ONLY = {
    "similarity_topk_lsh": "similarity_lsh_recall",
    "similarity_topk_ivf": "similarity_ivf_recall",
    "dedup_minhash_bucket_stats": "dedup_minhash_recall",
    # VERDICT r10 ask #3: the approx-percentile sketch is rows-only; its
    # exact oracled twin carries the evidence and pulls it along
    "value_percentiles_approx": "value_percentiles",
}

# Co-rotation contract (VERDICT r6 residual #1): a rows-only production path
# must never get fresh driver evidence WITHOUT the oracled twins that pin
# it — a lone rows-only row would look like evidence while proving nothing.
# Any suggested window containing a key below must also contain its twins;
# the planner pulls them in ahead of lower-priority singles.
CO_ROTATE = {
    "embedding_near_dup": [
        "embedding_near_dup_baseline",
        "embedding_near_dup_recall",
        "embedding_star_cap_floor",
    ],
    "dedup_minhash_docs": ["dedup_minhash_recall", "dedup_star_cap_floor"],
    "dedup_simhash_docs": ["dedup_simhash_complete"],
    "dedup_cross_corpus": [
        "dedup_cross_corpus_recall",
        "dedup_cross_corpus_baseline",
    ],
    "dedup_clusters": ["dedup_clusters_baseline"],
    "daily_users_hll": ["hll_error_floor"],
    "value_percentiles_approx": ["gk_percentile_floor", "value_percentiles"],
    "embedding_pca_variance": ["embedding_gram_baseline"],
    # reverse direction (VERDICT r7 residual #7): when an oracled twin
    # rotates, its rows-only diagnostic rides along — otherwise the
    # diagnostics (excluded from the pool via TWINNED_ROWS_ONLY) never get
    # a fresh driver row at all
    "similarity_lsh_recall": ["similarity_topk_lsh"],
    "similarity_ivf_recall": ["similarity_topk_ivf"],
    "dedup_minhash_recall": ["dedup_minhash_bucket_stats"],
    # ...and diagnostic -> twin, so a rows-only diagnostic arriving via
    # --changed (its operator changed this round) can never enter the
    # window WITHOUT the oracled twin that pins it — otherwise the
    # changed-queries pass would bypass the co-rotation contract and the
    # driver would record a lone rows-only row that looks like evidence
    # while proving nothing. The closure below tolerates the cycles.
    "similarity_topk_lsh": ["similarity_lsh_recall"],
    "similarity_topk_ivf": ["similarity_ivf_recall"],
    "dedup_minhash_bucket_stats": ["dedup_minhash_recall"],
    # VERDICT r10 ask #3 (the one twin-rule soft spot in r10): the exact
    # percentile query and its rows-only sketch rotate together, both ways
    "value_percentiles": ["value_percentiles_approx", "gk_percentile_floor"],
}


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def freshness() -> dict[str, tuple[int, str]]:
    """Freshest driver evidence per query. Files resolve against the repo
    root (not the cwd) and are processed in PARSED round order — a
    lexicographic sort would let r7 follow r10+ (or r99 follow r100) and
    stale rows overwrite fresh ones."""
    fresh: dict[str, tuple[int, str]] = {}
    paths = glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))
    if not paths:
        sys.exit(f"no CORRECTNESS_r*.json under {REPO_ROOT} — nothing to plan from")

    def rnd_of(p: str) -> int:
        return int(re.search(r"r(\d+)", os.path.basename(p)).group(1))

    for path in sorted(paths, key=rnd_of):
        rnd = rnd_of(path)
        for q, v in json.load(open(path)).items():
            if v.get("hash_match"):
                fresh[q] = (rnd, "green")
            elif v.get("err") == "no_oracle" and v.get("spark_rows") is not None:
                fresh[q] = (rnd, "rows_only")
    return fresh


def plan_window(
    queries: list[str],
    ages: dict[str, int],
    changed: list[str],
    *,
    window: int = WINDOW,
    co_rotate: dict[str, list[str]] | None = None,
    twinned: set[str] | frozenset[str] | None = None,
) -> tuple[list[str], dict[str, str], list[tuple[str, list[str]]]]:
    """Pure suggestion logic (unit-tested in tests/test_window_planner.py):
    returns (suggestion, pulled{twin: puller}, skipped_groups).

    ``ages[q]`` is rounds-since-freshest-evidence (missing = never-run,
    treated as infinitely stale). Invariants encoded here:
    - changed-query groups are placed in a FIRST pass against the whole
      window (driver ADVICE r7) — a changed group is only skipped when
      changed groups ALONE overflow the window, never because
      lower-priority pool singles got there first;
    - CO_ROTATE groups enter whole or not at all, expanded to their
      TRANSITIVE closure (a pulled twin may itself pull a diagnostic;
      cycles from the bidirectional twin<->diagnostic entries are fine);
    - twinned rows-only diagnostics never enter from the pool (their
      twins carry the evidence) — but a changed diagnostic enters WITH
      its twin via the closure.
    """
    co_rotate = CO_ROTATE if co_rotate is None else co_rotate
    twinned = set(TWINNED_ROWS_ONLY) if twinned is None else set(twinned)

    def age(q: str) -> int:
        return ages.get(q, 10**6)

    pool = [q for q in queries if q not in twinned and q not in changed]
    pool.sort(key=lambda q: (-age(q), q))
    suggestion: list[str] = []
    pulled: dict[str, str] = {}
    skipped_groups: list[tuple[str, list[str]]] = []
    for phase, is_changed_phase in ((changed, True), (pool, False)):
        for q in phase:
            if q in suggestion:
                continue
            if len(suggestion) >= window and not is_changed_phase:
                break  # full; what's left is covered by the stale_after warning
            group, seen = [q], {q}
            frontier = [q]
            while frontier:
                # dedupe WITHIN the level too: two frontier members pulling
                # the same target must not enter it twice (converging edges
                # would inflate the group size and spuriously skip it)
                nxt: list[str] = []
                for f in frontier:
                    for t in co_rotate.get(f, []):
                        if t not in seen:
                            seen.add(t)
                            nxt.append(t)
                group.extend(t for t in nxt if t not in suggestion)
                frontier = nxt
            if len(suggestion) + len(group) > window:
                skipped_groups.append((q, group))  # changed skips warn loudest below
                continue
            suggestion.extend(group)
            for t in group[1:]:
                pulled[t] = q
    return suggestion, pulled, skipped_groups


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="current round (default: max seen + 1)")
    ap.add_argument("--changed", default="",
                    help="comma-separated queries whose operators changed")
    ap.add_argument("--include", default="",
                    help="comma-separated queries to force into the window "
                         "regardless of age (judge-requested co-rotations); "
                         "placed with the changed phase so pool singles "
                         "cannot displace them, CO_ROTATE closure applies")
    args = ap.parse_args()

    fresh = freshness()
    max_seen = max((r for r, _ in fresh.values()), default=0)
    cur = args.round if args.round is not None else max_seen + 1
    if cur < max_seen:
        # ages would go negative and -age(q) would rank the FRESHEST
        # queries first — a silently inverted rotation
        ap.error(f"--round {cur} predates existing evidence (files up to "
                 f"round {max_seen}); pass >= {max_seen}")
    changed = [q for q in args.changed.split(",") if q.strip()]
    truly_changed = set(changed)  # --include merges below, labels differ
    changed += [q for q in args.include.split(",")
                if q.strip() and q not in changed]
    unknown = sorted(set(changed) - set(QUERIES))
    if unknown:
        ap.error(f"--changed/--include names not in registry: {unknown}")

    def age(q: str) -> int:
        return cur - fresh[q][0] if q in fresh else 10**6

    rows = sorted(QUERIES, key=lambda q: (-age(q), q))
    print(f"round {cur}; registry {len(QUERIES)}; window {WINDOW}")
    print(f"{'query':36s} {'last':>5s} {'age':>4s} class")
    for q in rows:
        r, cls = fresh.get(q, (0, "never"))
        mark = " TWIN" if q in TWINNED_ROWS_ONLY else ""
        print(f"{q:36s} {r or '-':>5} {age(q) if q in fresh else '-':>4} {cls}{mark}")

    suggestion, pulled, skipped_groups = plan_window(
        list(QUERIES), {q: cur - fresh[q][0] for q in fresh}, changed
    )
    stale_after = [q for q in QUERIES
                   if q not in suggestion and q not in TWINNED_ROWS_ONLY
                   and age(q) >= 2]
    print("\nsuggested window (changed -> never-run -> oldest; co-rotated "
          "twins marked):")
    for q in suggestion:
        tag = f"  (co-rotated with {pulled[q]})" if q in pulled else ""
        print(f"  {q}{tag}")
    # a group that didn't fit was SKIPPED, not deferred-with-warning-by-age:
    # a just-changed query has age 0-1 so stale_after would never flag it —
    # surface every skip, loudest for changed queries (the 're-verify
    # immediately' rule is violated if one is dropped silently)
    for q, group in skipped_groups:
        # --include entries ride the changed phase for placement but are
        # NOT changed code — the loudest warning class stays reserved for
        # the re-verify-immediately rule it exists to enforce
        sev = ("changed query NOT re-verified" if q in truly_changed
               else "included query deferred" if q in changed
               else "group deferred")
        print(f"\nWARNING ({sev}): {q} skipped — CO_ROTATE group {group} "
              f"does not fit the remaining window; shrink lower-priority "
              f"entries or rotate it first next round")
    if stale_after:
        print(f"\nWARNING: {len(stale_after)} queries remain >=2 rounds stale "
              f"after this window: {stale_after}")
    # denominator is the actual suggestion size: tail groups that did not
    # fit leave slots empty, and /WINDOW would overstate the edits needed
    print(f"\ncurrent _SWEEP_FIRST overlap: "
          f"{len(set(suggestion) & set(_SWEEP_FIRST))}/{len(suggestion)}")


if __name__ == "__main__":
    main()
