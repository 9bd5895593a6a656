#!/usr/bin/env python
"""Registry-swap planner/verifier — the window-union math, mechanized.

The driver hash-checks the alphabetically-first 50 exported keys per round;
__spark_entry__ rotates a priority window so any two consecutive rounds
cover the full 100-query registry.  A registry swap (activate staged
queries, retire actives) preserves that ONLY if retirees come from the
STALE half — the queries whose last green row is two rounds old, i.e. the
half the upcoming window is about to re-check.  Retiring from the freshly-
checked half strands queries outside both windows (the r9 advisory made
exactly that mistake; COVERAGE.md §Round-10 delta records the
counterexample).

Usage:
  python tools/rotation_check.py                      # status: halves, staged, eligibility
  python tools/rotation_check.py --retire a,b --activate x,y   # simulate a swap
  python tools/rotation_check.py --assume-next-green --retire ... --activate ...

Simulation output states whether the post-swap window union holds:
  last-round greens ∪ next window == post-swap registry, with zero overlap.

Timing caveat: history is COMMITTED rounds only.  Planning the swap for
round N+2 while round N+1's CORRECTNESS has not landed yet (the usual
staging situation — e.g. choosing r11 retirees during r10) needs
``--assume-next-green``: it first pretends the CURRENT window goes green
in round latest+1, so "fresh" and "stale" mean what they will mean at
swap time.  Without it the tool would wrongly flag next round's correct
stale-half retirees as fresh.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def green_history() -> dict[str, int]:
    import __spark_entry__ as entry

    return entry._green_history(REPO)


def simulate(
    retire: list[str],
    activate: list[str],
    assume_next_green: bool = False,
    *,
    hist: dict[str, int] | None = None,
    active: set[str] | None = None,
    declared: set[str] | None = None,
) -> dict:
    """Simulate a swap.  By default runs against the LIVE registry and the
    committed CORRECTNESS history; tests inject synthetic ``hist`` /
    ``active`` / ``declared`` so assertions never go stale when the driver
    drops a new round's history file."""
    import __spark_entry__ as entry

    if active is None or declared is None:
        from vector_graph_rag_spark.queries import load_all

        if active is None:
            active = set(load_all())
        if declared is None:
            declared = set(load_all(include_retired=True))
    active, declared = set(active), set(declared)
    hist = dict(green_history() if hist is None else hist)
    if not hist:
        return {"problems": ["no committed CORRECTNESS_r*.json history — nothing to simulate against"]}
    latest = max(hist.values())
    if assume_next_green:
        # advance one round: the current window (pre-swap) greens in latest+1
        win_now = entry._select_window(sorted(active), hist)
        for n in win_now:
            hist[n] = latest + 1
        latest += 1
    fresh = {n for n in active if hist.get(n) == latest}

    problems = []
    if len(set(retire)) != len(retire):
        problems.append("duplicate names in --retire")
    if len(set(activate)) != len(activate):
        problems.append("duplicate names in --activate")
    retire, activate = sorted(set(retire)), sorted(set(activate))
    for r in retire:
        if r not in active:
            problems.append(f"retiree {r!r} is not an active query")
        elif r in fresh:
            problems.append(
                f"retiree {r!r} is in the FRESH (round-{latest}) half — "
                "retire from the stale half or the union breaks"
            )
    for a in activate:
        if a not in declared:
            problems.append(f"activation {a!r} is not a declared query")
        elif a in active:
            problems.append(f"activation {a!r} is already active")
    if len(retire) != len(activate):
        problems.append(
            f"swap is {len(activate)}-for-{len(retire)} — the registry must stay at "
            f"{len(active)}"
        )

    names = (active - set(retire)) | set(activate)
    win = entry._select_window(sorted(names), hist)
    fresh_in = fresh & names
    union_ok = (set(win) | fresh_in) == names and not (set(win) & fresh_in)
    return {
        "registry_size": len(names),
        "window_size": len(win),
        "union_ok": union_ok,
        "overlap": sorted(set(win) & fresh_in),
        "gap": sorted(names - (set(win) | fresh_in)),
        "new_in_window": sorted(set(activate) & set(win)),
        "problems": problems,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--retire", default="", help="comma-separated active queries to retire")
    ap.add_argument("--activate", default="", help="comma-separated staged queries to activate")
    ap.add_argument(
        "--assume-next-green", action="store_true",
        help="advance one round first (current window greens in latest+1) — "
             "use when planning the round AFTER the one currently running",
    )
    args = ap.parse_args()

    from vector_graph_rag_spark.queries import load_all

    active = set(load_all())
    declared = load_all(include_retired=True)
    hist = green_history()
    latest = max(hist.values()) if hist else 0
    fresh = sorted(n for n in active if hist.get(n) == latest)
    stale = sorted(n for n in active if n in hist and hist[n] < latest)
    never = sorted(n for n in active if n not in hist)
    # staged vs permanently retired: a retiree was rotated OUT and has
    # committed green history; a staged candidate was registered
    # retired=True BEFORE ever facing the driver, so it has none.
    staged = sorted(n for n in declared if n not in active and n not in hist)
    retired_for_good = sorted(
        n for n in declared if n not in active and n in hist
    )
    report = {
        "latest_green_round": latest,
        "fresh_half": len(fresh),
        "stale_half": len(stale),
        "never_green": never,
        "retirement_eligible (stale half)": stale,
        "staged_candidates": staged,
        "retired (NOT activation candidates)": retired_for_good,
    }
    if args.retire or args.activate:
        report["simulation"] = simulate(
            [r for r in args.retire.split(",") if r],
            [a for a in args.activate.split(",") if a],
            assume_next_green=args.assume_next_green,
        )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
