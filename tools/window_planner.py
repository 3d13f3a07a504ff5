#!/usr/bin/env python
"""Plan the NEXT round's 50-entry driver window mechanically.

The external correctness driver evaluates exactly the FIRST 50 registry
entries per round, so the window composition is a scheduling problem
with three hard inputs (in priority order):

  1. the standing next-round QUEUE (post-seal registrations and
     re-certs — never displaced);
  2. any entry whose implementation fingerprint drifted from
     FINGERPRINTS.json (or is new) and is not yet scheduled — the
     re-certification rule outranks staleness backfill (the r8 window's
     explicit trade);
  3. oldest-stale backfill to 50, ordered by (latest driver round asc,
     registry order) — the staleness SLO (no unscheduled entry's latest
     row older than CURRENT_ROUND − 6) consumes whatever capacity
     remains.

sim_ann_ivf is excluded by design (rows-only, externally gated via
ann_ivf_recall_gate).

This tool exists because the same process risk surfaced two rounds
running (r7, r8 verdicts: "the rotation is staged but not promoted"):
the composition was hand-derived each round. Run it at round open,
paste the emitted list into _ROUND{N}_FRONT, and the contract tests
(tests/test_rotation_contract.py) re-verify every invariant.

Usage: python tools/window_planner.py        # print the plan + debt stats
"""

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WINDOW = 50
SLO_ROUNDS = 6
EXCLUDED = {"sim_ann_ivf"}


def latest_driver_round() -> dict:
    latest = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"_r0*(\d+)\.json$", f).group(1))
        with open(f) as fh:
            for k in json.load(fh):
                latest[k] = max(latest.get(k, 0), r)
    return latest


def plan(entrymod=None) -> dict:
    if entrymod is None:
        import __spark_entry__ as entrymod  # noqa: PLC0415

    from tools.impl_fingerprint import current_fingerprints, load_snapshot

    # resolve the CURRENT sealed front/queue by round number (the
    # contract tests' convention)
    fronts = sorted(
        (int(m.group(1)), a)
        for a in dir(entrymod)
        for m in [re.fullmatch(r"_ROUND(\d+)_FRONT", a)]
        if m
    )
    queues = sorted(
        (int(m.group(1)), a)
        for a in dir(entrymod)
        for m in [re.fullmatch(r"_ROUND(\d+)_QUEUE", a)]
        if m
    )
    cur_round = fronts[-1][0]
    queue = list(getattr(entrymod, queues[-1][1]))
    registry = list(entrymod.queries())
    latest = latest_driver_round()
    # entries in the CURRENT front are about to get rows for cur_round
    for n in getattr(entrymod, fronts[-1][1]):
        latest[n] = max(latest.get(n, 0), cur_round)

    snap, cur = load_snapshot(), current_fingerprints()
    drifted = [
        n for n in registry
        if (n not in snap or snap[n] != cur[n])
        and n not in queue
        and n not in EXCLUDED
        # drifted entries inside the current front get cur_round rows at
        # the current fingerprint — no extra re-cert needed
        and n not in set(getattr(entrymod, fronts[-1][1]))
    ]

    head = queue + drifted
    stale_pool = sorted(
        (n for n in registry
         if n not in head and n not in EXCLUDED),
        key=lambda n: (latest.get(n, 0), registry.index(n)),
    )
    backfill = stale_pool[: max(0, WINDOW - len(head))]
    front = (head + backfill)[:WINDOW]

    next_round = cur_round + 1
    floor = next_round - SLO_ROUNDS
    must = [
        n for n in registry
        if n not in EXCLUDED and latest.get(n, 0) < floor
    ]
    unmet = [n for n in must if n not in front]
    from collections import Counter

    return {
        "current_round": cur_round,
        "next_round": next_round,
        "queue": queue,
        "drifted_unscheduled": drifted,
        "front": front,
        "overflow": head[WINDOW:],
        "slo_floor": floor,
        "slo_unmet": unmet,
        "staleness_histogram": dict(
            sorted(Counter(latest.get(n, 0) for n in registry).items())
        ),
        "never_checked": [n for n in registry if n not in latest],
    }


def main() -> int:
    p = plan()
    print(f"# window plan for round {p['next_round']} "
          f"(current sealed round: {p['current_round']})")
    print(f"queue carried: {len(p['queue'])}; "
          f"drifted/new outside queue: {len(p['drifted_unscheduled'])}; "
          f"backfill: {len(p['front']) - len(p['queue']) - len(p['drifted_unscheduled'])}")
    print(f"staleness histogram (latest driver round -> count, assuming "
          f"the current front lands r{p['current_round']} rows): "
          f"{p['staleness_histogram']}")
    if p["overflow"]:
        print(f"!! queue+re-certs exceed the {WINDOW}-slot window; "
              f"overflow (schedule round after next): {p['overflow']}")
    if p["slo_unmet"]:
        print(f"!! staleness SLO unsatisfiable next round — these entries "
              f"have rows older than r{p['slo_floor']} and no slot: "
              f"{p['slo_unmet']}")
    print(f"\n_ROUND{p['next_round']}_FRONT: list[str] = [")
    for n in p["front"]:
        print(f'    "{n}",')
    print("]")
    return 1 if (p["overflow"] or p["slo_unmet"]) else 0


if __name__ == "__main__":
    raise SystemExit(main())
