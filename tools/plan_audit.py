#!/usr/bin/env python
"""Regenerate the PLANS.md physical-plan audit table.

For each audited registry query: run it at sf0.1 (forced through the noop
sink so AQE finalizes), then count from the FINAL executed plan:
  - pushed filters   (entries inside non-empty PushedFilters lists)
  - broadcast joins  (BroadcastHashJoin; BroadcastNestedLoopJoin counted
                      separately — config-sized / scalar broadcasts)
  - sort-merge joins (SortMergeJoin)
  - exchanges        (shuffle Exchange only; BroadcastExchange excluded)

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Prints a markdown table row per query; with no query args, audits the
same list PLANS.md currently shows (parsed from the file).
"""

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import importlib


def audited_names() -> list[str]:
    rows = []
    with open(os.path.join(ROOT, "PLANS.md")) as f:
        in_table = False
        for line in f:
            if line.startswith("| query |"):
                in_table = True
                continue
            if in_table:
                m = re.match(r"\| (\w+) \|", line)
                if m:
                    rows.append(m.group(1))
                elif not line.startswith("|---"):
                    break
    return rows


def plan_metrics(plan: str) -> dict:
    pushed = 0
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            # count top-level commas only (filters like In(a, [x,y]) nest)
            depth, n = 0, 1
            for ch in body:
                if ch in "([":
                    depth += 1
                elif ch in ")]":
                    depth -= 1
                elif ch == "," and depth == 0:
                    n += 1
            pushed += n
    return {
        "pushed": pushed,
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "exch": len(
            re.findall(
                r"\bExchange (hashpartitioning|rangepartitioning|"
                r"RoundRobinPartitioning|SinglePartition)",
                plan,
            )
        ),
    }


def main() -> int:
    args = sys.argv[1:]
    sf = args.pop(0) if args and os.path.sep in args[0] else "/root/testdata/sf0.1"
    from etl_dashboard_project_1_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    entrymod = importlib.import_module("__spark_entry__")
    q = entrymod.queries()
    names = args or audited_names()
    print("| query | pushed filters | broadcast joins | sort-merge | exchanges |")
    print("|---|---|---|---|---|")
    for name in names:
        try:
            df = q[name](spark, sf)
            # collect(), NOT a noop write: the write executes a CLONED
            # QueryExecution, leaving df's own plan isFinalPlan=false —
            # only collect() finalizes the plan object we can inspect.
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=false" not in plan, "plan not finalized"
            # an adaptive plan prints BOTH '== Final Plan ==' and
            # '== Initial Plan ==' sections — count only the final one
            plan = plan.split("== Initial Plan ==")[0]
            m = plan_metrics(plan)
            bj = str(m["bhj"]) + (f" (+{m['bnlj']} nested-loop)" if m["bnlj"] else "")
            pushed = str(m["pushed"]) if m["pushed"] else "—"
            print(f"| {name} | {pushed} | {bj} | {m['smj']} | {m['exch']} |")
        except Exception as exc:  # keep auditing the rest
            print(f"| {name} | ERR {type(exc).__name__} | | | |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
