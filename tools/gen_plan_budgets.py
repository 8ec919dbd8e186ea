"""Generate tools/plan_budgets.json: per-query physical-plan budgets
(shuffle-exchange count, broadcast-exchange count) for every registry
query at the test scale factor.

The budget is a regression CEILING, not a target:
``tests/test_plans.py::test_plan_exchange_budgets`` fails any query
whose plan now contains MORE exchanges than its recorded budget — the
structural form of "a refactor quietly added a shuffle". Queries whose
plans improve should have their budgets re-tightened by re-running this
tool (review the diff: every decrease is a win to bank, every increase
must be justified in the commit message).

By default the tool MERGES with the committed file taking the MAX per
counter — a ceiling must cover every legitimate plan variant (the
pair-cache consumers plan one extra exchange when the shared table is
cold vs warm, and generation order decides which variant this run
sees), so a plain regenerate would flap those budgets down and fail
the next cold run. Pass ``--tighten`` to drop the ratchet and record
exactly what this run observed (review every decrease as a win to
bank, every increase as a regression to justify).

Usage: python tools/gen_plan_budgets.py [--tighten] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tools", "plan_budgets.json")


def plan_counts(plan: str) -> dict:
    shuffle = sum(1 for ln in plan.splitlines()
                  if "Exchange hashpartitioning" in ln
                  or "Exchange rangepartitioning" in ln
                  or "Exchange SinglePartition" in ln)
    bcast = plan.count("BroadcastExchange")
    return {"shuffles": shuffle, "broadcasts": bcast}


def main():
    args = [a for a in sys.argv[1:]]
    tighten = "--tighten" in args
    args = [a for a in args if a != "--tighten"]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    from photon_spark.session import get_spark
    from photon_spark import queries as q

    spark = get_spark("plan-budgets", master="local[4]",
                      shuffle_partitions=4)
    budgets = {}
    for name, fn in q.QUERIES.items():
        try:
            plan = (fn(spark, sf_dir)._jdf.queryExecution()
                    .executedPlan().toString())
        except Exception as exc:
            print(f"SKIP {name}: {exc}", file=sys.stderr)
            continue
        budgets[name] = plan_counts(plan)
    if not tighten and os.path.exists(OUT):
        # ratchet: a ceiling covers every plan variant ever observed
        # (cold vs warm pair cache); only --tighten lowers it
        with open(OUT) as f:
            prev = json.load(f)
        for name, b in budgets.items():
            for k, v in prev.get(name, {}).items():
                if b.get(k, 0) < v:
                    b[k] = v
    with open(OUT, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
        f.write("\n")
    tot_s = sum(b["shuffles"] for b in budgets.values())
    tot_b = sum(b["broadcasts"] for b in budgets.values())
    print(f"wrote {len(budgets)} budgets to {OUT} "
          f"(total shuffles={tot_s}, broadcasts={tot_b})")


if __name__ == "__main__":
    main()
