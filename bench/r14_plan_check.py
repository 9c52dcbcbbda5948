#!/usr/bin/env python
"""r14 sweep safety checker: parse plans/r14/*_after.txt and verify, for
every converted entry, that

  1. the plan carries no `rangepartitioning` exchange (the removed global
     sort), and
  2. every `Coalesce` node's single-task stage stops at a stage boundary
     (Exchange / BroadcastExchange build / TakeOrderedAndProject /
     LocalTableScan / in-memory relation) BEFORE reaching any
     corpus-scaled operator (parquet scan, Generate/explode, a Window
     that is not WindowGroupLimit, a streaming relation) — i.e. the
     coalesce(1) collapses only the bounded final-aggregate stage, never
     the data-sized work (helpers.ordered_small's contract).

Exit 1 with a report if any plan violates either rule.
"""

from __future__ import annotations

import glob
import os
import re
import sys

BOUNDARY = re.compile(
    r"^(Exchange|BroadcastExchange|TakeOrderedAndProject|LocalTableScan|"
    r"Scan ExistingRDD|InMemoryTableScan|ReusedExchange|BroadcastQueryStage|"
    r"ShuffleQueryStage)"
)
# operators that must NOT run inside a single coalesced task
HEAVY = re.compile(
    r"^(Scan parquet|BatchScan|FileScan|Generate|Expand|Window$|Window |"
    r"MicroBatchScan|BatchEvalPython|ArrowEvalPython|MapInPandas|"
    r"FlatMapGroupsInPandas|SortMergeJoin|ShuffledHashJoin)"
)
ALLOW = re.compile(r"^WindowGroupLimit")


def parse_tree(text: str):
    """Yield (depth, name) for the physical-plan tree of a formatted
    explain dump."""
    lines = text.splitlines()
    try:
        start = next(i for i, ln in enumerate(lines)
                     if ln.startswith("== Physical Plan =="))
    except StopIteration:
        return []
    nodes = []
    for ln in lines[start + 1:]:
        if not ln.strip():
            break
        # strip WholeStageCodegen star markers: "*(3) HashAggregate"
        m = re.match(r"^([: +\-]*)\*?\(?\d*\)?\s*(.*)$", ln)
        prefix, name = m.group(1), m.group(2)
        depth = len(prefix) // 3
        nodes.append((depth, name.strip()))
    return nodes


def check(path: str) -> list[str]:
    text = open(path).read()
    nodes = parse_tree(text)
    problems = []
    if re.search(r"rangepartitioning", text):
        problems.append("rangepartitioning still present")
    for i, (d, name) in enumerate(nodes):
        if not name.startswith("Coalesce"):
            continue
        # walk the subtree; prune below boundaries
        prune_depth = None
        for d2, n2 in nodes[i + 1:]:
            if d2 <= d:
                break
            if prune_depth is not None and d2 > prune_depth:
                continue
            prune_depth = None
            if BOUNDARY.match(n2):
                prune_depth = d2
                continue
            if ALLOW.match(n2):
                continue
            if HEAVY.match(n2):
                problems.append(
                    f"Coalesce stage reaches heavy operator: {n2!r}"
                )
    return problems


# Manually reviewed exceptions (r14): operators that sit INSIDE the
# coalesced stage but directly above an Exchange that provably carries a
# bounded relation, so the single task does dimension-sized work:
#  - q048: SMJ merge of the 12-row recursive month series with the
#    12-row per-month counts (both children behind Exchanges 7/26);
#  - q222: normalizing Window over the ~25-row (prev,next) transition
#    matrix behind Exchange 11;
#  - q171: statestore BatchScan — state is |event_types| rows by
#    construction (the aggregate's own state).
REVIEWED = {
    "q048_recursive_cte",
    "q222_event_transitions",
    "q171_state_store_introspection",
}


def main() -> None:
    pat = sys.argv[1] if len(sys.argv) > 1 else "plans/r14/*_after.txt"
    bad = 0
    for path in sorted(glob.glob(pat)):
        name = os.path.basename(path).rsplit("_", 1)[0]
        if name in REVIEWED:
            continue
        probs = check(path)
        if probs:
            bad += 1
            print(f"{os.path.basename(path)}:")
            for p in probs:
                print(f"  - {p}")
    n = len(glob.glob(pat))
    print(f"checked {n} plans, {bad} with findings")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
