#!/usr/bin/env python3
"""Diff two ExplainAudit plan snapshots (node-type histograms per query).

Usage: python3 tools/plancheck.py <old.json> <new.json>

Exit 1 when any query present in BOTH snapshots changed its node-type
histogram — an extra Exchange, a SortMergeJoin replacing a
BroadcastHashJoin, a lost WindowGroupLimit. Added/removed queries are
reported but never fail (the inventory is allowed to grow); a changed
histogram is a plan-shape regression until a human re-baselines by
committing the new snapshot.
"""
import json, sys


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    for q in added:
        print(f"NEW  {q} (no baseline — re-baseline to pin it)")
    for q in removed:
        print(f"GONE {q}")
    changed = 0
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        if o == n:
            continue
        changed += 1
        diffs = []
        for k in sorted(set(o) | set(n)):
            ov, nv = o.get(k, 0), n.get(k, 0)
            if ov != nv:
                diffs.append(f"{k} {ov}->{nv}")
        print(f"CHANGED {q}: {', '.join(diffs)}")
    same = len(set(old) & set(new)) - changed
    print(f"\n{same} unchanged, {changed} changed, {len(added)} new, "
          f"{len(removed)} gone")
    return 1 if changed else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
