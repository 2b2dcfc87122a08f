#!/usr/bin/env python3
"""Compare two graft.Bench JSON outputs (or a BENCH_r{N}.json driver
artifact, whose per-query numbers live in a truncated 'tail' string).

Usage: python3 tools/bench_compare.py <old> <new> [threshold]

Prints per-query ratios sorted worst-first, the median ratio, and the
set of queries past the threshold (default 1.5x). Exit code 1 when any
query regresses past the threshold AND its absolute time exceeds 1s —
the same attention rule the round verdicts apply. Provenance (table
rows/bytes, doc chars) is compared first: when inputs differ, ratios
are data drift, not engine drift, and the tool says so.
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if d is not None and "queries" in d:
        return d["queries"], d.get("tables"), d.get("doc_chars")
    if d is not None and "tail" in d:  # driver BENCH_r{N}.json artifact
        tail = d["tail"]
        qs = {m.group(1): float(m.group(2))
              for m in re.finditer(r'"([a-z0-9_]+)":([0-9.]+)', tail)}
        qs.pop("value", None)
        return qs, None, None
    # raw log: take the last {"metric":...} line
    line = [l for l in text.splitlines() if '"metric"' in l][-1]
    d = json.loads(re.search(r"\{.*\}", line).group(0))
    return d["queries"], d.get("tables"), d.get("doc_chars")


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    q_old, t_old, c_old = load(old_path)
    q_new, t_new, c_new = load(new_path)
    if t_old and t_new and (t_old != t_new or c_old != c_new):
        print("PROVENANCE MISMATCH: inputs differ between runs — ratios "
              "below reflect data drift, not engine drift")
        for k in sorted(set(t_old) | set(t_new)):
            if t_old.get(k) != t_new.get(k):
                print(f"  {k}: {t_old.get(k)} -> {t_new.get(k)}")
        if c_old != c_new:
            print(f"  doc_chars: {c_old} -> {c_new}")
    common = sorted(set(q_old) & set(q_new))
    only_new = sorted(set(q_new) - set(q_old))
    ratios = sorted(((q_new[k] / q_old[k], k) for k in common
                     if q_old[k] > 0), reverse=True)
    med = sorted(r for r, _ in ratios)[len(ratios) // 2] if ratios else 0
    print(f"{len(common)} comparable queries; median ratio {med:.3f}; "
          f"{len(only_new)} new-only; "
          f"sum {sum(q_old[k] for k in common):.1f}s -> "
          f"{sum(q_new[k] for k in common):.1f}s")
    flagged = []
    for r, k in ratios[:20]:
        mark = ""
        if r >= threshold and q_new[k] > 1.0:
            mark = "  <-- REGRESSION"
            flagged.append(k)
        print(f"  {k}: {q_old[k]:.2f} -> {q_new[k]:.2f}  ({r:.2f}x){mark}")
    if only_new:
        heavy = sorted(only_new, key=lambda k: -q_new[k])[:10]
        print("new-only (heaviest):")
        for k in heavy:
            print(f"  {k}: {q_new[k]:.2f}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
