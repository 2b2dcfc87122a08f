#!/usr/bin/env python3
"""Compare two graft.Bench JSON outputs (or a BENCH_r{N}.json driver
artifact, whose per-query numbers live in a truncated 'tail' string).

Usage: python3 tools/bench_compare.py <old> <new> [threshold] [--rerun]

Prints per-query ratios sorted worst-first, the median ratio, and the
set of queries past the threshold (default 1.5x). Exit code 1 when any
query regresses past the threshold AND its absolute time exceeds 1s --
the same attention rule the round verdicts apply. Provenance (table
rows/bytes, doc chars) is compared first: when inputs differ, ratios
are data drift, not engine drift, and the tool says so.

Host-noise adjudication (rounds 6-8 each re-litigated flags that
dissolved under a clean rerun):
  - when the new run carries a `host` block (load average + CPU probe
    sampled at start and end), a contended host is called out BEFORE
    the flags are printed;
  - with `--rerun`, any flagged set is automatically re-timed in a
    FRESH sbt session (SPARK_GRAFT_BENCH_ONLY=<flags>) against the
    same SF dir, both numbers are reported, and only flags that
    SURVIVE the fresh run keep the nonzero exit code.
"""
import json
import os
import re
import subprocess
import sys


def load(path):
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if d is not None and "queries" in d:
        return d["queries"], d.get("tables"), d.get("doc_chars"), \
            d.get("host"), d.get("sf")
    if d is not None and "tail" in d:  # driver BENCH_r{N}.json artifact
        tail = d["tail"]
        qs = {m.group(1): float(m.group(2))
              for m in re.finditer(r'"([a-z0-9_]+)":([0-9.]+)', tail)}
        # the tail also carries provenance + host-marker fields whose
        # name:number shape matches the query regex — comparing those
        # as query timings flags the noise MARKERS as regressions
        for k in ("value", "rows", "bytes", "doc_chars", "load_start",
                  "load_end", "probe_ms_start", "probe_ms_end", "cores"):
            qs.pop(k, None)
        return qs, None, None, None, None
    # raw log: take the last {"metric":...} line
    line = [l for l in text.splitlines() if '"metric"' in l][-1]
    d = json.loads(re.search(r"\{.*\}", line).group(0))
    return d["queries"], d.get("tables"), d.get("doc_chars"), \
        d.get("host"), d.get("sf")


def host_verdict(host):
    """Human-readable contention call from the run's own markers."""
    if not host:
        return None
    msgs = []
    ps, pe = host.get("probe_ms_start"), host.get("probe_ms_end")
    if ps and pe and ps > 0 and max(pe / ps, ps / pe) > 1.5:
        msgs.append(f"CPU probe moved {ps:.0f}ms -> {pe:.0f}ms "
                    "(competing load during the run)")
    cores = host.get("cores") or 0
    for tag in ("load_start", "load_end"):
        la = host.get(tag, -1)
        if cores and la >= 0 and la > cores * 0.5:
            msgs.append(f"{tag}={la:.1f} on {cores} cores (contended host)")
    return "; ".join(msgs) if msgs else None


def fresh_rerun(flagged, sf_dir, repo):
    """Re-time exactly the flagged queries in a fresh sbt session."""
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_ONLY=",".join(sorted(flagged)),
               SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if '"metric"' in line:
            d = json.loads(re.search(r"\{.*\}", line).group(0))
            return d["queries"]
    raise RuntimeError(f"fresh bench run produced no metric line:\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    args = [a for a in sys.argv[1:] if a != "--rerun"]
    rerun = "--rerun" in sys.argv[1:]
    old_path, new_path = args[0], args[1]
    threshold = float(args[2]) if len(args) > 2 else 1.5
    q_old, t_old, c_old, _, _ = load(old_path)
    q_new, t_new, c_new, h_new, sf_new = load(new_path)
    if t_old and t_new and (t_old != t_new or c_old != c_new):
        print("PROVENANCE MISMATCH: inputs differ between runs — ratios "
              "below reflect data drift, not engine drift")
        for k in sorted(set(t_old) | set(t_new)):
            if t_old.get(k) != t_new.get(k):
                print(f"  {k}: {t_old.get(k)} -> {t_new.get(k)}")
        if c_old != c_new:
            print(f"  doc_chars: {c_old} -> {c_new}")
    noise = host_verdict(h_new)
    if noise:
        print(f"HOST NOISE MARKERS (new run): {noise}")
        print("  flags below are suspect; rerun them fresh "
              "(--rerun does this automatically)")
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
    if flagged and rerun:
        sf_dir = sf_new or os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        print(f"FRESH RERUN of {len(flagged)} flagged "
              f"queries at {sf_dir} ...")
        # __build/__read twins can't be selected directly; rerun their base
        base = sorted({k.split("__")[0] for k in flagged})
        q_fresh = fresh_rerun(base, sf_dir, repo)
        survived = []
        for k in flagged:
            f = q_fresh.get(k)
            if f is None or f < 0:
                # Bench emits -1.0 for a query that FAILED; a crashed or
                # missing fresh run proves nothing about the regression —
                # the flag stays (inconclusive), it is never "dissolved".
                print(f"  {k}: fresh run failed/missing "
                      f"-> INCONCLUSIVE (flag kept)")
                survived.append(k)
                continue
            r = f / q_old[k] if q_old.get(k) else float("inf")
            verdict = "CONFIRMED" if (r >= threshold and f > 1.0) \
                else "dissolved (host noise)"
            print(f"  {k}: old {q_old[k]:.2f}  driver {q_new[k]:.2f}  "
                  f"fresh {f:.2f}  ({r:.2f}x vs old)  -> {verdict}")
            if verdict == "CONFIRMED":
                survived.append(k)
        flagged = survived
        print(f"surviving flags after fresh rerun: {flagged or 'none'}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
