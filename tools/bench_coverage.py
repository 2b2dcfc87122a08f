#!/usr/bin/env python3
"""Assert a full-suite bench artifact covers the correctness query set.

Round-10 verdict: BENCH_local_r10.json predated the round's last two
queries, so the committed full bench silently lacked them. Like the
soak's derived PASS counts, coverage is now ASSERTED, not eyeballed:

    python3 tools/bench_coverage.py BENCH_local_r11.json CORRECTNESS_r10.json
    python3 tools/bench_coverage.py BENCH_local_r11.json /tmp/verify_out

The second argument is either a driver CORRECTNESS_r*.json (its keys
are the gated query names) or a graft.Verify output directory (one
parquet dir per query). Exit 1 with the missing keys when the bench's
key set does not cover the query set; `__build`/`__read` phase keys
are bench-only extras and never required.
"""
import json
import os
import sys


def query_set(path: str) -> set:
    if os.path.isdir(path):
        return {d for d in os.listdir(path)
                if os.path.isdir(os.path.join(path, d))}
    with open(path) as f:
        return set(json.load(f).keys())


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    bench_path, queries_path = sys.argv[1], sys.argv[2]
    with open(bench_path) as f:
        bench = json.load(f)
    bench_keys = set(bench["queries"].keys())
    expected = query_set(queries_path)
    missing = sorted(expected - bench_keys)
    failed = sorted(k for k in expected
                    if bench["queries"].get(k, -1.0) < 0)
    if missing:
        print(f"FAIL: bench {bench_path} lacks {len(missing)} gated "
              f"queries: {', '.join(missing)}")
        return 1
    if failed:
        print(f"FAIL: bench {bench_path} recorded errors (-1) for: "
              f"{', '.join(failed)}")
        return 1
    extras = len(bench_keys - expected)
    print(f"OK: bench covers all {len(expected)} gated queries "
          f"(+{extras} bench-only phase/extra keys)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
