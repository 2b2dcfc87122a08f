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
key set does not cover the query set.

Split-pair coverage (round-11 verdict item 6: BENCH_local_r11b
silently lacked `ann_ivf_persisted__build/__read`) is asserted too:
for every lifecycleSplits key in the gated set, BOTH `__build` and
`__read` must be present and non-negative — the inventory of split
keys comes from the same source extraction check_inventory.py uses.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_inventory import extract_keys  # noqa: E402


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
    _, splits = extract_keys()
    pair_keys = {f"{n}__{p}" for n in splits if n in expected
                 for p in ("build", "read")}
    bad_pairs = sorted(k for k in pair_keys
                       if bench["queries"].get(k, -1.0) < 0)
    if bad_pairs:
        print(f"FAIL: bench {bench_path} lacks (or errored) split "
              f"pairs: {', '.join(bad_pairs)}")
        return 1
    extras = len(bench_keys - expected) - len(pair_keys)
    print(f"OK: bench covers all {len(expected)} gated queries, "
          f"{len(pair_keys)} split-pair keys "
          f"(+{extras} bench-only extra keys)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
