#!/usr/bin/env python3
"""Dev-only replica of the judge's per-query bench gate.

Parses the frozen per-query numbers out of BASELINE.md and a Bench JSON
(target/bench_out.json by default), prints every baselined query's ratio,
and exits non-zero if any exceeds the 2x bar.

Usage: check_gate.py [bench_out.json]
"""
import json
import re
import sys

BASELINE_MD = "BASELINE.md"
GATE = 2.0


def baseline_numbers(path=BASELINE_MD):
    """The frozen table rows look like `| q1_wordcount | 0.351 | ... |`
    with two query/sec pairs per line. Parsing is anchored to the
    'Operative baseline for BENCH' section so a name/number-shaped row in
    any OTHER table can't become a phantom baselined query, and 0-valued
    cells are skipped (a 0 baseline would make every ratio a divide-by-
    zero breach)."""
    out = {}
    in_section = False
    for line in open(path):
        if line.startswith("## "):
            in_section = line.startswith("## Operative baseline for BENCH")
            continue
        if not in_section:
            continue
        for name, sec in re.findall(
                r"\|\s*([a-z][a-z0-9_]+)\s*\|\s*([0-9]+\.[0-9]+)\s*(?=\|)",
                line):
            if float(sec) > 0:
                out[name] = float(sec)
    return out


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench_out.json"
    bench = json.load(open(bench_path))
    # Accept both the Bench output shape ({"queries": ...}) and the
    # driver's BENCH_r{N}.json wrapper ({"parsed": {"queries": ...}}).
    queries = (bench.get("queries")
               or (bench.get("parsed") or {}).get("queries"))
    if queries is None:
        sys.exit(f"no queries map found in {bench_path}")
    base = baseline_numbers()
    breaches = []
    print(f"{'query':28} {'bench':>8} {'base':>8} {'ratio':>7}")
    for name, b in sorted(base.items()):
        if name not in queries:
            print(f"{name:28} {'MISSING':>8}")
            breaches.append(name)
            continue
        got = queries[name]
        ratio = got / b
        flag = " <-- BREACH" if ratio > GATE else ""
        print(f"{name:28} {got:8.3f} {b:8.3f} {ratio:6.2f}x{flag}")
        if ratio > GATE:
            breaches.append(name)
    print(f"\n{len(base) - len(breaches)}/{len(base)} within {GATE}x"
          + (f"; breaches: {', '.join(breaches)}" if breaches else ""))
    sys.exit(1 if breaches else 0)


if __name__ == "__main__":
    main()
