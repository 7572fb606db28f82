#!/usr/bin/env python3
"""Compare two Bench JSON lines (round-over-round): per-query deltas,
sorted by regression size. Usage: bench_compare.py OLD.json NEW.json"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] - old['value']:+.1f}s)")
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            rows.append((0.0, f"{name:30s}    NEW   {b:6.2f}s"))
        elif b is None:
            rows.append((0.0, f"{name:30s} REMOVED  ({a:6.2f}s)"))
        else:
            rows.append((b - a, f"{name:30s} {a:6.2f}s -> {b:6.2f}s ({b - a:+.2f}s)"))
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
