#!/usr/bin/env python3
"""Warm DuckDB timing of the oracle manifest — the cross-engine half of
the suite ratio the bench notes quote. Runs every oracle SQL from a
Verify dump against the given sf dir (32 threads, fetchall — the same
protocol the round judge uses), min-of-2 warm runs per query, prints
per-query seconds and the total.

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> [reps]
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir, reps=2):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    total = 0.0
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(reps + 1):  # +1 cold run, excluded by min
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                print(f"ERR {name}: {e}")
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            times[name] = best
            total += best
    for name, sec in sorted(times.items(), key=lambda x: -x[1])[:15]:
        print(f"{name:32s} {sec:7.3f}")
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "n_queries": len(times), "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
