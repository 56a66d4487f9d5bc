#!/usr/bin/env python3
"""Dev-only replica of the driver's t2 correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
reads each <outDir>/<name> parquet dump, runs the matching oracle SQL
from <outDir>/oracle_sql.json in DuckDB over the same sf tables, and
compares row count, column names/types, and values (rows sorted, doubles
rounded to 4 decimals).

This script is tooling for the build loop only — the shipped Scala
library has no Python dependency.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    r.append("NaN")
                else:
                    r.append(round(v, 4))
            elif hasattr(v, "timestamp"):  # datetime -> epoch millis
                r.append(int(v.timestamp() * 1000))
            else:
                r.append(v)
        out.append(tuple(r))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            # The REAL driver gate canonicalizes in pandas, which crashes
            # on nested-typed columns (r17 emb_project: TypeError on the
            # array column). This replica used to stringify-and-pass them
            # — a dev-gate/real-gate divergence that shipped an
            # unverifiable output. REJECT the shape instead, both sides.
            nested = [(c, str(t)) for c, t in
                      zip(got_rel.columns, got_rel.types)
                      if any(k in str(t) for k in ("[]", "STRUCT", "MAP"))]
            if nested:
                print(f"FAIL {name}: nested-typed output column(s) {nested}"
                      " — the driver gate cannot canonicalize these;"
                      " explode or stringify before registering")
                failures += 1
                continue
            got_cols = sorted(got_rel.columns)
            got = canon([tuple(r[got_rel.columns.index(c)] for c in got_cols)
                         for r in got_rel.fetchall()])
            exp_rel = con.sql(sql)
            nested_exp = [(c, str(t)) for c, t in
                          zip(exp_rel.columns, exp_rel.types)
                          if any(k in str(t) for k in ("[]", "STRUCT", "MAP"))]
            if nested_exp:
                print(f"FAIL {name}: nested-typed ORACLE column(s)"
                      f" {nested_exp} — same pandas-canonicalization trap")
                failures += 1
                continue
            exp_cols = sorted(exp_rel.columns)
            exp = canon([tuple(r[exp_rel.columns.index(c)] for c in exp_cols)
                         for r in exp_rel.fetchall()])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failures += 1
        elif got != exp:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            diff = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            for g, e in diff:
                print(f"  got {g}\n  exp {e}")
            if len(got) != len(exp):
                only_got = set(got) - set(exp)
                only_exp = set(exp) - set(got)
                print(f"  only in spark: {list(only_got)[:3]}")
                print(f"  only in oracle: {list(only_exp)[:3]}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
