#!/usr/bin/env python3
"""Dev-only replica of the driver's t2 correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
reads each <outDir>/<name> parquet dump, runs the matching oracle SQL
from <outDir>/oracle_sql.json in DuckDB over the same sf tables, and
compares row count, column names/types, and values (rows sorted, doubles
rounded to 4 decimals, timestamps at integer epoch MICROS — never
lossier than the driver's pandas canonicalization).

This script is tooling for the build loop only — the shipped Scala
library has no Python dependency.
"""
import datetime
import json
import math
import sys

import duckdb

# Epoch anchors for integer timestamp canonicalization (no float math:
# `v.timestamp() * 1000` loses sub-milli precision through the double,
# which is how the r18/r19 fmgws micros divergence hid from this gate).
_EPOCH_NAIVE = datetime.datetime(1970, 1, 1)
_EPOCH_UTC = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
_MICRO = datetime.timedelta(microseconds=1)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Atomic-type ALLOWLIST (fail closed — VERDICT r18 ask #5): the real
# driver gate canonicalizes in pandas, which is only known-safe for the
# scalar types the fixtures actually produce. The old check rejected a
# nested-type DENYLIST ("[]"/STRUCT/MAP), which would wave through an
# exotic future type (INTERVAL, UUID, BIT, ENUM, UNION…) whose pandas
# behavior nobody has verified. Anything not named here is rejected.
ATOMIC_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                "FLOAT", "DOUBLE", "VARCHAR", "DATE", "BOOLEAN"}
ATOMIC_PREFIXES = ("DECIMAL(", "TIMESTAMP")  # parameterized / tz variants


def is_atomic(t):
    t = str(t).upper()
    return t in ATOMIC_TYPES or any(t.startswith(p) for p in ATOMIC_PREFIXES)


def non_atomic_cols(rel):
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if not is_atomic(t)]


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
            elif hasattr(v, "timestamp"):  # datetime -> epoch MICROS
                # Integer arithmetic ONLY: timedelta floor-division is
                # exact at micros (datetime's full resolution), whereas
                # the old `int(v.timestamp() * 1000)` truncated to epoch
                # millis — strictly lossier than the driver's pandas
                # canonicalization, which is how stream_sessions_fmgws
                # greened here while red at the driver for two rounds.
                epoch = _EPOCH_UTC if v.tzinfo is not None else _EPOCH_NAIVE
                r.append((v - epoch) // _MICRO)
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
            # array column) and is unverified for exotic scalars. REJECT
            # anything off the atomic allowlist, both sides (fail closed).
            bad = non_atomic_cols(got_rel)
            if bad:
                print(f"FAIL {name}: non-atomic output column(s) {bad}"
                      " — the driver gate cannot canonicalize these;"
                      " cast to an ATOMIC_TYPES member before registering")
                failures += 1
                continue
            got_cols = sorted(got_rel.columns)
            got = canon([tuple(r[got_rel.columns.index(c)] for c in got_cols)
                         for r in got_rel.fetchall()])
            exp_rel = con.sql(sql)
            bad_exp = non_atomic_cols(exp_rel)
            if bad_exp:
                print(f"FAIL {name}: non-atomic ORACLE column(s)"
                      f" {bad_exp} — same pandas-canonicalization trap")
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


def selftest():
    """Pins the allowlist's fail-closed behavior (invoked by the scala
    OracleGateSpec): every exotic type a DuckDB query could emit must be
    rejected; every type the fixtures actually produce must pass."""
    con = duckdb.connect()
    exotic = {
        "interval": "SELECT INTERVAL 1 DAY AS c",
        "uuid": "SELECT gen_random_uuid() AS c",
        "bit": "SELECT '101'::BIT AS c",
        "list": "SELECT [1, 2] AS c",
        "struct": "SELECT {'a': 1} AS c",
        "map": "SELECT map([1], [2]) AS c",
        "enum": "SELECT 'x'::ENUM('x', 'y') AS c",
        "blob": "SELECT '\\x00'::BLOB AS c",
        "time": "SELECT TIME '12:00:00' AS c",
    }
    atomic = ("SELECT 1::TINYINT a, 1::SMALLINT b, 1::INTEGER c,"
              " 1::BIGINT d, 1::HUGEINT e, 1.0::FLOAT f, 1.0::DOUBLE g,"
              " 'x'::VARCHAR h, DATE '2026-01-01' i, true j,"
              " 1.5::DECIMAL(10,2) k, TIMESTAMP '2026-01-01 00:00:00' l")
    bad = 0
    for name, sql in exotic.items():
        rej = non_atomic_cols(con.sql(sql))
        if not rej:
            print(f"SELFTEST FAIL: exotic type '{name}' was NOT rejected")
            bad += 1
    passed = non_atomic_cols(con.sql(atomic))
    if passed:
        print(f"SELFTEST FAIL: atomic columns rejected: {passed}")
        bad += 1
    # Planted sub-millisecond regression (VERDICT r19 ask #2): two
    # timestamps that differ ONLY at the microsecond must canonicalize
    # to different values. Under the old epoch-millis canon() both
    # collapsed to …729000 and this gate waved fmgws through twice.
    t_trunc = datetime.datetime(2026, 1, 1, 0, 0, 4, 729000)
    t_full = datetime.datetime(2026, 1, 1, 0, 0, 4, 729045)
    ct, cf = canon([(t_trunc,)])[0][0], canon([(t_full,)])[0][0]
    if ct == cf:
        print("SELFTEST FAIL: sub-milli timestamp difference collapsed"
              f" by canon(): both -> {ct}")
        bad += 1
    if cf % 1000 != 45:
        print(f"SELFTEST FAIL: canon() lost the micros remainder: {cf}")
        bad += 1
    # And the tz-aware path must agree with the naive path on the same
    # instant (DuckDB TIMESTAMPTZ vs TIMESTAMP of the same UTC wall time).
    t_aware = t_full.replace(tzinfo=datetime.timezone.utc)
    if canon([(t_aware,)])[0][0] != cf:
        print("SELFTEST FAIL: tz-aware canon() disagrees with naive")
        bad += 1
    print("SELFTEST " + ("PASS" if bad == 0 else f"{bad} FAILURES"))
    return 1 if bad else 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
