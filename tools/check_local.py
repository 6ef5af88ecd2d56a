#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage:  python3 tools/check_local.py [sfDir] [outDir]

Reads outDir/<name>/ parquet dumps written by `graft.Verify`, runs each
oracle SQL from outDir/oracle_sql.json in DuckDB against the sfDir parquet
tables, and compares: column names (sorted), dtypes (STRICT, at the DuckDB
type level — the driver's hash is dtype-sensitive, so a DuckDB HUGEINT vs a
Spark BIGINT is a FAIL even when every value matches), row counts, and
values (bit-exact first, then 1e-9 relative tolerance fallback so we can
see HOW close a float mismatch is). Additionally audits every oracle for
forbidden wide output types (HUGEINT/UHUGEINT/DECIMAL) that no Spark plan
can emit — the round-5 class of bug (uncast SUM(BIGINT)) fails here even
if values happen to agree.

Dev-only tool (driver-side python); not part of the shipped Scala library.
"""
import glob
import os
import json
import math
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
# optional trailing args: restrict the check to these entry names
# (tools/replay_scale.py uses this for per-entry isolated replay)
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


FORBIDDEN_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def norm_type(t):
    """Normalize DuckDB type names across parquet writer noise.

    Spark writes timestamps as int64 micros; DuckDB renders both
    TIMESTAMP and TIMESTAMP_NS/_MS depending on the parquet logical
    annotation — unit differences are not what the driver hash sees
    (values compare equal), so collapse them. Everything else is strict.
    """
    t = str(t)
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return t


def norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def main():
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; Spark-written corpora
        # (ScaleUp, fuzz variants) are part-file DIRECTORIES — glob those
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    if ONLY:
        oracle = {k: v for k, v in oracle.items() if k in ONLY}

    # one-shot wide-type audit across ALL oracles — planner-only (lazy
    # relation, nothing executes), so it runs even for entries whose spark
    # dump is missing from this (possibly partial) Verify run
    audit_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            trel = con.sql(sql)
        except Exception:
            continue  # surfaced as ORACLE-ERROR by the main loop
        w = [f"{c}:{t}" for c, t in zip(trel.columns, trel.types)
             if any(str(t).startswith(f) for f in FORBIDDEN_TYPES)]
        if w:
            audit_bad += 1
            print(f"AUDIT {name}: wide oracle type {w} — cast to BIGINT/DOUBLE")
    print(f"== wide-type audit: {audit_bad}/{len(oracle)} oracles flagged")

    results = {}
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{OUT_DIR}/{name}/*.parquet"))
        if not files:
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            mrel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            trel = con.sql(oracle[name])
            mtypes = {c: norm_type(t) for c, t in zip(mrel.columns, mrel.types)}
            ttypes = {c: norm_type(t) for c, t in zip(trel.columns, trel.types)}
            mine, theirs = mrel.df(), trel.df()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue

        mc, tc = sorted(mine.columns), sorted(theirs.columns)
        if mc != tc:
            results[name] = f"COLS mine={mc} oracle={tc}"
            continue
        # forbidden-wide-type audit: no Spark plan emits these, so an
        # oracle producing one is wrong even if values agree today
        wide = [f"{c}:{ttypes[c]}" for c in tc
                if any(ttypes[c].startswith(f) for f in FORBIDDEN_TYPES)]
        if wide:
            results[name] = f"ORACLE-WIDE-TYPE {wide} (cast to BIGINT/DOUBLE)"
            continue
        # strict dtype compare — the driver's hash is dtype-sensitive
        dt = [f"{c}: mine={mtypes[c]} oracle={ttypes[c]}"
              for c in tc if mtypes[c] != ttypes[c]]
        if dt:
            results[name] = f"DTYPE {'; '.join(dt)}"
            continue
        if len(mine) != len(theirs):
            results[name] = f"ROWS mine={len(mine)} oracle={len(theirs)}"
            continue
        mine, theirs = mine[mc], theirs[mc]
        # driver sorts columns by name; compare row-by-row in emitted order,
        # falling back to a canonical row sort in case emitted order differs
        mism = compare(mine, theirs)
        if mism:
            m2 = compare(mine.sort_values(mc).reset_index(drop=True),
                         theirs.sort_values(mc).reset_index(drop=True))
            results[name] = "OK-AFTER-ROWSORT" if not m2 else "; ".join(m2[:3])
        else:
            results[name] = "OK"

    width = max(len(n) for n in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for n, v in sorted(results.items()):
        print(f"{n:<{width}}  {v}")
    # queries with no oracle entry (meaningless under an ONLY filter)
    if not ONLY:
        declared = {os.path.basename(p) for p in glob.glob(f"{OUT_DIR}/*")
                    if os.path.isdir(p)}
        no_oracle = declared - set(oracle)
        if no_oracle:
            print(f"-- rows-only (no oracle): {sorted(no_oracle)}")
    print(f"== {n_ok}/{len(results)} oracle-checked OK")
    return 0 if n_ok == len(results) and audit_bad == 0 else 1


def compare(mine, theirs):
    mism = []
    for c in mine.columns:
        a, b = list(mine[c]), list(theirs[c])
        for i, (x, y) in enumerate(zip(a, b)):
            x, y = norm(x), norm(y)
            if x == y or (x is None and y is None):
                continue
            if isinstance(x, float) and isinstance(y, float):
                if x == y:
                    continue
                tol = abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
                mism.append(
                    f"{c}[{i}]: {x!r} vs {y!r}"
                    + (" (within 1e-9 — NOT bit-exact!)" if tol else ""))
            else:
                if str(x) == str(y):
                    continue
                mism.append(f"{c}[{i}]: {x!r} ({type(x).__name__}) vs "
                            f"{y!r} ({type(y).__name__})")
            if len(mism) >= 5:
                return mism
    return mism


if __name__ == "__main__":
    sys.exit(main())
