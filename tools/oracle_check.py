#!/usr/bin/env python3
"""Local pre-validation of the t2 DuckDB oracle gate (SURVEY.md §5.2).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
each fixture table as a DuckDB view over <sfDir>/*.parquet, runs every
oracle SQL, and compares it against the Spark result parquet at
<verifyOutDir>/<name>/*.parquet — columns sorted by name, exact value
equality, in produced row order (the driver hashes in this shape).

Exit 0 iff all queries match.
"""
import json
import struct
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Normalize a cell for comparison across duckdb/parquet round-trips.

    Deliberately NO Decimal.normalize(): the driver's comparator
    materializes DuckDB decimals as float64 while Spark parquet keeps
    Decimal objects, so a trailing-zero decimal that normalize() would
    paper over fails the driver. Decimals compare by exact string here
    — and the schema lint below rejects them outright, since oracle'd
    queries must emit DOUBLE finals.
    """
    if isinstance(v, bool):
        # BEFORE the int passthrough: Python bool is an int subclass and
        # True == 1, so a boolean-vs-integer engine divergence would
        # compare equal here while the driver's pandas hash of a bool
        # column vs an int64 column mismatches
        return ("b", v)
    if isinstance(v, float):
        # BITWISE equality, like the driver (pandas hash_array views
        # float64 bits): distinguishes -0.0 from 0.0, and makes two
        # identical NaN payloads compare equal instead of never-equal
        return ("f", struct.pack("<d", v))
    import decimal
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, list):
        return ("l", tuple(norm(x) for x in v))
    return v


# Output types the driver's pandas-based comparator mishandles:
# decimals become float64 on the DuckDB side only (trailing-zero hash
# mismatch), and array/map cells crash pandas sort_values outright.
DRIVER_HOSTILE = ("decimal", "list", "map", "struct")


def lint_schema(name, side, table, failures):
    bad = [f"{c}:{table.schema.field(c).type}"
           for c in table.column_names
           if any(b in str(table.schema.field(c).type).lower()
                  for b in DRIVER_HOSTILE)]
    if bad:
        failures.append((name, f"lint: {side} emits driver-hostile column type(s): {bad}"))
    return not bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    qfile = Path(out_dir) / "queries.json"
    inventory = set(json.loads(qfile.read_text())) if qfile.exists() else None
    if only:
        known = (inventory or set(oracle)) | {d.name for d in Path(out_dir).iterdir() if d.is_dir()}
        unknown = only - known
        if unknown:
            # a typo'd name would match nothing → "0 matched, 0 failed",
            # exit 0 — certifying nothing while looking green
            print(f"ERROR: unknown query name(s): {sorted(unknown)}")
            sys.exit(2)
    failures, checked, skipped, drift = [], 0, [], []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        files = sorted(res_dir.glob("*.parquet")) if res_dir.exists() else []
        if not files:
            failures.append((name, "spark result parquet missing (query failed in Verify?)"))
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetch_arrow_table()
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            failures.append((name, f"column mismatch: oracle={wcols} spark={gcols}"))
            continue
        # evaluate BOTH lints before combining, so one side's failure
        # doesn't hide the other side's (costing an extra iteration)
        spark_ok = lint_schema(name, "spark", got, failures)
        oracle_ok = lint_schema(name, "oracle", want, failures)
        if not (spark_ok and oracle_ok):
            continue
        # surface arrow-dtype drift even when values match (the driver's
        # schema check may be stricter than value equality)
        for c in wcols:
            wt = want.schema.field(c).type
            gt = got.schema.field(c).type
            if str(wt) != str(gt):
                drift.append(f"{name}.{c}: oracle={wt} spark={gt}")
                print(f"  ~~ {name}.{c}: dtype oracle={wt} spark={gt}")
        wrows = [tuple(norm(r[c]) for c in wcols) for r in want.to_pylist()]
        grows = [tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()]
        if len(wrows) != len(grows):
            failures.append((name, f"row count: oracle={len(wrows)} spark={len(grows)}"))
            continue
        diff = next((i for i, (w, g) in enumerate(zip(wrows, grows)) if w != g), None)
        if diff is not None:
            failures.append((name,
                f"first diff at row {diff}:\n  oracle: {wrows[diff]}\n  spark:  {grows[diff]}"))
            continue
        checked += 1
        print(f"  OK  {name} ({len(wrows)} rows)")

    # queries present in results but not in oracle map → rows-only check
    # (must return rows: a no-oracle query regressing to 0 rows — or
    # throwing entirely, see the inventory check below — is a failure,
    # not a healthy line)
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle and (not only or d.name in only):
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            if n == 0:
                failures.append((d.name, "no-oracle query returned 0 rows"))
            else:
                skipped.append(d.name)
                print(f"  --  {d.name}: no oracle, {n} rows (rows-only check)")

    # the full inventory (queries.json, written by Verify) closes the
    # blind spot where a FAILED no-oracle query simply has no result dir
    # and appears nowhere in the output
    if inventory is not None:
        expected = {n for n in inventory if not only or n in only}
        have = {d.name for d in Path(out_dir).iterdir() if d.is_dir()}
        for name in sorted(expected - have - set(oracle)):
            failures.append((name, "result dir missing (no-oracle query failed in Verify?)"))

    if drift:
        print(f"\n{len(drift)} dtype drift(s) (non-fatal, driver may be stricter):")
        for d in drift:
            print(f"  ~~ {d}")
    print(f"\n{checked} matched, {len(failures)} failed, {len(skipped)} no-oracle")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
