#!/usr/bin/env python3
"""Tripwire self-test for tools/oracle_check.py (r12, VERDICT item 5).

The checker is load-bearing for every round's certification, so its
edge behavior is pinned here: a 0-row ORACLED query must match a 0-row
oracle (and mismatch a 1-row one); NaN vs null and -0.0 vs +0.0 must
be DETECTED as divergence (bitwise float compare); multiline SQL with
embedded quotes/backslashes must parse and run. Builds a synthetic
verify-out in a temp dir, runs oracle_check twice (a should-pass set
and a should-fail set), and asserts the exit codes and failure lines.

Usage: python3 tools/oracle_check_selftest.py   (exit 0 = all pinned)
"""
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

HERE = Path(__file__).resolve().parent
CHECK = HERE / "oracle_check.py"
SF = "/root/testdata/sf0.001"


def build(out: Path, spark_tables: dict, oracle: dict):
    out.mkdir(parents=True, exist_ok=True)
    for name, table in spark_tables.items():
        d = out / name
        d.mkdir(exist_ok=True)
        pq.write_table(table, d / "part.parquet")
    (out / "oracle_sql.json").write_text(json.dumps(oracle))
    (out / "queries.json").write_text(json.dumps(sorted(oracle)))


def run(out: Path):
    p = subprocess.run([sys.executable, str(CHECK), SF, str(out)],
                       capture_output=True, text=True)
    return p.returncode, p.stdout


def main():
    tmp = Path(tempfile.mkdtemp(prefix="ocheck_selftest_"))
    # --- should all PASS ---
    good = tmp / "good"
    build(good, {
        "q_zero": pa.table({"k": pa.array([], type=pa.int64())}),
        "q_nan": pa.table({"x": pa.array([float("nan"), -0.0, 0.0],
                                         type=pa.float64())}),
        "q_quote": pa.table({"s": pa.array(['a"b\\c'])}),
    }, {
        "q_zero": "SELECT 1::bigint AS k WHERE false",
        "q_nan": "SELECT * FROM (VALUES ('nan'::double), (-0.0::double),"
                 " (0.0::double)) t(x)",
        "q_quote": "SELECT 'a\"b\\c' AS s\n"
                   "-- comment with \"quotes\" and \\backslash\n",
    })
    rc, outp = run(good)
    assert rc == 0, f"good set must exit 0, got {rc}:\n{outp}"
    assert "3 matched, 0 failed" in outp, outp

    # --- should all FAIL (divergence must be detected) ---
    bad = tmp / "bad"
    build(bad, {
        "q_zero_sign": pa.table({"x": pa.array([0.0], type=pa.float64())}),
        "q_nan_vs_null": pa.table({"x": pa.array([None], type=pa.float64())}),
        "q_zero_vs_one": pa.table({"k": pa.array([], type=pa.int64())}),
        # same MULTISET, different produced order: the driver hashes in
        # produced row order, so an order-insensitive comparator here
        # would certify queries the driver fails
        "q_row_order": pa.table({"k": pa.array([2, 1], type=pa.int64())}),
    }, {
        "q_zero_sign": "SELECT -0.0::double AS x",
        "q_nan_vs_null": "SELECT 'nan'::double AS x",
        "q_zero_vs_one": "SELECT 1::bigint AS k",
        "q_row_order": "SELECT * FROM (VALUES (1::bigint), (2::bigint)) t(k)",
    })
    rc, outp = run(bad)
    assert rc == 1, f"bad set must exit 1, got {rc}:\n{outp}"
    assert "0 matched, 4 failed" in outp, outp
    assert "FAIL q_zero_sign" in outp and "FAIL q_nan_vs_null" in outp \
        and "row count: oracle=1 spark=0" in outp \
        and "FAIL q_row_order" in outp, outp

    print("oracle_check selftest: all 7 edge behaviors pinned (exit codes, "
          "0-row match, sign/NaN/count/row-order divergence detection)")


if __name__ == "__main__":
    main()
