#!/usr/bin/env python3
"""DuckDB side of the cross-engine libm parity probe (see
src/main/scala/graft/LibmProbe.scala). Reads the probe parquet
(x, s_log2, s_ln, s_pow2) and counts EXACT-BIT disagreements between
Spark's LOG2/LN/POWER and DuckDB's log2/ln/power over the same x, for
each input population. `a = b` on DOUBLE in DuckDB is exact-value
comparison, which is what the driver's oracle hash effectively does.

Usage: libm_probe.py [/tmp/graft_libm_probe]
Prints one line per (population, function) with mismatch counts and a
worst-case ulp-ish abs diff; exit 0 always (it's a measurement, not a
gate).
"""
import sys

import duckdb

base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_libm_probe"
con = duckdb.connect()
for pop in ("ints", "ratios", "bpts"):
    path = f"{base}/{pop}/*.parquet"
    for fn, spark_col, duck_expr in (
            ("log2", "s_log2", "log2(x)"),
            ("ln", "s_ln", "ln(x)"),
            ("pow2", "s_pow2", "power(2.0, x)")):
        n, bad, worst = con.execute(
            f"SELECT count(*), "
            f"       sum(CASE WHEN {duck_expr} <> {spark_col} THEN 1 ELSE 0 END), "
            f"       max(abs({duck_expr} - {spark_col})) "
            f"FROM read_parquet('{path}')").fetchone()
        print(f"{pop:7s} {fn:5s}: {bad or 0}/{n} exact-bit mismatches"
              f" (max abs diff {worst or 0:.3e})")
