#!/usr/bin/env python3
"""r17 optimization-round instrument: compare two `graft.Verify` output
directories query-by-query, row-exactly (sorted by all columns), so a
plan-level optimization can be proven to leave EVERY query's result —
including the `no_oracle` sketch/ANN rows the DuckDB gate cannot check —
bit-identical. Usage: diff_verify_out.py <dirA> <dirB>"""
import sys, os
import duckdb

a, b = sys.argv[1], sys.argv[2]
qa = {d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d))}
qb = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
bad = 0
for q in sorted(qa | qb):
    if q not in qa or q not in qb:
        print(f"MISSING  {q}: only in {'A' if q in qa else 'B'}")
        bad += 1
        continue
    try:
        con = duckdb.connect()
        ra = con.sql(f"select * from '{a}/{q}/*.parquet'")
        cols = ra.columns
        n = con.sql(
            f"select count(*) from ((select * from '{a}/{q}/*.parquet') "
            f"except all (select * from '{b}/{q}/*.parquet'))").fetchone()[0]
        m = con.sql(
            f"select count(*) from ((select * from '{b}/{q}/*.parquet') "
            f"except all (select * from '{a}/{q}/*.parquet'))").fetchone()[0]
        if n or m:
            print(f"DIFF     {q}: {n} rows only-in-A, {m} only-in-B")
            bad += 1
        con.close()
    except Exception as e:
        print(f"ERROR    {q}: {e}")
        bad += 1
print(f"== {len(qa | qb)} queries, {bad} differ ==")
sys.exit(1 if bad else 0)
