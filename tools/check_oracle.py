#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB with the sf
tables registered as views, and compares row-by-row (exact values, sorted
columns by name, rows in file order vs ORDER BY order).
"""
import sys, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    """Driver-faithful cell key: dtype class + exact rendering.

    An int64 28690 and a float64 28690.0 are EQUAL numerically but hash
    differently driver-side (DuckDB HUGEINT → pandas float64 is the
    classic leak: any uncast SUM(BIGINT) in an oracle). NaN collapses to
    one token so NaN == NaN."""
    if isinstance(v, float):
        if math.isnan(v):
            return ('f', 'nan')
        return ('f', repr(v))
    return ('v', str(v))

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        g = got[gc].values.tolist()
        w = want[wc].values.tolist()
        bad = None
        for i, (rg, rw) in enumerate(zip(g, w)):
            for a, b in zip(rg, rw):
                if norm(a) != norm(b):
                    bad = (i, a, b); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: spark={bad[1]!r} oracle={bad[2]!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
