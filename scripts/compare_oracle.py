#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each dumped query
result against its DuckDB oracle SQL and compare values.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(canon(x[i]) for x in data) for i in range(tbl.num_rows)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pq.read_table(files[0])
        if name not in oracle:
            results[name] = f"ROWS_ONLY({got.num_rows})" + ("" if got.num_rows > 0 else " !! EMPTY")
            continue
        try:
            want = con.execute(oracle[name]).arrow()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        gc, gr = table_rows(got)
        wc, wr = table_rows(want)
        if gc != wc:
            results[name] = f"SCHEMA_MISMATCH got={gc} want={wc}"
        elif len(gr) != len(wr):
            results[name] = f"ROWCOUNT got={len(gr)} want={len(wr)}"
        elif gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            results[name] = f"VALUE_MISMATCH first at row {bad}: got={gr[bad]} want={wr[bad]}"
        else:
            results[name] = f"OK({len(gr)})"
    npass = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY(")) and "EMPTY" not in v)
    for k, v in results.items():
        flag = "PASS" if v.startswith(("OK", "ROWS_ONLY(")) and "EMPTY" not in v else "FAIL"
        print(f"{flag}  {k}: {v}")
    print(f"== {npass}/{len(results)} pass")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
