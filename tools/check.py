#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each parquet result written by `graft.Verify`, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf dir, and
compares (columns sorted by name, values stringified). Usage:

    python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01 [name...]
"""
import json, sys, math, os
import duckdb
import pyarrow.parquet as pq

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    # zip(*[]) is already [], no guard needed
    return cols, [tuple(canon(v) for v in row) for row in zip(*data)]

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver fixtures are single files; ScaleFixture decks are
        # Spark-written DIRECTORIES — glob those
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    n_ok = n_bad = 0
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path):
            continue
        if only and name not in only:
            continue
        spark_tbl = pq.read_table(path)
        if name not in oracle:
            print(f"  ?? {name}: no oracle ({spark_tbl.num_rows} rows)")
            continue
        try:
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"  !! {name}: oracle SQL failed: {e}")
            n_bad += 1
            continue
        sc, srows = table_rows(spark_tbl)
        dc, drows = table_rows(duck_tbl)
        if sc != dc:
            print(f"  !! {name}: column mismatch spark={sc} duck={dc}")
            n_bad += 1
            continue
        if srows == drows:
            print(f"  ok {name}: {len(srows)} rows")
            n_ok += 1
        else:
            n_bad += 1
            print(f"  !! {name}: rows differ (spark={len(srows)}, duck={len(drows)})")
            for i, (a, b) in enumerate(zip(srows, drows)):
                if a != b:
                    print(f"     first diff at row {i}:\n       spark={a}\n       duck ={b}")
                    break
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
