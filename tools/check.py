#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each parquet result written by `graft.Verify`, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf dir, and
compares (columns sorted by name, values stringified). Usage:

    python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01 [name...]
    python3 tools/check.py --self-json CORRECTNESS_SELF.json OUT SF [name...]

--self-json FILE additionally writes a per-round self-check artifact:
per-query ok/bad verdicts, the total check wall-clock, per-query oracle
seconds, and a fixed CPU-bound DuckDB comparator timed before and after
the pass (load evidence, the Bench comparator's role) — so a round can
never again end signal-less if the driver's own correctness artifact
comes back empty (VERDICT r14 "What's wrong #1").
"""
import json, sys, math, os, time
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

def comparator(con):
    """Fixed CPU-bound DuckDB job — its duration is box-load evidence
    (quiet level recorded in the artifact next to the readings)."""
    t0 = time.monotonic()
    con.execute("SELECT sum(hash(range) % 1000000) FROM range(20000000)") \
       .fetchall()
    return round(time.monotonic() - t0, 3)

def main():
    args = list(sys.argv[1:])
    self_json = None
    if args and args[0] == "--self-json":
        self_json = args[1]
        args = args[2:]
    outdir, sfdir = args[0], args[1]
    only = set(args[2:])
    # deck provenance gate (mirrors graft.ScaleFixture.verifyManifest;
    # keep SCHEME_VERSION in sync): a stale deck once one-classed the
    # NB family and cost a sweep before anyone noticed
    SCHEME_VERSION = 3
    manifest = os.path.join(sfdir, "FIXTURE_MANIFEST.json")
    if os.path.exists(manifest):
        v = json.load(open(manifest)).get("scheme_version")
        if v != SCHEME_VERSION:
            sys.exit(f"!! {sfdir} was generated with fixture scheme v{v}; "
                     f"this checker expects v{SCHEME_VERSION} — stale deck, "
                     "rebuild with runMain graft.ScaleFixture")
    elif not os.path.abspath(sfdir).startswith("/root/testdata/"):
        sys.exit(f"!! {sfdir} has no FIXTURE_MANIFEST.json — stale or "
                 "hand-made deck; rebuild with runMain graft.ScaleFixture")
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
    n_ok = n_bad = n_no_oracle = 0
    t_start = time.monotonic()
    comp_before = comparator(con) if self_json else None
    queries = {}
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path):
            continue
        if only and name not in only:
            continue
        spark_tbl = pq.read_table(path)
        if name not in oracle:
            # a gated output with no oracle SQL is a FAILURE here, not a
            # skip: every query this engine claims as done carries an
            # oracle, so a missing entry means the surface regressed —
            # and the self-json artifact exists precisely so that can't
            # read as a clean pass (r15 ADVICE #4)
            print(f"  !! {name}: no oracle ({spark_tbl.num_rows} rows)")
            queries[name] = {"ok": False, "why": "no oracle",
                             "rows": spark_tbl.num_rows}
            n_bad += 1
            n_no_oracle += 1
            continue
        t_q = time.monotonic()
        try:
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"  !! {name}: oracle SQL failed: {e}")
            queries[name] = {"ok": False, "why": f"oracle SQL failed: {e}",
                             "oracle_sec": round(time.monotonic() - t_q, 3)}
            n_bad += 1
            continue
        oracle_sec = round(time.monotonic() - t_q, 3)
        sc, srows = table_rows(spark_tbl)
        dc, drows = table_rows(duck_tbl)
        if sc != dc:
            print(f"  !! {name}: column mismatch spark={sc} duck={dc}")
            queries[name] = {"ok": False,
                             "why": f"column mismatch spark={sc} duck={dc}",
                             "oracle_sec": oracle_sec}
            n_bad += 1
            continue
        if srows == drows:
            print(f"  ok {name}: {len(srows)} rows")
            queries[name] = {"ok": True, "rows": len(srows),
                             "oracle_sec": oracle_sec}
            n_ok += 1
        else:
            n_bad += 1
            print(f"  !! {name}: rows differ (spark={len(srows)}, duck={len(drows)})")
            queries[name] = {"ok": False,
                             "why": f"rows differ (spark={len(srows)}, duck={len(drows)})",
                             "oracle_sec": oracle_sec}
            for i, (a, b) in enumerate(zip(srows, drows)):
                if a != b:
                    print(f"     first diff at row {i}:\n       spark={a}\n       duck ={b}")
                    break
    if self_json:
        comp_after = comparator(con)
        artifact = {
            "n_ok": n_ok, "n_bad": n_bad, "n_no_oracle": n_no_oracle,
            "check_wall_sec": round(time.monotonic() - t_start, 3),
            "comparator_sec": [comp_before, comp_after],
            "sf_dir": sfdir,
            "queries": queries,
        }
        with open(self_json, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"== self-check artifact -> {self_json}")
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
