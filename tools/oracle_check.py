#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare (sorted columns, sorted rows).

Usage: oracle_check.py <sfDir> <verifyOutDir> [jsonOut] [onlyCsv]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

With jsonOut, also writes a CORRECTNESS_r{N}-shaped artifact: one entry
per checked query with rows/schema/hash match booleans (used for the
CORRECTNESS_sf1 scale-stability gate). onlyCsv restricts to the named
queries (per-query driving for big-SF runs where one oracle can take
minutes and incremental progress matters).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        v = round(v, 9)
    return (v is None, str(type(v)), v)

def main(sf_dir, out_dir, json_out=None, only=None):
    con = duckdb.connect()
    # big-SF closure oracles can spill past the disk budget under the
    # default 80%-of-RAM limit; let a caller trade RAM for spill
    # (GRAFT_DUCKDB_MEMLIMIT='110GB') or bound threads for an idle box
    ml = os.environ.get("GRAFT_DUCKDB_MEMLIMIT")
    if ml:
        con.execute(f"SET memory_limit='{ml}'")
    th = os.environ.get("GRAFT_DUCKDB_THREADS")
    if th:
        con.execute(f"SET threads={th}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset dir (e.g. graft.Scale)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        oracles = {k: v for k, v in oracles.items() if k in keep}
    n_pass = n_fail = 0
    report = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1
            record(name, False, False, False, err="no_spark_output");  continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1
            record(name, False, False, False, err=str(e)[:300]);  continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}");  n_fail += 1
            record(name, None, False, False, got.num_rows, want.num_rows,
                   "schema_mismatch");  continue
        g = sorted(tuple(norm(v) for v in row)
                   for row in zip(*[got.column(c).to_pylist() for c in gcols]))
        w = sorted(tuple(norm(v) for v in row)
                   for row in zip(*[want.column(c).to_pylist() for c in wcols]))
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}");  n_fail += 1
            record(name, False, True, False, len(g), len(w), "row_count");  continue
        if g != w:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            record(name, True, True, False, len(g), len(w), "value_mismatch")
            continue
        print(f"PASS {name} ({len(g)} rows, cols={gcols})")
        n_pass += 1
        record(name, True, True, True, len(g), len(w))
    print(f"\n{n_pass} pass / {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  sys.argv[4] if len(sys.argv) > 4 else None))
