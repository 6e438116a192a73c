#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
source parquet tables, and compares: schema (column names), row count,
and a hash of all values with columns sorted by name (rows sorted too,
to be order-insensitive like the driver).
"""
import sys, json, glob, hashlib
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def table_fingerprint(rel):
    df = rel.fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode() + b"\x1e")
    return cols, len(rows), h.hexdigest()

def main():
    # optional: --json <path> writes a driver-CORRECTNESS-style JSON
    # artifact (per-query rows/schema/hash match), so an off-driver
    # scale (e.g. sf0.1) can be committed as a checkable sidecar
    # instead of a session note.
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check.py <sfDir> <verifyOutDir> [--json <path>] [query ...]"
                     " (--json requires a path argument)")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit("usage: check.py <sfDir> <verifyOutDir> [--json <path>] [query ...]")
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not got_files:
            print(f"FAIL {name}: no spark output")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": 0,
                            "oracle_rows": None, "err": "no spark output"}
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet({got_files!r})")
        try:
            want = con.sql(sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": f"oracle SQL error: {e}"}
            failures += 1
            continue
        gc, gn, gh = table_fingerprint(got)
        wc, wn, wh = table_fingerprint(want)
        report[name] = {"rows_match": gn == wn, "schema_match": gc == wc,
                        "hash_match": gh == wh, "spark_rows": gn,
                        "oracle_rows": wn, "err": None}
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            failures += 1
        elif gn != wn:
            print(f"FAIL {name}: rows {gn} != {wn}")
            failures += 1
        elif gh != wh:
            print(f"FAIL {name}: value hash mismatch ({gn} rows)")
            gdf = got.fetchdf()[gc].sort_values(gc).reset_index(drop=True)
            wdf = want.fetchdf()[wc].sort_values(wc).reset_index(drop=True)
            diff = (gdf.astype(str) != wdf.astype(str))
            bad = diff.any(axis=1)
            print(gdf[bad].head(3))
            print(wdf[bad].head(3))
            failures += 1
        else:
            print(f"OK   {name}: {gn} rows")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} entries)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
