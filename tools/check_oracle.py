#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB over the oracle_sql.json produced by graft.Verify and compares
each result against the Spark-written parquet under the verify out dir:
column names (sorted), row count, and a hash of the canonicalized rows.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql, label):
    """Return (sorted_cols, nrows, digest) for a duckdb relation query."""
    rel = con.sql(rel_sql)
    cols = sorted(rel.columns)
    # select columns in sorted order, stringify, sort rows, hash
    sel = ", ".join(f'"{c}"' for c in cols)
    rows = con.sql(f"SELECT {sel} FROM ({rel_sql})").fetchall()

    def norm(v):
        if isinstance(v, float):
            return f"{v!r}"
        return str(v)

    lines = sorted("\x01".join(norm(v) for v in r) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return cols, len(rows), h


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            scols, snrows, shash = canon(
                con, f"SELECT * FROM parquet_scan({files!r})", "spark")
            ocols, onrows, ohash = canon(con, oracle[name], "oracle")
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = (scols == ocols) and (snrows == onrows) and (shash == ohash)
        if ok:
            print(f"PASS {name}: {snrows} rows")
            n_pass += 1
        else:
            print(f"FAIL {name}: spark cols={scols} rows={snrows} hash={shash}"
                  f" | oracle cols={ocols} rows={onrows} hash={ohash}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
