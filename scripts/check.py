#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT part of the
shipped library; the Scala code never depends on this).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result produced by graft.Verify,
re-runs the matching oracle SQL from oracle_sql.json in DuckDB against the
same fixture parquet, and compares values column-sorted-by-name, row-order
sensitive (the strictest plausible driver behavior).

--strict mirrors the driver's hash comparator bit-for-bit: every value is
rendered to a canonical string (floats via repr, which PRESERVES the IEEE
sign of -0.0) before comparing. Default mode compares float-equal, which
treats -0.0 == +0.0 and therefore passed q_pca_deflate while the driver
hashed it red in round 14 — always run strict before committing an oracle.
"""
import sys, json, glob, os
import datetime
import decimal
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical string for one value, preserving -0.0's sign and decimal
    scale-collapsed exactness (Decimal goes through float64 in both engines'
    driver paths, so float repr is the shared canonical form)."""
    if v is None or v is pd.NaT:
        return "\0NULL"
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        # DuckDB's fetchdf renders DATE as a midnight datetime64 while
        # Spark parquet yields datetime.date — same logical value, so
        # canonicalize naive midnight datetimes to the date string
        if v.tzinfo is None and v.time() == datetime.time(0, 0):
            return v.strftime("%Y-%m-%d")
        return str(v)
    return str(v)


def norm(df: pd.DataFrame, strict: bool = False) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if strict:
            s = s.map(canon)
        elif s.dtype == object:
            s = s.map(lambda v: float(v) if isinstance(v, decimal.Decimal)
                      else (str(v) if v is not None else None))
        out[c] = s
    return pd.DataFrame(out)


def main(sf_dir, out_dir, strict=False):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*/"))):
        name = os.path.basename(d.rstrip("/"))
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: {len(got)} rows"); n_noracle += 1
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, w = norm(got, strict), norm(want, strict)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        neq = (g.fillna("\0NULL") != w.fillna("\0NULL"))
        if neq.any().any():
            bad_cols = [c for c in g.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            print(f"FAIL {name}: value mismatch cols={bad_cols} first row {i}:")
            print("  spark:", g.iloc[i].to_dict())
            print("  duck :", w.iloc[i].to_dict())
            n_fail += 1; continue
        print(f"PASS {name}: {len(g)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--strict"]
    sys.exit(main(args[0], args[1], strict="--strict" in sys.argv))
