#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 scripts/check_correctness.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir
tables, and compares (schema-insensitively): columns sorted by name,
rows sorted by all columns, values stringified.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

# Queries whose float columns come from cross-engine floating-point math
# (cosine similarity: different accumulation order/rounding internals in
# Spark vs DuckDB). Their rows are uniquely keyed by the non-float columns,
# so we sort on those and allow an absolute tolerance on the floats.
# Everything else stays bit-exact (shortest repr).
FLOAT_TOL = {
    "q36_ann_brute_force": 1e-9,
    "q37_ann_lsh": 1e-9,
    "q40_ann_ivf": 1e-9,
    "q41_embedding_neardup": 1e-9,
}

def canon(df: pd.DataFrame, tol: float = 0.0) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types to comparable strings
    out = pd.DataFrame()
    float_cols = []
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            if tol > 0.0:
                out[c] = s.astype(float)   # kept numeric; compared with tol
                float_cols.append(c)
            else:
                # bit-exact: engines must agree to the last ulp (shortest repr)
                out[c] = s.map(lambda v: repr(float(v)) if v == v else "nan")
        elif str(s.dtype).startswith("datetime"):
            out[c] = s.astype("datetime64[us]").astype(str)
        else:
            out[c] = s.astype(str)
    sort_cols = [c for c in out.columns if c not in float_cols] or list(out.columns)
    if float_cols and out.duplicated(subset=sort_cols).any():
        # positional float comparison is only valid when the non-float
        # columns uniquely key each row — fail loudly, never silently
        raise ValueError(
            f"tolerance compare invalid: non-float columns {sort_cols} "
            f"do not uniquely key rows")
    out = out.sort_values(by=sort_cols).reset_index(drop=True)
    return out

def frames_equal(g: pd.DataFrame, e: pd.DataFrame, tol: float) -> bool:
    if tol <= 0.0:
        return g.equals(e)
    for c in g.columns:
        if g[c].dtype.kind == "f":
            a, b = g[c].to_numpy(), e[c].to_numpy()
            both_nan = (a != a) & (b != b)
            if not ((abs(a - b) <= tol) | both_nan).all():
                return False
        elif not g[c].equals(e[c]):
            return False
    return True

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"EMPTY-RESULT {name}"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"NO-ORACLE    {name:24s} rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR   {name}: {e}"); n_fail += 1; continue
        tol = FLOAT_TOL.get(name, 0.0)
        try:
            g, e = canon(got, tol), canon(exp, tol)
        except ValueError as ex:
            print(f"KEY-DUP      {name}: {ex}"); n_fail += 1; continue
        if list(g.columns) != list(e.columns):
            print(f"COLS-DIFF    {name}: spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"ROWS-DIFF    {name}: spark={len(g)} duck={len(e)}")
            n_fail += 1
        elif not frames_equal(g, e, tol):
            diff = (g != e).any(axis=1)
            i = diff[diff].index[0]
            print(f"VALS-DIFF    {name}: first diff row {i}:\n  spark: {g.loc[i].to_dict()}\n  duck:  {e.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS         {name:24s} rows={len(g)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
