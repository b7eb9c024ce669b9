#!/usr/bin/env python3
"""Driver-comparator simulation: read the Spark verify output via
pyarrow/pandas (NOT DuckDB — check.py's DuckDB reads masked the r1
q_scd2_merge INT96 overflow) and diff against the DuckDB oracle result.

Flags: row-count mismatch, column-name mismatch, dtype-family divergence
(e.g. DuckDB HUGEINT -> object vs Spark int64), value mismatches (exact for
ints/strings/bools, 1e-9-relative for floats), and any datetime64 overflow
artifacts (years outside 1677-2262 silently wrap in ns precision).

Usage: python3 tools/check_pyarrow.py <sfDir> <verifyOutDir>

The one driver-tolerated shape (DATE columns read as datetime.date objects
vs the oracle's midnight timestamps — r1 hash_match=true) is normalized in
norm(), so a healthy tree exits 0 with N/N and ANY fail is a real hazard.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def norm(df):
    import datetime
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # normalize the one driver-tolerated shape: DATE columns read as
        # datetime.date objects (pyarrow) vs midnight timestamps (DuckDB df())
        nonnull = df[c].dropna()
        if len(nonnull) and all(isinstance(v, datetime.date) and
                                not isinstance(v, datetime.datetime)
                                for v in nonnull.head(20)):
            df[c] = df[c].map(lambda v: None if v is None else str(v))
        elif str(df[c].dtype).startswith("datetime64"):
            ts = pd.to_datetime(df[c])
            if (ts.dropna() == ts.dropna().dt.normalize()).all():
                df[c] = ts.dt.strftime("%Y-%m-%d")

    def key(series):
        # float columns sort by a rounded representation so near-equal
        # values (inside the 1e-9 compare tolerance) cannot reorder rows
        # differently between the two frames
        if series.dtype.kind == "f":
            return series.round(6)
        return series.astype(str)

    df = df.sort_values(by=list(df.columns), key=key)
    return df.reset_index(drop=True)


def values_match(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # see check.py: entries outside the Verify run's intended_queries.json
    # manifest are deliberate filter skips; an intended entry with no dump
    # is a crashed query and counts as a failure (MISS below)
    intended_path = f"{out}/intended_queries.json"
    intended = (set(json.load(open(intended_path)))
                if os.path.exists(intended_path) else set(oracle))
    skipped = [n for n in oracle
               if n not in intended and not os.path.isdir(f"{out}/{n}")]
    if skipped:
        print(f"NOTE  {len(skipped)} oracle entries filtered out of this "
              f"Verify run — NOT checked")
    bad = 0
    for name in sorted(oracle):
        if name in skipped:
            continue
        sdf = load_spark(out, name)
        if sdf is None:
            print(f"MISS  {name}: no spark output")
            bad += 1
            continue
        odf = con.execute(oracle[name]).df()
        problems = []
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        else:
            s, o = norm(sdf), norm(odf)
            for c in s.columns:
                sk, ok = s[c].dtype.kind, o[c].dtype.kind
                # dtype families must agree (int-vs-object = HUGEINT hazard);
                # allow int-vs-float only if values still match exactly
                if sk != ok and {sk, ok} - {"i", "f"}:
                    problems.append(f"dtype[{c}] {s[c].dtype} vs {o[c].dtype}")
                if str(s[c].dtype).startswith("datetime64"):
                    years = pd.to_datetime(s[c]).dt.year
                    if ((years < 1678) | (years > 2261)).any():
                        problems.append(
                            f"ns-overflow risk in {c}: year outside 1678-2261")
                mism = [i for i in range(len(s))
                        if not values_match(s[c].iloc[i], o[c].iloc[i])]
                if mism:
                    i = mism[0]
                    problems.append(
                        f"value[{c}] row {i}: {s[c].iloc[i]!r} vs "
                        f"{o[c].iloc[i]!r} (+{len(mism) - 1} more)")
        if problems:
            bad += 1
            print(f"FAIL  {name}: " + "; ".join(problems[:4]))
        else:
            print(f"  OK  {name} ({len(sdf)} rows)")
    total = len(oracle) - len(skipped)
    print(f"\n{total - bad}/{total} queries match under the pyarrow comparator"
          + (f" ({len(skipped)} skipped, no dump)" if skipped else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
