#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only; the
shipped library is Scala — see BASELINE.md).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
sf parquet tables, and compares row counts, column names (sorted), and a
hash of all values (columns sorted by name, rows sorted).
"""
import sys, json, hashlib, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def repo_guards():
    """The two source-level guard rails (cache hygiene, leak check) run
    with every correctness check, so one `tools/check.py` invocation
    fails on ANY of the three round-close gates — the third (oracle
    portability) runs below against the live oracle set."""
    fails = []
    try:
        from lint_persists import lint as persist_lint
        fails.extend((f"persist lint src/.../{rel}:{ln}", why)
                     for rel, ln, why in persist_lint())
    except ImportError:
        print("NOTE  tools/lint_persists.py not importable — lint skipped")
    import subprocess, os as _os
    leak = subprocess.run(
        [sys.executable, _os.path.join(_os.path.dirname(
            _os.path.abspath(__file__)), "leakcheck.py")],
        capture_output=True, text=True)
    if leak.returncode != 0:
        fails.append(("leakcheck", leak.stdout[-800:] + leak.stderr[-400:]))
    return fails


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = list(repo_guards())
    # Portability lint first: a gate that only passes on ONE DuckDB
    # version is not correct, it is lucky (the r7 lesson).
    try:
        from lint_oracles import lint
        failures.extend((n, f"portability lint: {why}")
                        for n, why in lint(con, oracle))
    except ImportError:
        print("NOTE  tools/lint_oracles.py not importable — lint skipped")
    import os
    # intended_queries.json (written by Verify) names the post-filter run
    # set: only entries OUTSIDE it may be skipped. An intended entry with
    # no dump means the query crashed inside Verify — a hard failure, not
    # a skip. Without the manifest (pre-round-6 dump dir), every missing
    # dump is a hard failure, as originally.
    intended_path = f"{out_dir}/intended_queries.json"
    intended = (set(json.load(open(intended_path)))
                if os.path.exists(intended_path) else set(oracle))
    # errors.json (written by Verify) carries the actual exception for
    # every query that crashed instead of dumping — surfaced here as an
    # err row so a crashed gate can never read as mere absence.
    errors_path = f"{out_dir}/errors.json"
    verify_errors = (json.load(open(errors_path))
                     if os.path.exists(errors_path) else {})
    missing = [n for n in oracle if not os.path.isdir(f"{out_dir}/{n}")]
    skipped = [n for n in missing if n not in intended]
    for n in missing:
        if n in intended:
            failures.append((n, json.dumps({"err": verify_errors.get(
                n, "intended but no dump written — crashed in Verify?")})))
    # a query can also crash AFTER writing a stale dump from an earlier
    # run into the same outDir — an errors.json entry always wins
    for n in sorted(set(verify_errors) - set(missing)):
        failures.append((n, json.dumps({"err": verify_errors[n]})))
    if skipped:
        print(f"NOTE  {len(skipped)} oracle entries filtered out of this "
              f"Verify run — NOT checked: "
              f"{sorted(skipped)[:5]}{'...' if len(skipped) > 5 else ''}")
    for name, sql in sorted(oracle.items()):
        if name in missing or name in verify_errors:
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            duck_rel = con.execute(sql)
            d_cols = [d[0] for d in duck_rel.description]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            failures.append((name, f"oracle sql failed: {e}"))
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append((name, f"cols spark={sorted(s_cols)} "
                                   f"duck={sorted(d_cols)}"))
            continue
        if len(s_rows) != len(d_rows):
            failures.append((name, f"rows spark={len(s_rows)} "
                                   f"duck={len(d_rows)}"))
            continue
        hs, hd = table_hash(s_cols, s_rows), table_hash(d_cols, d_rows)
        if hs != hd:
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            sset = {tuple(canon(r[i]) for i in order) for r in s_rows}
            dset = {tuple(canon(r[i]) for i in order) for r in d_rows}
            ex = list(sset - dset)[:2] + ["---"] + list(dset - sset)[:2]
            failures.append((name, f"hash mismatch; examples {ex}"))
            continue
        print(f"  OK  {name} ({len(s_rows)} rows)")
    for name, why in failures:
        print(f"FAIL  {name}: {why}")
    checked = len(oracle) - len(skipped)
    print(f"\n{checked - len(failures)}/{checked} queries match"
          + (f" ({len(skipped)} skipped, no dump)" if skipped else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
