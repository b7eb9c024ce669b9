#!/usr/bin/env python3
"""Oracle-SQL portability lint (dev tooling; runs inside tools/check.py).

Round-7 post-mortem: four gates passed a local DuckDB 1.0.0 replica but
failed the driver's DuckDB — every one through a construct whose TYPE or
NULL semantics changed across DuckDB releases. This lint pins that class
so a new gate cannot reintroduce it:

  1. TYPE check (authoritative): DESCRIBE every oracle query and fail on
     any result column typed HUGEINT / UHUGEINT (int128 reaches some
     comparator builds as float64 — the r7 failure mode) or DECIMAL with
     precision > 18 (same overflow-widening hazard). Stable rewrite:
     CAST(sum(...) AS BIGINT) / CAST(... AS DOUBLE) in the projection.
  2. least()/greatest() with an explicit NULL operand: NULL handling for
     these functions is engine-version-dependent. Stable rewrite: spell
     the null-skipping comparison as CASE over the non-null operands
     (see q_agg_bool).
  3. map_extract(...)[...]: bracket-indexed map access changed shape
     across releases. Stable rewrite: a join against the unnested pairs
     (see q_curate_dsir's contrib CTE).
  4. read_json(..., ignore_errors := true): corrupt-row accounting
     differs across json-reader versions; allowed only for gates that
     measure the corrupt count INDEPENDENTLY on each side and are listed
     in READ_JSON_AUDITED below.

Usage: python3 tools/lint_oracles.py <sfDir> <oracle_sql.json>
(also imported by check.py — lint failures fail the whole check run).
"""
import json
import re
import sys

# Gates audited to account for corrupt rows independently on each engine
# (the oracle never trusts ignore_errors' semantics for the comparison).
READ_JSON_AUDITED = {"q_source_jsonl", "q_source_federated"}

_BAD_TYPE = re.compile(r"^(U?HUGEINT)$|^DECIMAL\((\d+),\d+\)$")
_NULL_IN_LEAST = re.compile(
    r"\b(?:least|greatest)\s*\([^()]*\bNULL\b", re.IGNORECASE)
_MAP_EXTRACT = re.compile(r"\bmap_extract\s*\(", re.IGNORECASE)
_READ_JSON = re.compile(r"\bread_json\s*\(", re.IGNORECASE)


def _bad_type(type_str):
    m = _BAD_TYPE.match(type_str)
    if not m:
        return False
    if m.group(1):          # HUGEINT / UHUGEINT
        return True
    return int(m.group(2)) > 18   # DECIMAL precision beyond int64 range


def lint(con, oracle):
    """Returns [(name, problem)] — empty list means portable."""
    problems = []
    for name, sql in sorted(oracle.items()):
        if _MAP_EXTRACT.search(sql):
            problems.append((name, "map_extract(): bracket-indexed map "
                             "access is version-sensitive; rewrite as a "
                             "join on the unnested pairs"))
        if _NULL_IN_LEAST.search(sql):
            problems.append((name, "least/greatest with a NULL operand: "
                             "NULL handling is version-dependent; spell "
                             "it as CASE over the non-null operands"))
        if _READ_JSON.search(sql) and name not in READ_JSON_AUDITED:
            problems.append((name, "read_json(): corrupt-row accounting "
                             "is version-sensitive; audit the gate "
                             "(independent per-engine accounting) and "
                             "add it to READ_JSON_AUDITED"))
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            problems.append((name, f"DESCRIBE failed: {e}"))
            continue
        for col, type_str, *_ in desc:
            if _bad_type(type_str):
                problems.append(
                    (name, f"column `{col}` is {type_str}: int128/wide "
                           "decimals reach some comparator builds as "
                           "float64 (the r7 driver-mismatch class); CAST "
                           "the projection to BIGINT or DOUBLE"))
    return problems


def main(sf_dir, oracle_path):
    import duckdb
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    problems = lint(con, oracle)
    for name, why in problems:
        print(f"LINT  {name}: {why}")
    print(f"{len(oracle) - len({n for n, _ in problems})}/{len(oracle)} "
          f"oracle entries portable")
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
