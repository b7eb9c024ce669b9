#!/usr/bin/env python3
"""Synthesize an inflated SF dir for scaling probes (dev tooling only).

The driver ships sf0.001/0.01/0.1; the heaviest gate families are
fixed-overhead-dominated at sf0.1 (2,000 embeddings), so their "flat
across 100x" scaling evidence cannot separate fixed job cost from real
growth. This tool inflates the three tables those families actually
scan — embeddings, documents, lineitem — by an integer factor with
DETERMINISTIC per-copy perturbations (ids offset per copy; embedding
components nudged; document text vowel-rotated so the near-dup rate
stays roughly constant instead of exploding quadratically), and copies
every other table through unchanged. Output goes to a scratch dir —
never into /root/testdata.

Usage: python3 tools/make_sfsynth.py <srcSfDir> <outDir> <factor>
"""
import os, shutil, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    # embeddings: copy k offsets vec_id by k*(max+1) and nudges the first
    # two components by distinct increments — near the original (realistic
    # local density) but never an exact duplicate
    n = con.sql(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
    parts = [f"""
      SELECT vec_id + {k * n} AS vec_id,
             list_concat([CAST(embedding AS DOUBLE[])[1] + {k} * 0.37,
                          CAST(embedding AS DOUBLE[])[2] + {k} * 0.11],
                         CAST(embedding AS DOUBLE[])[3:])
               AS embedding
      FROM '{src}/embeddings.parquet'""" for k in range(factor)]
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

    # documents: copy k offsets doc_id and rotates vowels k times so
    # cross-copy k-grams differ (near-dup rate stays ~constant)
    m = con.sql(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{src}/documents.parquet'").fetchall()]
    other = ", ".join(c for c in cols if c not in ("doc_id", "text"))
    # per-copy FULL-ALPHABET caesar shift: distinct for every k < 26, so
    # no two copies share text. (The original 5-vowel rotation cycled
    # mod 5 — at factor >= 6 copy k and k+5 were byte-identical, planting
    # an exact duplicate of the whole corpus and quadratically exploding
    # the substring-dedup pair count this tool's docstring promises to
    # keep constant. Measured: q_dedup_substring read ~112 s on the
    # degenerate factor-10 corpus vs ~49 s once copies are distinct.)
    assert factor <= 26, "caesar-shift copies are distinct only up to 26"
    alpha = "abcdefghijklmnopqrstuvwxyz"
    parts = []
    for k in range(factor):
        rot = alpha[k:] + alpha[:k]
        parts.append(f"""
          SELECT doc_id + {k * m} AS doc_id,
                 translate(text, '{alpha}', '{rot}') AS text
                 {', ' + other if other else ''}
          FROM '{src}/documents.parquet'""")
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

    # lineitem: copy k offsets the order key (baskets stay intact, row
    # count scales; partkey/suppkey distributions unchanged so zone-map
    # boxes keep their selectivity)
    o = con.sql(f"SELECT max(l_orderkey)+1 FROM '{src}/lineitem.parquet'").fetchone()[0]
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{src}/lineitem.parquet'").fetchall()]
    other = ", ".join(c for c in cols if c != "l_orderkey")
    parts = [f"""
      SELECT l_orderkey + {k * o} AS l_orderkey, {other}
      FROM '{src}/lineitem.parquet'""" for k in range(factor)]
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")

    for t in TABLES:
        if t in ("embeddings", "documents", "lineitem"):
            continue
        dst = f"{out}/{t}.parquet"
        srcp = f"{src}/{t}.parquet"
        if os.path.isdir(srcp):
            shutil.copytree(srcp, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(srcp, dst)

    for t in TABLES:
        c = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {c}")


if __name__ == "__main__":
    main()
