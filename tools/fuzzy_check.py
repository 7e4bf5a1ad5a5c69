#!/usr/bin/env python3
"""Scale-path oracle for llm_fuzzy_join.

The committed oracle (oracle_sql.json) is the DELIBERATELY naive
O(n^2) cross join + levenshtein — at the sf0.01 gate it doubles as a
recall proof for the Spark side's SymSpell del-1 blocking. At sf1
(150k names) the naive replay is ~2.25e10 levenshtein calls and runs
for hours, so the scale check uses the SAME del-1 blocking rebuilt
independently in DuckDB SQL + exact levenshtein verify.

Two modes:
  prove <sf_dir>   — assert banded == naive inside DuckDB (run at
                     sf0.1, where naive is still feasible: the recall
                     argument carries to sf1 because the blocking is
                     data-independent).
  check <verify_out_dir> <sf_dir> — compare Spark's parquet result to
                     the banded oracle (run at sf1).
"""
import sys

import duckdb


def con_for(sf_dir):
    import os
    con = duckdb.connect()
    path = f"{sf_dir}/customer.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{path}'")
    return con


BANDED = """
WITH names AS (SELECT c_name AS name FROM customer),
keyed AS (
  SELECT name, unnest(list_distinct(list_append(
    list_transform(range(1, len(name) + 1),
      i -> substr(name, 1, i - 1) || substr(name, i + 1)), name))) AS k
  FROM names)
SELECT DISTINCT a.name AS name_a, b.name AS name_b
FROM keyed a JOIN keyed b ON a.k = b.k
WHERE a.name < b.name AND levenshtein(a.name, b.name) <= 1
ORDER BY name_a, name_b
"""

NAIVE = """
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM customer a, customer b
WHERE a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY name_a, name_b
"""


def main():
    mode = sys.argv[1]
    if mode == "prove":
        con = con_for(sys.argv[2])
        banded = con.sql(BANDED).fetchall()
        naive = con.sql(NAIVE).fetchall()
        assert banded == naive, (
            f"banded oracle diverges from naive: {len(banded)} vs "
            f"{len(naive)} rows")
        print(f"PROVED banded == naive at {sys.argv[2]} ({len(naive)} pairs)")
    elif mode == "check":
        out_dir, sf_dir = sys.argv[2], sys.argv[3]
        con = con_for(sf_dir)
        spark = con.sql(
            f"SELECT name_a, name_b FROM '{out_dir}/llm_fuzzy_join/*.parquet'"
            " ORDER BY name_a, name_b").fetchall()
        banded = con.sql(BANDED).fetchall()
        if spark == banded:
            print(f"PASS llm_fuzzy_join ({len(spark)} rows, banded oracle)")
        else:
            print(f"FAIL llm_fuzzy_join: spark={len(spark)} banded={len(banded)}")
            sys.exit(1)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
