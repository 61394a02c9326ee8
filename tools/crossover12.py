#!/usr/bin/env python3
"""Dev-only crossover measurement, DuckDB side. Reads the replicated
edge sets that `runMain graft.ScaleProbe crossover12` wrote to
/tmp/graft_crossover/ and times the SAME unrolled-CTE spellings the
correctness oracles use for graph_lpa (3 LPA rounds over the doubled
purchase graph) and graph_kcore (4 peel rounds at k=70) — the
single-process head-to-head for SCALE.md's crossover row.

Usage: python3 tools/crossover12.py [timeout_s]
"""
import sys
import time

import duckdb

OUT = "/tmp/graft_crossover"
ITERS = 3
K = 70
ROUNDS = 4


def lpa_sql():
    iter_ctes = []
    for k in range(1, ITERS + 1):
        p = k - 1
        iter_ctes.append(f"""c{k} AS MATERIALIZED (
            SELECT e.dst AS id, l.lab, count(*)::BIGINT AS n
            FROM edges e JOIN l{p} l ON l.id = e.src GROUP BY 1, 2),
          p{k} AS MATERIALIZED (
            SELECT id, lab FROM (
              SELECT id, lab, row_number() OVER (
                PARTITION BY id ORDER BY n DESC, lab ASC) AS rn
              FROM c{k}) WHERE rn = 1),
          l{k} AS MATERIALIZED (
            SELECT l.id, coalesce(p.lab, l.lab) AS lab
            FROM l{p} l LEFT JOIN p{k} p ON p.id = l.id)""")
    ctes = ",\n".join(iter_ctes)
    return f"""WITH edges AS MATERIALIZED (
          SELECT cust AS src, supp AS dst FROM pairs
          UNION
          SELECT supp AS src, cust AS dst FROM pairs),
        nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        l0 AS MATERIALIZED (SELECT id, id AS lab FROM nodes),
        {ctes}
        SELECT id, lab FROM l{ITERS}"""


def kcore_sql():
    rounds = []
    for r in range(1, ROUNDS + 1):
        prev = "canon" if r == 1 else f"g{r - 1}"
        rounds.append(f"""d{r} AS MATERIALIZED (
            SELECT id, count(*)::BIGINT AS deg FROM (
              SELECT lo AS id FROM {prev}
              UNION ALL SELECT hi AS id FROM {prev}) GROUP BY 1),
          k{r} AS MATERIALIZED (SELECT id FROM d{r} WHERE deg >= {K}),
          g{r} AS MATERIALIZED (
            SELECT c.lo, c.hi FROM {prev} c
            JOIN k{r} a ON a.id = c.lo
            JOIN k{r} b ON b.id = c.hi)""")
    ctes = ",\n".join(rounds)
    return f"""WITH canon AS MATERIALIZED (
          SELECT DISTINCT a AS lo, b AS hi FROM copurchase),
        {ctes}
        SELECT id, count(*)::BIGINT AS core_deg FROM (
          SELECT lo AS id FROM g{ROUNDS}
          UNION ALL SELECT hi AS id FROM g{ROUNDS}) GROUP BY 1"""


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW pairs AS SELECT * FROM '{OUT}/pairs.parquet/*.parquet'")
    con.execute(
        "CREATE VIEW copurchase AS "
        f"SELECT * FROM '{OUT}/canon.parquet/*.parquet'")
    for rep in (1, 2):
        t0 = time.time()
        n_lpa = con.execute(
            f"SELECT count(*) FROM ({lpa_sql()})").fetchone()[0]
        t1 = time.time()
        n_core = con.execute(
            f"SELECT count(*) FROM ({kcore_sql()})").fetchone()[0]
        t2 = time.time()
        print(f'{{"probe":"crossover12 duckdb r{rep}",'
              f'"lpa_sec":{t1 - t0:.2f},"lpa_rows":{n_lpa},'
              f'"kcore_sec":{t2 - t1:.2f},"kcore_rows":{n_core}}}')


if __name__ == "__main__":
    sys.exit(main())
