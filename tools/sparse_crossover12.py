#!/usr/bin/env python3
"""Dev-only sparse-pairs crossover, DuckDB side. Reads the replicated
documents that `runMain graft.ScaleProbe sparse12` wrote to
/tmp/graft_crossover/docs.parquet and times the exact-form oracle
spelling of sparse_cosine_pairs on it (the same SQL both gated
queries compare against), for SCALE.md's crossover record.

Usage: python3 tools/sparse_crossover12.py [timeout_s]
"""
import multiprocessing as mp
import sys
import time

N = 5
DF_CAP = 100  # absolute head cut, held constant as the corpus grows
THRESHOLD = 0.6

SQL = f"""WITH g AS (
      SELECT doc_id,
        unnest(list_transform(
          generate_series(1, greatest(length(text) - {N - 1}, 1)),
          i -> substring(text, i, {N}))) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM g GROUP BY 1, 2),
    dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    nd AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM tf),
    idf AS (
      SELECT term, ln((n_docs + 1)::DOUBLE / (df + 1)) + 1 AS idf
      FROM dfq CROSS JOIN nd WHERE df <= {DF_CAP}),
    wts AS (
      SELECT doc_id, term, floor(tf * idf * 1024 + 0.5) / 1024 AS w
      FROM tf JOIN idf USING (term)),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wts GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
      FROM wts a JOIN wts b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
      floor(dot / (na.nrm * nb.nrm) * 10000 + 0.5) / 10000 AS cosine
    FROM dots
    JOIN nrm na ON id_a = na.doc_id
    JOIN nrm nb ON id_b = nb.doc_id
    WHERE dot / (na.nrm * nb.nrm) >= {THRESHOLD}"""


def run_one(q):
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/tmp/graft_crossover/docs.parquet/*.parquet'")
    t0 = time.time()
    n = con.execute(f"SELECT count(*) FROM ({SQL})").fetchone()[0]
    q.put((time.time() - t0, n))


def main():
    timeout = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0
    for rep in (1, 2):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(q,))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f'{{"probe":"sparse12 duckdb r{rep}","sec":">{timeout}"}}')
            return
        sec, n = q.get()
        print(f'{{"probe":"sparse12 duckdb r{rep}","sec":{sec:.2f},"rows":{n}}}')


if __name__ == "__main__":
    sys.exit(main())
