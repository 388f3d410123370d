#!/usr/bin/env python3
"""Prototype: full dd_simhash DuckDB oracle mirroring Dedup.simhashPairs —
distinct tokens → xxh64 → 64-bit vote pack → 16-bit pigeonhole quarters →
block self-join, hamming <= 3."""
import sys
import duckdb
sys.path.insert(0, '/root/repo/tools')
from xxh64_sql_proto import xxh64_cte


def simhash_oracle(max_dist=3):
    return f"""WITH RECURSIVE
corp AS (
  SELECT doc_id AS id,
         list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS toks
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
ts AS (SELECT DISTINCT unnest(toks) AS s FROM corp),
tid AS (SELECT row_number() OVER (ORDER BY s) AS sid, s FROM ts),
{xxh64_cte('tid', 'tx', 42)},
doch AS (
  SELECT d.id, list(x.h) AS hl
  FROM (SELECT id, unnest(toks) AS s FROM corp) d
  JOIN txdone x USING (s)
  GROUP BY d.id),
packed AS (
  SELECT id,
    CAST(list_sum(list_transform(generate_series(0, 63),
      b -> CASE WHEN 2 * list_sum(list_transform(hl, x -> ((x >> b) & 1)::BIGINT)) > len(hl)
           THEN (1::UBIGINT << b)::HUGEINT ELSE 0::HUGEINT END)) AS UBIGINT) AS sh
  FROM doch WHERE len(hl) > 0),
blocked AS (
  SELECT id, sh, q, ((sh >> (q * 16)) & 65535) AS v
  FROM packed, unnest(generate_series(0, 3)) AS t(q)),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         bit_count(xor(a.sh, b.sh)) AS hamming
  FROM blocked a JOIN blocked b
    ON a.q = b.q AND a.v = b.v AND a.id < b.id
  WHERE bit_count(xor(a.sh, b.sh)) <= {max_dist})
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM pairs
ORDER BY id_a, id_b"""


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark_out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r3b01/dd_simhash.parquet"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exp = con.sql(simhash_oracle()).df()
    got = con.sql(f"SELECT * FROM '{spark_out}/*.parquet'").df()
    print(f"oracle rows={len(exp)} spark rows={len(got)}")
    import pandas as pd
    cols = exp.columns.tolist()
    e = exp.sort_values(cols).reset_index(drop=True)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False)
        print("MATCH")
    except AssertionError as ex:
        print("MISMATCH:", str(ex)[:1500])
        print("spark:\n", g.head(10))
        print("oracle:\n", e.head(10))
        sys.exit(1)
