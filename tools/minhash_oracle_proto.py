#!/usr/bin/env python3
"""Prototype: full dd_minhash DuckDB oracle (single statement) mirroring
Dedup.minhashCandidates — shingle → xxh64 → 32 affine minima → 8 band keys
(xxh64 string + int-fold) → bucket self-join with oversized-bucket guard.
Compares against the Spark output parquet from the last local Verify run."""
import sys
import duckdb
sys.path.insert(0, '/root/repo/tools')
from xxh64_sql_proto import xxh64_cte, stages_sql, mul64, add64, rot, xor64, signed, M64

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P5 = 0x27D4EB2F165667C5
MASK = (1 << 64) - 1

A = [1562431131,102948885,595021506,196118094,791955277,1482678033,1681268744,326327864,1610411244,1714307459,1276356731,538291086,369835213,588781165,1226299824,194700535,67470158,427524441,896977161,173204060,1032025898,471426602,1761992799,812669500,773641454,1393273734,1015090626,1178812595,324337808,1693536745,602523748,740513296]
B = [1467211249,2023087526,355513696,969067502,1665906300,1636576171,900499577,2018204737,830146030,1397040070,1524214254,784177727,1261490714,308426242,1245593976,641275112,1842369017,23764756,1017983890,70884180,626327552,205908971,1367183776,1366709325,2007169397,1494582461,1007218200,80257142,1790714110,1634774480,420829923,2066924824]


def hash_int_stages(i_expr, seed_col):
    """Spark XXH64.hashInt(i, seed) as stages; final alias: ib4."""
    st = [
        ("ih0", add64(seed_col, (P5 + 4) & MASK)),
        ("ig1", mul64(f"({i_expr})::UBIGINT", P1)),
        ("ig2", xor64("ih0", "ig1")),
        ("ig3", rot("ig2", 23)),
        ("ig4", mul64("ig3", P2)),
        ("ig5", add64("ig4", P3)),
        ("ia0", xor64("ig5", "ig5 >> 33")),
        ("ia1", mul64("ia0", P2)),
        ("ia2", xor64("ia1", "ia1 >> 29")),
        ("ia3", mul64("ia2", P3)),
        ("ib4", xor64("ia3", "ia3 >> 32")),
    ]
    return st


def minhash_oracle(bands=8, rows_per_band=4, max_bucket=200, thresh=0.5):
    ab = ", ".join(f"[{a}, {b}]" for a, b in zip(A, B))
    nh = len(A)
    bucket_st = hash_int_stages("sid % 8", "h")
    return f"""WITH RECURSIVE
corp AS (
  SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
dsh AS (
  SELECT id, list_distinct(list_transform(
      generate_series(1, greatest(len(toks) - 3, 0) + 1),
      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
  FROM corp),
shs AS (SELECT DISTINCT unnest(shingles) AS s FROM dsh),
shid AS (SELECT row_number() OVER (ORDER BY s) AS sid, s FROM shs),
{xxh64_cte('shid', 'sx', 42)},
doch AS (
  SELECT d.id, list_distinct(list({signed('x.h')})) AS xl0
  FROM (SELECT id, unnest(shingles) AS s FROM dsh) d
  JOIN sxdone x USING (s)
  GROUP BY d.id),
docx AS (
  SELECT id, list_transform(xl0,
      h -> ((h % 2147483647) + 2147483647) % 2147483647) AS xl
  FROM doch WHERE len(xl0) > 0),
sigs AS (
  SELECT id, list_transform([{ab}],
      p -> list_min(list_transform(xl, x -> (x * p[1] + p[2]) % 2147483647))) AS sig
  FROM docx),
bandstr AS (
  SELECT id * 8 + b AS sid,
         array_to_string(sig[4*b+1:4*b+4], ',') AS s
  FROM sigs, unnest(generate_series(0, {bands - 1})) AS t(b)),
{xxh64_cte('bandstr', 'bx', 42)},
buckets AS (
  {stages_sql(bucket_st, 'bxdone', ['sid', 'h'])}
),
banded AS (
  SELECT sid // 8 AS id, ib4 AS bucket FROM buckets),
oversized AS (
  SELECT bucket FROM banded GROUP BY bucket HAVING count(*) > {max_bucket}),
kept AS (
  SELECT b.id, b.bucket FROM banded b
  WHERE b.bucket NOT IN (SELECT bucket FROM oversized)),
pairs AS (
  SELECT DISTINCT a.id AS id_a, bb.id AS id_b
  FROM kept a JOIN kept bb ON a.bucket = bb.bucket AND a.id < bb.id),
scored AS (
  SELECT p.id_a, p.id_b,
    CAST(list_sum(list_transform(generate_series(1, {nh}),
        j -> CASE WHEN sa.sig[j] = sb.sig[j] THEN 1 ELSE 0 END)) AS DOUBLE) / {nh} AS est_jaccard
  FROM pairs p
  JOIN sigs sa ON sa.id = p.id_a
  JOIN sigs sb ON sb.id = p.id_b)
SELECT id_a, id_b, est_jaccard FROM scored
WHERE est_jaccard >= {thresh}
ORDER BY id_a, id_b"""


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark_out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r3b01/dd_minhash.parquet"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    q = minhash_oracle()
    exp = con.sql(q).df()
    got = con.sql(f"SELECT * FROM '{spark_out}/*.parquet' ORDER BY id_a, id_b").df()
    print(f"oracle rows={len(exp)} spark rows={len(got)}")
    import pandas as pd
    e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    g = got[exp.columns.tolist()].sort_values(list(exp.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False)
        print("MATCH")
    except AssertionError as ex:
        print("MISMATCH:", str(ex)[:1500])
        print("spark head:\n", g.head(10))
        print("oracle head:\n", e.head(10))
        sys.exit(1)
