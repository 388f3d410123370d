#!/usr/bin/env python3
"""Prototype: XXH64(utf8(s), seed) as a single-statement DuckDB SQL CTE
chain (no macros, no UDFs) — the building block for the dd_minhash /
dd_simhash oracles. Validates against the python reference over the real
sf0.01 shingle corpus plus edge cases. The final SQL template is ported to
Oracles.scala once green."""
import sys
import duckdb
sys.path.insert(0, '/root/repo/tools')
from xxh64_ref import xxh64

M64 = "18446744073709551616"
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
MASK = (1 << 64) - 1


def mul64(a, b):
    ah, bh = f"({a}::HUGEINT)", f"({b}::HUGEINT)"
    return (f"CAST((({ah} % 4294967296) * ({bh} % 4294967296) + "
            f"((({ah} // 4294967296) * ({bh} % 4294967296) + "
            f"({ah} % 4294967296) * ({bh} // 4294967296)) % 4294967296) * 4294967296) "
            f"% {M64} AS UBIGINT)")


def add64(a, b):
    return f"CAST((({a}::HUGEINT + {b}::HUGEINT) % {M64}) AS UBIGINT)"


def rot(a, r):
    # a MUST be a short alias/column name (referenced twice)
    return (f"CAST((({a}::HUGEINT * {1 << r}) % {M64} + ({a} >> {64 - r})) "
            f"AS UBIGINT)")


def xor64(a, b):
    return f"xor({a}, {b})"


def u64le(by, off0):
    """8-byte little-endian word from 1-based UBIGINT byte list `by`,
    0-based byte offset expression off0 (text)."""
    terms = [f"{by}[({off0}) + {j + 1}] * {1 << (8 * j)}::UBIGINT"
             for j in range(8)]
    return "(" + " + ".join(terms) + ")"


def u32le(by, off0):
    terms = [f"{by}[({off0}) + {j + 1}] * {1 << (8 * j)}::UBIGINT"
             for j in range(4)]
    return "(" + " + ".join(terms) + ")"


import re


def stages_sql(stages, from_clause, keep):
    """Nested-subquery staging: DuckDB inlines lateral aliases by
    substitution (binder depth explodes), so each dependency level becomes
    its own subquery projection. Stages are auto-leveled: a stage goes one
    level above the deepest stage it references."""
    level_of = {}
    levels = []
    for n, e in stages:
        deps = [level_of[m] for m in level_of
                if re.search(r"\b" + re.escape(m) + r"\b", e)]
        lv = (max(deps) + 1) if deps else 0
        level_of[n] = lv
        while len(levels) <= lv:
            levels.append([])
        levels[lv].append((n, e))
    sql = f"SELECT {', '.join(keep)} FROM {from_clause}"
    for lv in levels:
        defs = ",\n      ".join(f"{e} AS {n}" for n, e in lv)
        sql = f"SELECT *,\n      {defs}\n    FROM (\n    {sql}\n    ) "
    return sql


def xxh64_cte(src, pre, seed):
    """CTE chain computing h = XXH64(utf8(s), seed) for rows (sid, s) of
    CTE `src`. All CTE names prefixed with `pre`. Final CTE: {pre}done
    with columns (sid, s, h UBIGINT)."""
    v1i = (seed + P1 + P2) & MASK
    v2i = (seed + P2) & MASK
    v3i = seed & MASK
    v4i = (seed - P1) & MASK
    h_small = (seed + P5) & MASK

    # --- byte prep ---
    prep = f"""{pre}prep AS (
  SELECT sid, s,
    octet_length(encode(s)) AS n,
    list_transform(generate_series(1, octet_length(encode(s))),
      i -> (strpos('0123456789ABCDEF', substr(hex(encode(s)), 2*i-1, 1)) * 16
          + strpos('0123456789ABCDEF', substr(hex(encode(s)), 2*i, 1)) - 17)::UBIGINT) AS by
  FROM {src}
)"""

    # --- stripe recursion (len >= 32) ---
    # lane extraction + 4 rounds per iteration, staged via lateral aliases
    # in a subquery (recursive member keeps fixed arity).
    rounds = []
    for lane in range(4):
        off = f"32*(i) + {8 * lane}"
        rounds += [
            (f"l{lane}", u64le("by", off)),
            (f"t{lane}a", mul64(f"l{lane}", P2)),
            (f"t{lane}b", add64(f"v{lane + 1}", f"t{lane}a")),
            (f"t{lane}c", rot(f"t{lane}b", 31)),
            (f"v{lane + 1}n", mul64(f"t{lane}c", P1)),
        ]
    rec = f"""{pre}rec AS (
  SELECT sid, n, by, n // 32 AS ns, 0 AS i,
         {v1i}::UBIGINT AS v1, {v2i}::UBIGINT AS v2,
         {v3i}::UBIGINT AS v3, {v4i}::UBIGINT AS v4
  FROM {pre}prep
  UNION ALL
  SELECT sid, n, by, ns, i + 1, v1n, v2n, v3n, v4n FROM (
    {stages_sql(rounds, f"{pre}rec WHERE i < ns",
                ["sid", "n", "by", "ns", "i", "v1", "v2", "v3", "v4"])}
  ) q
)"""

    # --- converge + tail, one big lateral-alias SELECT ---
    st = []
    # stripe merge (garbage when ns=0; CASE picks h_small then)
    st += [("r1", rot("v1", 1)), ("r2", rot("v2", 7)),
           ("r3", rot("v3", 12)), ("r4", rot("v4", 18))]
    st += [("m0a", add64("r1", "r2")), ("m0b", add64("m0a", "r3")),
           ("m0c", add64("m0b", "r4"))]
    h = "m0c"
    for i in range(1, 5):
        st += [(f"mr{i}a", mul64(f"v{i}", P2)),
               (f"mr{i}b", rot(f"mr{i}a", 31)),
               (f"mr{i}c", mul64(f"mr{i}b", P1)),
               (f"mr{i}d", xor64(h, f"mr{i}c")),
               (f"mr{i}e", mul64(f"mr{i}d", P1)),
               (f"mr{i}f", add64(f"mr{i}e", P4))]
        h = f"mr{i}f"
    st += [("h0", f"CASE WHEN ns = 0 THEN {h_small}::UBIGINT ELSE {h} END")]
    st += [("h1", add64("h0", "n::UBIGINT"))]
    # tail words: nw in 0..3 at 0-based pos 32*ns
    st += [("tp", "32 * ns"), ("nw", "(n - 32 * ns) // 8")]
    h = "h1"
    for w in range(3):
        st += [(f"w{w}", u64le("by", f"tp + {8 * w}")),
               (f"w{w}a", mul64(f"w{w}", P2)),
               (f"w{w}b", rot(f"w{w}a", 31)),
               (f"w{w}c", mul64(f"w{w}b", P1)),
               (f"w{w}d", xor64(h, f"w{w}c")),
               (f"w{w}e", rot(f"w{w}d", 27)),
               (f"w{w}f", mul64(f"w{w}e", P1)),
               (f"w{w}g", add64(f"w{w}f", P4)),
               (f"h{2 + w}", f"CASE WHEN nw >= {w + 1} THEN w{w}g ELSE {h} END")]
        h = f"h{2 + w}"
    # 4-byte step
    st += [("fp", "tp + 8 * nw"), ("has4", "(n - tp - 8 * nw) >= 4")]
    st += [("f0", u32le("by", "fp")),
           ("f0a", mul64("f0", P1)),
           ("f0b", xor64(h, "f0a")),
           ("f0c", rot("f0b", 23)),
           ("f0d", mul64("f0c", P2)),
           ("f0e", add64("f0d", P3)),
           ("h5", f"CASE WHEN has4 THEN f0e ELSE {h} END")]
    h = "h5"
    # byte steps: nb in 0..3 at pos fp + (has4 ? 4 : 0)
    st += [("bp", "fp + CASE WHEN has4 THEN 4 ELSE 0 END")]
    st += [("nb", "n - bp")]
    for b in range(3):
        st += [(f"b{b}", f"by[bp + {b} + 1]"),
               (f"b{b}a", mul64(f"b{b}", P5)),
               (f"b{b}b", xor64(h, f"b{b}a")),
               (f"b{b}c", rot(f"b{b}b", 11)),
               (f"b{b}d", mul64(f"b{b}c", P1)),
               (f"h{6 + b}", f"CASE WHEN nb >= {b + 1} THEN b{b}d ELSE {h} END")]
        h = f"h{6 + b}"
    # avalanche
    st += [("a0", xor64(h, f"{h} >> 33")),
           ("a1", mul64("a0", P2)),
           ("a2", xor64("a1", "a1 >> 29")),
           ("a3", mul64("a2", P3)),
           ("a4", xor64("a3", "a3 >> 32"))]
    tail = f"""{pre}tail AS (
  {stages_sql(st, f"{pre}rec WHERE i = ns", ["sid", "n", "by", "ns", "i", "v1", "v2", "v3", "v4"])}
)"""
    done = f"""{pre}done AS (
  SELECT p.sid, p.s, t.a4 AS h
  FROM {pre}prep p JOIN {pre}tail t USING (sid)
)"""
    return ",\n".join([prep, rec, tail, done])


def signed(col):
    return (f"CAST(CASE WHEN {col} >= 9223372036854775808::UBIGINT "
            f"THEN {col}::HUGEINT - {M64} ELSE {col}::HUGEINT END AS BIGINT)")


if __name__ == "__main__":
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.01/documents.parquet'")
    # corpus shingles + edge strings covering every code path
    edges = ["", "a", "abcd", "abcdefg", "abcdefgh", "0123456789abcde",
             "0123456789abcdef", "0123456789abcdefg",
             "x" * 31, "x" * 32, "x" * 33, "x" * 39, "x" * 40, "x" * 43,
             "x" * 63, "x" * 64, "x" * 71, "x" * 100,
             "héllo wörld 中文",
             "1234567890,987654321,111222333,444555666"]
    edge_sql = " UNION ALL ".join(
        f"SELECT {1000000 + i} AS sid, '{s}' AS s"
        for i, s in enumerate(edges) if "'" not in s)
    q = f"""WITH RECURSIVE
corp AS (
  SELECT row_number() OVER () AS sid, s FROM (
    SELECT DISTINCT unnest(list_transform(
        generate_series(1, greatest(len(t) - 3, 0) + 1),
        i -> array_to_string(t[i:i+2], ' '))) AS s
    FROM (SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
          FROM documents WHERE text IS NOT NULL AND trim(text) <> '') d)
  UNION ALL
  {edge_sql}
),
{xxh64_cte('corp', 'xx', 42)}
SELECT sid, s, {signed('h')} AS h FROM xxdone"""
    rows = con.sql(q).fetchall()
    bad = 0
    for sid, s, h in rows:
        exp = xxh64(s.encode(), 42)
        exp_s = exp - (1 << 64) if exp >= (1 << 63) else exp
        if h != exp_s:
            bad += 1
            if bad <= 5:
                print(f"MISMATCH sid={sid} s={s!r} sql={h} ref={exp_s}")
    print(f"{len(rows)} strings checked, {bad} mismatches")
    sys.exit(1 if bad else 0)
