#!/usr/bin/env python3
"""Cross-engine fuzz: random strings (unicode incl. uppercase chars with
ASCII lowercase, punctuation, empties) through graft's portable hash
expressions in Spark (via GraftExtensions SQL) and the DuckDB oracle
formulations. 153/153 non-empty agreement as of round 2 (the empty string
is excluded: it hits DuckDB's string_split('','') edge in the RAW char-fold
fragment only; no oracle query reaches it because token lists come from
regexp_extract_all and the media checksum is length-guarded).

Usage: python3 tools/fuzz_parity.py   (needs sbt compile first)
"""
import random
import subprocess

import duckdb

random.seed(42)
# includes uppercase characters whose *full-Unicode* lowercase is ASCII
# (Kelvin K U+212A -> 'k', dotted I U+0130) \u2014 these catch any drift from
# the engine's declared ASCII-only folding contract (translate, not lower)
ALPHABET = list("abc XYZ 019 .,;!?-_'\"\t\n\u00e9\u00fc\u4e2d\u6587"
                "\U0001F600\u212a\u0130\u00c9\u00dc")


def main():
    strs = ["", "a", "   ", "hello world"] + [
        "".join(random.choice(ALPHABET) for _ in range(random.randint(1, 60)))
        for _ in range(150)]

    def esc(s):
        return "'" + (s.replace("\\", "\\\\").replace("'", "\\'")
                      .replace("\n", "\\n").replace("\t", "\\t")) + "'"

    values = ",\n".join(f"({i}, {esc(s)})" for i, s in enumerate(strs))
    # BPE-style pretokenizer (text_bpe_tokens): explicit ASCII classes so
    # Java regex (Spark) and RE2 (DuckDB) must agree codepoint-for-
    # codepoint; the fuzz hunts divergence on mixed unicode input
    bpe_spark = (
        "aggregate(transform(regexp_extract_all(translate(s, "
        "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), "
        "'[a-z]+|[0-9]+|[.,;:!?()/_-]+', 0), tk -> char_fold_hash(tk)), "
        "0L, (a, h) -> pmod(a * 31 + h, 2147483647L))")
    n_pieces_spark = (
        "size(regexp_extract_all(translate(s, "
        "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), "
        "'[a-z]+|[0-9]+|[.,;:!?()/_-]+', 0))")
    sql = (f"CREATE TEMPORARY VIEW t AS SELECT * FROM VALUES {values} "
           "AS t(id, s);\n"
           "SELECT id, char_fold_hash(s), doc_fingerprint(s), simhash32(s), "
           f"{bpe_spark}, {n_pieces_spark} "
           "FROM t ORDER BY id;")
    open("/tmp/graft_fuzz.sql", "w").write(sql)
    out = subprocess.run(
        ["/opt/spark/bin/spark-sql", "--master", "local[2]",
         "--conf", "spark.sql.extensions=graft.GraftExtensions",
         "--driver-class-path", "target/scala-2.13/classes",
         "-S", "-f", "/tmp/graft_fuzz.sql"],
        capture_output=True, text=True)
    spark_rows = {}
    for line in out.stdout.splitlines():
        parts = line.split("\t")
        if len(parts) == 6 and parts[0].isdigit():
            spark_rows[int(parts[0])] = tuple(int(x) for x in parts[1:])

    con = duckdb.connect()
    # ASCII-only fold via translate — the tokenizer contract; full-Unicode
    # lower() would fold e.g. U+212A to 'k' and diverge from the engine
    tok_hash = ("list_transform(regexp_extract_all("
                "translate(s, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
                "'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+'), "
                "t -> list_reduce(list_prepend(CAST(0 AS BIGINT), "
                "list_transform(string_split(t, ''), "
                "ch -> CAST(ord(ch) AS BIGINT))), "
                "(h, c) -> (h * 31 + c) % 2147483647))")
    char_fold = ("list_reduce(list_prepend(CAST(0 AS BIGINT), "
                 "list_transform(string_split(s, ''), "
                 "ch -> CAST(ord(ch) AS BIGINT))), "
                 "(h, c) -> (h * 31 + c) % 2147483647)")
    simhash = ("list_sum(list_transform(generate_series(0, 31), b -> "
               "CASE WHEN list_sum(list_transform(th, x -> "
               "CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
               "THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))")
    fp = ("CASE WHEN len(th) >= 3 THEN list_min(list_transform("
          "generate_series(1, len(th) - 2), i -> "
          "((th[i] * 31 + th[i+1]) * 31 + th[i+2]) % 2147483647)) "
          "ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), th), "
          "(a, b) -> a * 31 + b) % 2147483647 END")
    bpe_duck = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(pieces, tk -> "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(tk, ''), "
        "ch -> CAST(ord(ch) AS BIGINT))), "
        "(a, c) -> (a * 31 + c) % 2147483647))), "
        "(a, h) -> (a * 31 + h) % 2147483647)")
    pieces_duck = (
        "regexp_extract_all(translate(s, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
        "'abcdefghijklmnopqrstuvwxyz'), '[a-z]+|[0-9]+|[.,;:!?()/_-]+')")
    mism = 0
    for i, s in enumerate(strs):
        con.execute("CREATE OR REPLACE TEMP TABLE one AS SELECT ? AS s", [s])
        cf, = con.execute(
            f"SELECT coalesce({char_fold}, 0) FROM one").fetchone()
        th_fp, th_sh = con.execute(
            f"WITH h AS (SELECT {tok_hash} AS th FROM one) "
            f"SELECT coalesce({fp},0), coalesce({simhash},0) FROM h"
        ).fetchone()
        bpe, npc = con.execute(
            f"WITH p AS (SELECT {pieces_duck} AS pieces FROM one) "
            f"SELECT coalesce({bpe_duck}, 0), len(pieces) FROM p"
        ).fetchone()
        if spark_rows.get(i) != (cf, th_fp, th_sh, bpe, npc) and s != "":
            mism += 1
            if mism <= 5:
                print(f"MISMATCH id={i} s={s!r} "
                      f"spark={spark_rows.get(i)} "
                      f"duck={(cf, th_fp, th_sh, bpe, npc)}")
    print(f"{len(strs) - 1 - mism}/{len(strs) - 1} non-empty strings agree")
    return 1 if mism else 0


def fuzz_log2fp():
    """log2_fp parity: the codegen expression (via GraftExtensions SQL)
    vs the DuckDB list_reduce mirror (the FixedLog2.sql fold, duplicated
    here on purpose — the fuzz guards the TEXTS agreeing, incl. across
    DuckDB upgrades that might change lambda-vectorization semantics; see
    FixedLog2.scala for the two DuckDB 1.0 bugs the fold shape avoids).
    """
    xs = ([1, 2, 3, 4, 7, 1023, 1024, 1025, (1 << 31) - 1, 1 << 31,
           (1 << 62) - 1] +
          [random.randint(1, 1 << (3 + random.randint(0, 58)))
           for _ in range(500)])
    values = ",\n".join(f"({i}, CAST({x} AS BIGINT))"
                        for i, x in enumerate(xs))
    sql = (f"CREATE TEMPORARY VIEW lt AS SELECT * FROM VALUES {values} "
           "AS lt(id, x);\n"
           "SELECT id, log2_fp(x) FROM lt ORDER BY id;")
    open("/tmp/graft_fuzz_log2.sql", "w").write(sql)
    out = subprocess.run(
        ["/opt/spark/bin/spark-sql", "--master", "local[2]",
         "--conf", "spark.sql.extensions=graft.GraftExtensions",
         "--driver-class-path", "target/scala-2.13/classes",
         "-S", "-f", "/tmp/graft_fuzz_log2.sql"],
        capture_output=True, text=True)
    spark_rows = {}
    for line in out.stdout.splitlines():
        parts = line.split("\t")
        if len(parts) == 2 and parts[0].isdigit():
            spark_rows[int(parts[0])] = int(parts[1])

    con = duckdb.connect()
    il = "(length(bin(x)) - 1)"
    fold = f"""
(list_reduce(list_prepend(
  {{'f': CAST({il} AS BIGINT),
   'u': CASE WHEN {il} <= 30 THEN x << (30 - {il})
             ELSE x >> ({il} - 30) END}},
  list_transform(range(20),
    i -> {{'f': CAST(0 AS BIGINT), 'u': CAST(0 AS BIGINT)}})),
  (a, e) -> {{'f': a.f * 2 + ((a.u * a.u) >> 61),
             'u': ((a.u * a.u) >> 30) // (1 + ((a.u * a.u) >> 61))}})).f
"""
    vals = ",".join(f"({i}, CAST({x} AS BIGINT))"
                    for i, x in enumerate(xs))
    duck = dict(con.execute(
        f"SELECT id, {fold} FROM (SELECT * FROM (VALUES {vals}) "
        "AS t(id, x))").fetchall())
    mism = sum(1 for i in range(len(xs)) if spark_rows.get(i) != duck[i])
    print(f"log2_fp: {len(xs) - mism}/{len(xs)} agree")
    return 1 if mism else 0


if __name__ == "__main__":
    raise SystemExit(main() | fuzz_log2fp())
