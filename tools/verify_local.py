#!/usr/bin/env python3
"""Local differential harness mimicking the driver's DuckDB-oracle check.

Usage: python3 tools/verify_local.py [sfDir] [outDir] [--skip-spark]

Runs graft.Verify via sbt (unless --skip-spark and outDir already has
results), then for each query: executes the oracle SQL in DuckDB over views
of the testdata parquet and compares (sorted columns, sorted rows) with
exact equality, reporting per-query PASS/FAIL and first diffs.

Driver-side tooling only — never imported by the Scala library.
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # Decimal vs float vs numpy scalars: compare by canonical repr.
    # Decimals compare EXACTLY (string form, scale-sensitive) — the driver's
    # content hash is stricter than float collapse (round-1 finding: 22
    # decimal-output queries passed locally but failed the driver hash).
    import decimal
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("num", v)
    if hasattr(v, "item"):
        v = v.item()
        return norm_cell(v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort(key=lambda t: tuple((str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    if "--skip-spark" not in sys.argv:
        r = subprocess.run(
            ["sbt", f'runMain graft.Verify {sf} {out}'],
            capture_output=True, text=True, cwd="/root/repo")
        if r.returncode != 0:
            print(r.stdout[-4000:]); print(r.stderr[-4000:])
            sys.exit(1)
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.loads((out / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = out / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
            g_cols, g_rows = canon(got.fetchall(), got.columns)
            exp = con.sql(oracle[name])
            e_cols, e_rows = canon(exp.fetchall(), exp.columns)
        except Exception as ex:
            print(f"FAIL {name}: {ex}"); n_fail += 1; continue
        if g_cols != e_cols:
            print(f"FAIL {name}: cols spark={g_cols} oracle={e_cols}")
            n_fail += 1; continue
        # Type-strict: the driver hashes typed values, so an oracle column
        # whose DuckDB type differs from the Spark parquet's (count_if →
        # HUGEINT vs Spark LongType, round-2 q39 finding) fails the driver
        # even when Python-level values compare equal.
        # Integer WIDTH is tolerated (q10's Spark row_number INT vs DuckDB
        # BIGINT has always driver-passed) — both sides arrive as arrow
        # ints. HUGEINT is NOT an int to arrow (decimal128 export), so it
        # stays its own family and gets flagged.
        _intw = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
        def fam(t):
            return "int" if t in _intw else t
        g_types = dict(zip(got.columns, (fam(str(t)) for t in got.types)))
        e_types = dict(zip(exp.columns, (fam(str(t)) for t in exp.types)))
        tbad = {c: (g_types[c], e_types[c]) for c in g_types
                if g_types[c] != e_types[c]}
        if tbad:
            print(f"FAIL {name}: column types differ (spark, oracle): {tbad}")
            n_fail += 1; continue
        # WIDTH parity (c15 r07 lesson): same int family but different
        # exact widths between the Spark parquet and the oracle result is
        # the class the driver hash flagged on c15 while value equality
        # held. Warn (don't fail) so new queries ship with matching casts.
        g_exact = dict(zip(got.columns, (str(t) for t in got.types)))
        e_exact = dict(zip(exp.columns, (str(t) for t in exp.types)))
        wbad = {c: (g_exact[c], e_exact[c]) for c in g_exact
                if g_exact[c] != e_exact[c]}
        if wbad:
            print(f"WARN {name}: width/render differs (spark, oracle): {wbad}")
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rowcount spark={len(g_rows)} oracle={len(e_rows)}")
            n_fail += 1; continue
        bad = [(a, b) for a, b in zip(g_rows, e_rows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(g_rows)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
