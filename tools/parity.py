#!/usr/bin/env python3
"""Local oracle-parity harness, mimicking the driver's correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
parquet tables in <sfDir>, sorts columns by name and rows by all columns, and
compares cell-by-cell. Exits nonzero if any query mismatches.
"""
import sys, json, glob, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t)), \
           [cols[i] for i in order]

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            if a == b:
                return True
            if a is None or b is None:
                return False
            return math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except (TypeError, ValueError):
            return False
    return a == b or str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)")
            failures.append(name)
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols = list(spark_rel.columns)
            stypes = [str(t) for t in spark_rel.types]
            srows = spark_rel.fetchall()
            orel = con.sql(sql)
            ocols = list(orel.columns)
            otypes = [str(t) for t in orel.types]
            orows = orel.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            failures.append(name)
            continue
        s_sorted, s_c = canon(srows, scols)
        o_sorted, o_c = canon(orows, ocols)
        if s_c != o_c:
            print(f"SCHEMA   {name}: spark={s_c} oracle={o_c}")
            failures.append(name)
            continue
        # Typed comparison: the driver hashes TYPED values, so an oracle
        # column whose DuckDB type drifts from the Spark parquet type
        # (HUGEINT from an uncast sum(), DECIMAL, INT32 vs INT64) is a
        # hash mismatch even when every cell compares equal.
        s_t = {c: t for c, t in zip(scols, stypes)}
        o_t = {c: t for c, t in zip(ocols, otypes)}
        drift = [(c, s_t[c], o_t[c]) for c in s_c if s_t[c] != o_t[c]]
        if drift:
            print(f"TYPE     {name}: " + ", ".join(
                f"{c}: spark={st} oracle={ot}" for c, st, ot in drift))
            failures.append(name)
            continue
        if len(s_sorted) != len(o_sorted):
            print(f"ROWS     {name}: spark={len(s_sorted)} oracle={len(o_sorted)}")
            failures.append(name)
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
            for j, (sv, ov) in enumerate(zip(sr, orow)):
                if not cells_equal(sv, ov):
                    bad = (i, s_c[j], sv, ov)
                    break
            if bad:
                break
        if bad:
            print(f"VALUE    {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            failures.append(name)
        else:
            print(f"PASS     {name} ({len(s_sorted)} rows)")
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} pass")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
