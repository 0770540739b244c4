#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle check.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet dir written by graft.Verify, runs the oracle
SQL from oracle_sql.json in DuckDB over views named after the sfDir
tables, and compares: row count, column names (sorted), and values
(sorted by all columns after sorting columns by name).

Additionally runs a TYPE AUDIT (r11, the d18 lesson): the driver's
hash comparator is type-sensitive, so a DuckDB HUGEINT (uncast integer
SUM) or DECIMAL column whose Spark twin is BIGINT/DOUBLE matches rows
and values here but hash-mismatches at the driver. Any physical-class
divergence between the Spark output column and the oracle column is
reported as TYPE and counted as a failure.
"""
import sys, json, glob, os
import decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Normalize to a sortable, cross-type-comparable tuple."""
    if v is None:
        return (0, "", "")
    if isinstance(v, bool):
        return (1, "bool", str(v))
    if isinstance(v, (int, float, decimal.Decimal)):
        return (1, "num", round(float(v), 9))
    return (1, type(v).__name__, str(v))


def type_class(arrow_type):
    """Bucket an arrow type the way a type-sensitive hasher would.

    int8..int64 all hash alike after widening in practice, but DuckDB's
    HUGEINT (int128 / decimal(38,0)) and DECIMAL sums do NOT — they are
    exactly the d18 failure class. Keep int128/decimal distinct from
    int64 and float64 so the audit flags them."""
    import pyarrow as pa
    t = str(arrow_type)
    if t.startswith("decimal"):
        return t  # exact: decimal(38,0) vs int64 must flag
    if pa.types.is_integer(arrow_type):
        return "int64"
    if pa.types.is_floating(arrow_type):
        return "float64"
    if pa.types.is_boolean(arrow_type):
        return "bool"
    if pa.types.is_string(arrow_type) or pa.types.is_large_string(arrow_type):
        return "string"
    if pa.types.is_date(arrow_type):
        return "date"
    if pa.types.is_timestamp(arrow_type):
        return "timestamp"
    return t


def type_mismatches(got, exp):
    """Column-name-aligned physical-class diffs between Spark and oracle."""
    g = {n: type_class(f.type) for n, f in zip(got.column_names, got.schema)}
    e = {n: type_class(f.type) for n, f in zip(exp.column_names, exp.schema)}
    return [(n, g[n], e[n]) for n in sorted(set(g) & set(e)) if g[n] != e[n]]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    # Static d18-class sweep: DESCRIBE every oracle and flag HUGEINT /
    # DECIMAL output columns up front — these hash-diverge at the driver
    # even when the runtime audit below happens to see matching values
    # (e.g. a filtered Verify run that skips the query).
    n_hazard = 0
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:
            continue  # the per-query run below reports oracle errors
        for col, typ, *_ in desc:
            if typ in ("HUGEINT", "INT128") or typ.startswith("DECIMAL"):
                print(f"HAZARD {name}: oracle column {col} is {typ} — "
                      f"cast to BIGINT/DOUBLE in BOTH sides")
                n_hazard += 1
    if n_hazard:
        print(f"-- {n_hazard} static type hazards --")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no output parquet")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        got_cols = sorted(got.column_names)
        got_rows = sorted(
            tuple(norm(r[c]) for c in got_cols) for r in got.to_pylist())
        if name not in oracles:
            status = "ROWS " if len(got_rows) > 0 else "FAIL "
            print(f"{status} {name}: rows={len(got_rows)} (no oracle)")
            n_rowsonly += 1 if got_rows else 0
            n_fail += 0 if got_rows else 1
            continue
        try:
            exp = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        exp_cols = sorted(exp.column_names)
        exp_rows = sorted(
            tuple(norm(r[c]) for c in exp_cols) for r in exp.to_pylist())
        if got_cols != exp_cols:
            print(f"FAIL  {name}: cols {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            diff = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e][:3]
            print(f"FAIL  {name}: rows {len(got_rows)} vs {len(exp_rows)}; first diffs: {diff}")
            n_fail += 1
        elif (tm := type_mismatches(got, exp)):
            print(f"TYPE  {name}: values match but physical types diverge "
                  f"(spark vs oracle): {tm} — driver hash would mismatch")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(got_rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail, "
          f"{n_hazard} type hazards")
    return 1 if (n_fail or n_hazard) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
