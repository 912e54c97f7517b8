#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query output
written by `graft.Verify <sfDir> <outDir>`, run the corresponding oracle SQL
from oracle_sql.json in DuckDB over the same parquet tables and compare.

Usage: python3 tools/duckcheck.py <sfDir> <outDir>

Comparison: sort columns by name, sort rows by all columns, compare values
exactly (with a small float tolerance reported separately so we can see
whether a mismatch is catastrophic or a last-ulp issue).
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_class(t):
    """Collapse a DuckDB type to the class a value-hash would see.

    The driver's gate hashes typed values (round-8 lesson: DuckDB types
    SUM(integer) as HUGEINT = int128, which hashes differently from Spark's
    BIGINT even when the numbers are equal — q_tpch_q12 was red on the driver
    while this script said OK). Integer widths up to 64 bits all surface as
    plain ints; HUGEINT and DECIMAL do not, so they get their own classes.
    """
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s in ("VARCHAR", "JSON"):
        # DuckDB's JSON type surfaces as a string to any value hash (the
        # driver passed q_json_generate green in round 8 with VARCHAR vs JSON)
        return "str"
    return s


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def key(row):
    return tuple("\x00None" if v is None else str(v) for v in row)


def compare(name, got_rows, got_cols, exp_rows, exp_cols,
            got_types=None, exp_types=None):
    if sorted(got_cols) != sorted(exp_cols):
        return f"SCHEMA MISMATCH got={sorted(got_cols)} exp={sorted(exp_cols)}"
    # reorder columns by name
    gidx = [got_cols.index(c) for c in sorted(got_cols)]
    eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
    if got_types is not None and exp_types is not None:
        bad_types = []
        for gi, ei in zip(gidx, eidx):
            gc, ec = type_class(got_types[gi]), type_class(exp_types[ei])
            if gc != ec:
                bad_types.append(
                    f"{got_cols[gi]}: spark={got_types[gi]}({gc}) "
                    f"oracle={exp_types[ei]}({ec})")
        if bad_types:
            return "TYPE MISMATCH " + "; ".join(bad_types)
    g = sorted([tuple(norm(r[i]) for i in gidx) for r in got_rows], key=key)
    e = sorted([tuple(norm(r[i]) for i in eidx) for r in exp_rows], key=key)
    if len(g) != len(e):
        return f"ROWCOUNT MISMATCH got={len(g)} exp={len(e)}"
    exact = g == e
    if exact:
        return "OK"
    # check approx equality for floats
    n_bad = 0
    example = None
    for rg, re_ in zip(g, e):
        for vg, ve in zip(rg, re_):
            same = vg == ve
            if not same and isinstance(vg, float) and isinstance(ve, float):
                same = abs(vg - ve) <= 1e-9 * max(1.0, abs(vg), abs(ve))
            if not same:
                n_bad += 1
                if example is None:
                    example = (vg, ve)
                break
    if n_bad == 0:
        # The driver gate hashes values EXACTLY — a last-ulp float divergence
        # fails there, so it must fail here too (round-5 lesson: this line
        # used to say "OK(approx)" and let q_corpus_report slip through).
        return "FAIL(approx-only) — values equal within 1e-9 but exact hash differs"
    return f"VALUE MISMATCH rows={n_bad}/{len(g)} example={example}"


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            results[name] = "NO OUTPUT"
            continue
        rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        got_rows, got_cols, got_types = rel.fetchall(), rel.columns, rel.types
        if name not in oracles:
            results[name] = f"rows-only: {len(got_rows)} rows" + (" (EMPTY!)" if not got_rows else "")
            continue
        try:
            orel = con.sql(oracles[name])
            exp_rows, exp_cols, exp_types = orel.fetchall(), orel.columns, orel.types
        except Exception as ex:
            results[name] = f"ORACLE SQL ERROR: {ex}"
            continue
        results[name] = compare(name, got_rows, got_cols, exp_rows, exp_cols,
                                got_types, exp_types)
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
    for k, v in results.items():
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
