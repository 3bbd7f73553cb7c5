"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB against the same sf dir, then compares row count, column names, and
values (rows sorted by all columns; exact equality for non-floats, exact
equality for floats too — our determinism contract says they must match
bit-for-bit; a tolerance flag exists for diagnosis only).

Usage: python tools/check_oracle.py [--driver-sim] [sf_dir] [query ...]

``--driver-sim`` checks exactly the first 50 names ``queries()`` yields —
i.e. precisely the set the next driver round will check (the driver runs
queries in dict order with a ~50-row cap) — so rotation surprises surface
locally before the round lands.
"""

from __future__ import annotations

import math
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from data_engineering_etl_self_service_spark import get_spark
from data_engineering_etl_self_service_spark.catalog import TABLES
from data_engineering_etl_self_service_spark.queries import ORACLES, QUERIES, queries

DRIVER_CAP = 50  # the driver checks this many queries() entries per round


def canon(rows, cols):
    def key(r):
        return tuple("\x00" if v is None else str(v) for v in r)

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(out, key=key), [cols[i] for i in idx]


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)


def main() -> int:
    argv = list(sys.argv[1:])
    driver_sim = "--driver-sim" in argv
    if driver_sim:
        argv.remove("--driver-sim")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    if driver_sim:
        names = list(queries())[:DRIVER_CAP]
        print(f"driver-sim: first {len(names)} rotation names:")
        for n in names:
            print(f"  {n}")
    else:
        names = argv[1:] or list(QUERIES)

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_noracle = 0
    for name in names:
        fn = QUERIES[name]
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"skip  {name}: no oracle (rows-only) — spark rows={len(srows)}")
            n_noracle += 1
            continue
        try:
            res = con.execute(ORACLES[name])
            otab = res.arrow()
            ocols = otab.schema.names
            orows = [
                tuple(otab.column(i)[j].as_py() for i in range(otab.num_columns))
                for j in range(otab.num_rows)
            ]
        except Exception:
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc()
            n_fail += 1
            continue
        # Type audit: the driver's value hash is type-sensitive.
        # Round-1 lesson: DuckDB SUM(BIGINT) -> HUGEINT -> decimal128 in
        # Arrow, hashing differently from Spark's int64 even when values
        # match. Round-2 lessons: (a) DuckDB floor()/ceiling() of DOUBLE
        # returns DOUBLE where Spark returns BIGINT — `123.0` vs `123`
        # hash apart; (b) the driver hashes output cells with a pandas
        # hasher that dies on list/struct values, so nested output columns
        # are a contract violation on EITHER side. Compare type *families*
        # per column name and fail fast on any cross-family pair.
        try:
            bad_type = False
            stab_schema = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}

            def family(t: str) -> str:
                t = t.lower()
                if t.startswith(("list", "large_list", "fixed_size_list", "array")):
                    return "nested"
                if t.startswith(("struct", "map")):
                    return "nested"
                if t.startswith("decimal"):
                    return "decimal"
                if t in ("float", "double", "halffloat") or t.startswith("float"):
                    return "float"
                if t in ("tinyint", "smallint", "int", "bigint") or t.startswith(
                    ("int", "uint")
                ):
                    return "int"
                if t in ("bool", "boolean"):
                    return "bool"
                if t.startswith(("string", "large_string", "utf8", "varchar")):
                    return "string"
                if t.startswith("date"):
                    return "date"
                if t.startswith("timestamp"):
                    return "timestamp"
                if t.startswith(("binary", "large_binary")):
                    return "binary"
                return t

            for sname, stype in stab_schema.items():
                if family(stype) == "nested":
                    print(
                        f"TYPE  {name}: spark col {sname} is {stype} — the "
                        f"driver hasher cannot hash nested values; serialize "
                        f"(array_join) or explode"
                    )
                    bad_type = True
            for fld in otab.schema:
                dt = str(fld.type)
                sp = stab_schema.get(fld.name)
                ofam = family(dt)
                if ofam == "nested":
                    print(
                        f"TYPE  {name}: oracle col {fld.name} is {dt} — "
                        f"serialize (array_to_string) or unnest"
                    )
                    bad_type = True
                    continue
                if sp is None:
                    continue
                sfam = family(sp)
                if ofam != sfam:
                    hint = (
                        "cast the oracle aggregate"
                        if ofam == "decimal"
                        else "cast one side so the families match"
                    )
                    print(
                        f"TYPE  {name}: oracle col {fld.name} is {dt} "
                        f"({ofam}) but spark is {sp} ({sfam}) — {hint}"
                    )
                    bad_type = True
            if bad_type:
                n_fail += 1
                continue
        except Exception:
            pass
        s_rows, s_cols = canon(srows, scols)
        o_rows, o_cols = canon(orows, ocols)
        if s_cols != o_cols:
            print(f"FAIL  {name}: columns differ spark={s_cols} duck={o_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duck={len(o_rows)}")
            n_fail += 1
            continue
        bad = None
        for sr, orr in zip(s_rows, o_rows):
            if not all(values_equal(a, b) for a, b in zip(sr, orr)):
                bad = (sr, orr)
                break
        if bad:
            print(f"FAIL  {name}: value mismatch\n  spark={bad[0]}\n  duck ={bad[1]}")
            n_fail += 1
        else:
            print(f"ok    {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
