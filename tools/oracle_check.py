"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, and compares row count, schema (loose
name-set match) and an order-insensitive value hash (columns sorted by
name, rows sorted, floats pre-rounded by the queries themselves).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_val(r[i]) for i in order))
    out.sort(key=repr)
    return out


def _norm_val(v):
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return repr(v)
    return repr(v)


def value_hash(rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from census_asc5_data_pipeline_spark import get_spark

    spark = get_spark("oracle_check")
    con = duck_con(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {dt:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rows spark={len(srows)} duck={len(drows)}")
        if ok:
            hs = value_hash(normalize(srows, scols))
            hd = value_hash(normalize(drows, dcols))
            if hs != hd:
                ok = False
                ns, nd = normalize(srows, scols), normalize(drows, dcols)
                diff = [
                    (a, b) for a, b in zip(ns, nd) if a != b
                ][:3]
                msgs.append(f"hash {hs} != {hd}; first diffs: {diff}")
        if ok:
            print(f"PASS  {name}: {len(srows)} rows, {dt:.1f}s")
        else:
            print(f"FAIL  {name}: " + " | ".join(msgs))
            failures += 1
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
