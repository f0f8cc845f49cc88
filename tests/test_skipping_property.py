"""Property tests (hypothesis) for the stats-skipping evaluator —
the safety invariant both formats' pruning rests on: a file that
CONTAINS a predicate-matching row is NEVER skipped, for any file
contents and any parseable predicate. Runs entirely driver-side
(no Spark) — the evaluator is pure Python over stats dicts, so
hundreds of random examples cost milliseconds.

The exactness of the end-to-end reads is separately guaranteed by
construction (the full predicate re-applies row-wise); what these
tests pin is that pruning never quietly degrades from 'conservative'
to 'lossy' as the evaluator grows."""

from __future__ import annotations

import json

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from pyspark.sql import types as T

from census_asc5_data_pipeline_spark.sources import delta_stats as ds
from census_asc5_data_pipeline_spark.sources import iceberg_bounds as ib

SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("s", T.StringType()),
    ]
)

_int = st.integers(min_value=-50, max_value=50)
# r14: fractional literals against the integer column pin the
# no-truncation fix (int(1.5) made `a < 1.5` lossy)
_frac = st.integers(min_value=-100, max_value=100).map(lambda n: n / 2)
# r14: hostile string literals pin the BETWEEN/AND masking — a
# literal containing operator keywords must never corrupt parsing
_hostile = st.sampled_from(
    [
        "x AND y",
        "a BETWEEN 1 AND 2",
        "OR",
        "it's",
        "s > 5",
        "IN (1,2)",
        "' AND a = 1 AND s = '",
    ]
)
_str = st.one_of(
    st.text(alphabet="abcXYZ", min_size=0, max_size=4), _hostile
)
_row = st.fixed_dictionaries(
    {
        "a": st.one_of(st.none(), _int),
        "s": st.one_of(st.none(), _str),
    }
)
_file = st.lists(_row, min_size=0, max_size=8)
_files = st.lists(_file, min_size=1, max_size=5)

_cmp_op = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])


def _lit_sql(v):
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


_atom = st.one_of(
    st.tuples(st.just("a"), _cmp_op, _int),
    st.tuples(st.just("a"), _cmp_op, _frac),
    st.tuples(st.just("s"), _cmp_op, _str),
    st.tuples(
        st.just("a"), st.just("in"), st.lists(_int, min_size=1, max_size=3)
    ),
    st.tuples(st.just("a"), st.just("isnull"), st.none()),
    st.tuples(st.just("s"), st.just("notnull"), st.none()),
    st.tuples(
        st.just("a"),
        st.just("between"),
        st.tuples(_int, _int),
    ),
)
_pred = st.lists(_atom, min_size=1, max_size=3)


def _atom_sql(atom) -> str:
    col, op, v = atom
    if op == "isnull":
        return f"{col} IS NULL"
    if op == "notnull":
        return f"{col} IS NOT NULL"
    if op == "in":
        return f"{col} IN ({', '.join(_lit_sql(x) for x in v)})"
    if op == "between":
        lo, hi = v
        return f"{col} BETWEEN {_lit_sql(lo)} AND {_lit_sql(hi)}"
    return f"{col} {op} {_lit_sql(v)}"


def _row_matches(row, atoms) -> bool:
    """SQL three-valued semantics: NULL comparisons never match."""
    for col, op, v in atoms:
        x = row[col]
        if op == "isnull":
            if x is not None:
                return False
            continue
        if op == "notnull":
            if x is None:
                return False
            continue
        if x is None:
            return False
        if op == "in":
            if x not in v:
                return False
        elif op == "between":
            if not (v[0] <= x <= v[1]):
                return False
        elif op == "=":
            if x != v:
                return False
        elif op == "!=":
            if x == v:
                return False
        elif op == "<":
            if not x < v:
                return False
        elif op == "<=":
            if not x <= v:
                return False
        elif op == ">":
            if not x > v:
                return False
        elif op == ">=":
            if not x >= v:
                return False
    return True


def _stats_for(rows) -> str:
    mins, maxs, nulls = {}, {}, {}
    for c in ("a", "s"):
        vals = [r[c] for r in rows if r[c] is not None]
        nulls[c] = len(rows) - len(vals)
        if vals:
            mins[c] = min(vals)
            maxs[c] = max(vals)
    return json.dumps(
        {
            "numRecords": len(rows),
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        }
    )


@settings(max_examples=300, deadline=None)
@given(files=_files, atoms=_pred)
def test_delta_skipping_never_loses_matches(files, atoms):
    adds = [
        {"path": f"f{i}.parquet", "partitionValues": {}, "stats": _stats_for(rows)}
        for i, rows in enumerate(files)
    ]
    predicate = " AND ".join(_atom_sql(a) for a in atoms)
    parsed = ds.parse_skip_predicate(predicate)
    assert parsed is not None, predicate  # our grammar must parse
    kept = {
        a["path"]
        for a in ds.skip_files(adds, parsed, SCHEMA, [], None)
    }
    for i, rows in enumerate(files):
        if any(_row_matches(r, atoms) for r in rows):
            assert f"f{i}.parquet" in kept, (
                f"file {i} holds a match for {predicate!r} but was "
                f"skipped (rows={rows})"
            )


@settings(max_examples=300, deadline=None)
@given(files=_files, atoms=_pred)
def test_iceberg_bounds_never_lose_matches(files, atoms):
    fields = [
        {"id": 1, "name": "a", "type": "long"},
        {"id": 2, "name": "s", "type": "string"},
    ]
    data_files = []
    for i, rows in enumerate(files):
        lows, highs, vcs, ncs = {}, {}, {}, {}
        for fid, c, t in ((1, "a", "long"), (2, "s", "string")):
            vals = [r[c] for r in rows if r[c] is not None]
            vcs[fid] = len(rows)
            ncs[fid] = len(rows) - len(vals)
            if vals:
                lows[fid] = ib.encode_bound(t, min(vals))
                highs[fid] = ib.encode_bound(t, max(vals))
        data_files.append(
            {
                "file_path": f"f{i}.parquet",
                "record_count": len(rows),
                "partition": {},
                "value_counts": ib.kv_list(vcs),
                "null_value_counts": ib.kv_list(ncs),
                "lower_bounds": ib.kv_list(lows),
                "upper_bounds": ib.kv_list(highs),
            }
        )
    predicate = " AND ".join(_atom_sql(a) for a in atoms)
    parsed = ds.parse_skip_predicate(predicate)
    assert parsed is not None, predicate
    from census_asc5_data_pipeline_spark.sources.iceberg_io import (
        _skip_by_bounds,
    )

    kept = {
        d["file_path"]
        for d in _skip_by_bounds(data_files, parsed, fields, {})
    }
    for i, rows in enumerate(files):
        if any(_row_matches(r, atoms) for r in rows):
            assert f"f{i}.parquet" in kept


@settings(max_examples=200, deadline=None)
@given(
    v=st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.text(max_size=20),
    )
)
def test_appendix_d_roundtrip(v):
    t = "long" if isinstance(v, int) else "string"
    b = ib.encode_bound(t, v)
    assert b is not None
    assert ib.decode_bound(t, b) == v


@settings(max_examples=200, deadline=None)
@given(atoms=_pred)
def test_parser_roundtrips_its_own_grammar(atoms):
    predicate = " AND ".join(_atom_sql(a) for a in atoms)
    parsed = ds.parse_skip_predicate(predicate)
    assert parsed is not None
    # BETWEEN expands to two atoms; everything else maps 1:1
    n_expected = sum(2 if a[1] == "between" else 1 for a in atoms)
    assert len(parsed) == n_expected
