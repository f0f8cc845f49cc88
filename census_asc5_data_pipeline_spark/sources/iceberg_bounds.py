"""Iceberg per-file column metrics: the manifest ``data_file``
fields ``value_counts`` / ``null_value_counts`` / ``lower_bounds`` /
``upper_bounds`` (table-spec §Manifests) with the spec's
single-value BINARY serialization (§Appendix D) — the Iceberg twin
of :mod:`delta_stats`.

Writer half (:func:`file_column_metrics`): every data file this
engine stages gets bounds from its parquet FOOTER (a metadata read),
keyed by FIELD ID — resolved from the ``PARQUET:field_id`` stamps
the engine writes since r12, falling back to name lookup for files
staged before the stamp. Values serialize per Appendix D:
little-endian fixed-width ints/longs/floats/doubles, UTF-8 strings,
``date`` as int days from epoch, ``timestamp[tz]`` as long
microseconds from epoch, booleans as ``0x00/0x01``. Decimals and
nested/binary columns stay unbounded (conservative — they simply
never prune). In the manifest Avro these are the spec's
``array<record{key:int, value:bytes}>`` map encoding (Avro maps key
by string; Iceberg's k/v-array form keys by field id).

Reader half: :func:`decode_bound` + :func:`file_intervals` give
``read_iceberg(predicate=)`` the same conservative interval
evaluation :mod:`delta_stats` applies to Delta stats — the shared
``parse_skip_predicate`` / ``_atom_allows`` logic, so both formats
prune identically: a file is dropped only when its bounds PROVE no
row matches, and the full predicate still applies row-wise.
"""

from __future__ import annotations

import datetime as _dt
import struct

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1)

__all__ = [
    "encode_bound",
    "decode_bound",
    "file_column_metrics",
    "kv_list",
    "kv_map",
]


def _ts_micros(v: _dt.datetime) -> int:
    if v.tzinfo is not None:
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return round((v - _EPOCH_TS).total_seconds() * 1_000_000)


def encode_bound(ice_type: str, v) -> bytes | None:
    """Appendix-D single-value serialization; None = type/value this
    writer leaves unbounded (never an error — bounds are optional)."""
    t = ice_type
    try:
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        if t == "int":
            return struct.pack("<i", int(v))
        if t == "long":
            return struct.pack("<q", int(v))
        if t == "float":
            return struct.pack("<f", float(v))
        if t == "double":
            return struct.pack("<d", float(v))
        if t == "date":
            if isinstance(v, _dt.datetime):
                v = v.date()
            return struct.pack("<i", (v - _EPOCH_DATE).days)
        if t in ("timestamp", "timestamptz"):
            if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                v = _dt.datetime(v.year, v.month, v.day)
            return struct.pack("<q", _ts_micros(v))
        if t == "string":
            return str(v).encode("utf-8")
    except (ValueError, OverflowError, struct.error, TypeError):
        return None
    return None


def decode_bound(ice_type: str, b: bytes):
    """Appendix-D deserialization into the comparable Python domain
    (timestamps naive-UTC, dates as date) — raises on malformed input
    so callers can fall back to keep-the-file."""
    t = ice_type
    if t == "boolean":
        return b != b"\x00"
    if t == "int":
        return struct.unpack("<i", b)[0]
    if t == "long":
        return struct.unpack("<q", b)[0]
    if t == "float":
        return struct.unpack("<f", b)[0]
    if t == "double":
        return struct.unpack("<d", b)[0]
    if t == "date":
        return _EPOCH_DATE + _dt.timedelta(days=struct.unpack("<i", b)[0])
    if t in ("timestamp", "timestamptz"):
        return _EPOCH_TS + _dt.timedelta(
            microseconds=struct.unpack("<q", b)[0]
        )
    if t == "string":
        return b.decode("utf-8")
    raise TypeError(f"unbounded iceberg type {ice_type!r}")


def kv_list(m: dict[int, object]) -> list[dict]:
    """{field_id: value} → the spec's k/v-array map encoding."""
    return [{"key": int(k), "value": v} for k, v in sorted(m.items())]


def kv_map(v) -> dict[int, object]:
    """k/v-array (or a plain dict from a non-spec writer) →
    {field_id: value}; unknown shapes decode to empty (keep-file)."""
    if not v:
        return {}
    if isinstance(v, dict):
        out = {}
        for k, val in v.items():
            try:
                out[int(k)] = val
            except (TypeError, ValueError):
                continue
        return out
    if isinstance(v, list):
        out = {}
        for e in v:
            if isinstance(e, dict) and "key" in e:
                try:
                    out[int(e["key"])] = e.get("value")
                except (TypeError, ValueError):
                    continue
        return out
    return {}


def file_column_metrics(
    file_path: str, fields: list[dict]
) -> dict[str, list[dict]]:
    """value_counts / null_value_counts / lower_bounds / upper_bounds
    for one staged parquet file, keyed by FIELD ID, in k/v-array
    form ready for the manifest writer. ``fields`` is the table
    schema's field list ({id, name, type, ...}). Footer-only; any
    surprise leaves the affected column out (conservative)."""
    import pyarrow.parquet as pq

    id_of_name = {f["name"]: int(f["id"]) for f in fields}
    type_of_id = {int(f["id"]): f["type"] for f in fields}
    try:
        pf = pq.ParquetFile(file_path)
        md = pf.metadata
        arrow_schema = pf.schema_arrow
    except Exception:
        return {}
    # column index -> field id: PARQUET:field_id stamp first (r12 —
    # survives renames), then current-name fallback
    fid_of_col: dict[str, int] = {}
    for f in arrow_schema:
        fid = None
        if f.metadata and b"PARQUET:field_id" in f.metadata:
            try:
                fid = int(f.metadata[b"PARQUET:field_id"])
            except ValueError:
                fid = None
        if fid is None:
            fid = id_of_name.get(f.name)
        if fid is not None and fid in type_of_id:
            fid_of_col[f.name] = fid
    vcounts: dict[int, int] = {}
    ncounts: dict[int, int] = {}
    lows: dict[int, bytes] = {}
    highs: dict[int, bytes] = {}
    for j in range(md.num_columns):
        if not md.num_row_groups:
            break
        name = md.row_group(0).column(j).path_in_schema
        if "." in name or name not in fid_of_col:
            continue
        fid = fid_of_col[name]
        t = str(type_of_id[fid])
        lo = hi = None
        nc = 0
        vc = 0
        bounded = True
        null_known = True
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            st = rg.column(j).statistics
            vc += rg.num_rows
            if st is None:
                bounded = False
                null_known = False
                break
            if st.null_count is None:
                null_known = False
            else:
                nc += st.null_count
            all_null_group = (
                st.null_count is not None
                and st.null_count == rg.num_rows
            )
            try:
                has_mm = st.has_min_max
                gmin = st.min if has_mm else None
                gmax = st.max if has_mm else None
            except Exception:
                bounded = False
                continue
            if not has_mm:
                if not all_null_group:
                    bounded = False
                continue
            try:
                if lo is None or gmin < lo:
                    lo = gmin
                if hi is None or gmax > hi:
                    hi = gmax
            except TypeError:
                bounded = False
        if null_known:
            vcounts[fid] = vc
            ncounts[fid] = nc
        if bounded and lo is not None:
            blo = encode_bound(t, lo)
            bhi = encode_bound(t, hi)
            if blo is not None and bhi is not None:
                lows[fid] = blo
                highs[fid] = bhi
    out: dict[str, list[dict]] = {}
    if vcounts:
        out["value_counts"] = kv_list(vcounts)
        out["null_value_counts"] = kv_list(ncounts)
    if lows:
        out["lower_bounds"] = kv_list(lows)
        out["upper_bounds"] = kv_list(highs)
    return out


def file_intervals(
    data_file: dict, fields: list[dict]
) -> dict[str, tuple]:
    """{column_name: (lo, hi, null_count, value_count)} decoded from
    one manifest data_file entry — the :func:`delta_stats.skip_files`
    interval shape. Columns with malformed bounds are omitted
    (keep-file)."""
    name_of_id = {int(f["id"]): f["name"] for f in fields}
    type_of_id = {int(f["id"]): str(f["type"]) for f in fields}
    lows = kv_map(data_file.get("lower_bounds"))
    highs = kv_map(data_file.get("upper_bounds"))
    vcs = kv_map(data_file.get("value_counts"))
    ncs = kv_map(data_file.get("null_value_counts"))
    out: dict[str, tuple] = {}
    for fid, name in name_of_id.items():
        lo = hi = None
        try:
            if fid in lows and lows[fid] is not None:
                lo = decode_bound(type_of_id[fid], bytes(lows[fid]))
            if fid in highs and highs[fid] is not None:
                hi = decode_bound(type_of_id[fid], bytes(highs[fid]))
        except Exception:
            lo = hi = None
        nc = ncs.get(fid)
        vc = vcs.get(fid)
        if lo is None and hi is None and nc is None:
            continue
        out[name] = (
            lo,
            hi,
            int(nc) if nc is not None else None,
            int(vc) if vc is not None else None,
        )
    return out
