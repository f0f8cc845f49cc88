"""Spec-level Apache Iceberg table reader/writer over the PUBLIC
Iceberg table spec (iceberg.apache.org/spec) — no runtime jar, no
pyiceberg, pure metadata-JSON + Avro manifests + parquet, completing
the open-table-format pair begun by ``delta_io`` (round-6 verdict
elective #1; Delta shipped first, Iceberg rides the same discipline
plus the r7 generic nested-Avro codec in ``avro_io``).

What the metadata tree is (filesystem / "hadoop" table layout):

- ``metadata/v<N>.metadata.json`` (+ ``version-hint.text`` naming the
  current N): format-version, schemas (field ``id``/``name``/
  ``required``/``type``), partition-specs (``transform``/
  ``source-id``), snapshots — each snapshot points at a MANIFEST LIST.
- Manifest list = Avro file of ``manifest_file`` records (path,
  content 0=data/1=deletes, counts). Manifest = Avro file of
  ``manifest_entry`` records (status 0 existing/1 added/2 deleted,
  ``data_file`` struct: file_path, file_format, partition struct,
  record_count, ...). Both are METADATA scale and decode driver-side
  with :func:`avro_io.read_container_generic` — each file's own
  embedded schema drives the decode, so foreign-written manifests
  with extra stats fields parse fine.
- Snapshot state = the union of its manifests' non-deleted entries.

Spark mapping — scale notes:

- Unlike Delta/Hive, Iceberg data files carry ALL columns (identity
  partition sources included), so the read is ONE multi-path
  ``spark.read.schema(...).parquet`` — no partition re-attachment
  join at all, zero shuffles.
- ``partition_filter`` prunes the manifest-derived FILE LIST before
  Spark plans the scan (identity transforms; the stats_index
  discipline).
- v2 MERGE-ON-READ (r8): ``read_iceberg`` applies position deletes
  (anti-join on ``_metadata.row_index`` + file) and equality deletes
  (null-safe anti-join on the equality columns, strict sequence
  ordering), and ``delete_iceberg_where`` writes equality-delete
  snapshots — row-level DELETE costs O(keys), never O(table).
- Feature gates fail LOUDLY instead of mis-reading: format-version
  > 2, non-parquet data files, unsupported transforms in a
  ``partition_filter``, deletes on surfaces that cannot apply them
  (compaction, change feed, streaming).

Honest caveats (documented, not silent): columns resolve BY NAME on
the fast path; a foreign table whose columns were RENAMED mid-history
(schema log shows one field id under two names) switches
``read_iceberg`` to parquet-footer FIELD-ID resolution
(``_read_by_field_id`` — the spec's answer; r8), and files lacking
``PARQUET:field_id`` stamps still raise rather than guess. Non-read
surfaces (writer, change feed, streaming) keep the rename gate. The
writer emits spec-SHAPED v2 metadata our reader
(and any reader honoring embedded Avro schemas) round-trips;
byte-level parity with the reference Java writer's full stats is out
of scope.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from census_asc5_data_pipeline_spark.sources import iceberg_bounds
from census_asc5_data_pipeline_spark.sources.avro_io import (
    read_container_generic,
    write_container_generic,
)

__all__ = [
    "read_iceberg",
    "write_iceberg",
    "iceberg_snapshots",
]

_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "uuid": T.StringType(),
}
_SPARK_TO_ICE = {
    "boolean": "boolean",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp_ntz": "timestamp",
    "timestamp": "timestamptz",
}


def _ice_type_to_spark(t) -> T.DataType:
    if isinstance(t, str):
        m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        raise NotImplementedError(f"unsupported iceberg type {t!r}")
    if t["type"] == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _ice_type_to_spark(f["type"]),
                    not f.get("required", False),
                )
                for f in t["fields"]
            ]
        )
    if t["type"] == "list":
        return T.ArrayType(
            _ice_type_to_spark(t["element"]),
            not t.get("element-required", False),
        )
    if t["type"] == "map":
        return T.MapType(
            _ice_type_to_spark(t["key"]),
            _ice_type_to_spark(t["value"]),
            not t.get("value-required", False),
        )
    raise NotImplementedError(f"unsupported iceberg type {t!r}")


# --------------------------- partition transforms (spec §Partitioning)
#
# bucket[N] uses the spec's 32-bit Murmur3 (x86, seed 0) over the
# value's hash representation: int/long/date/timestamp hash as the
# 64-bit little-endian long, strings as UTF-8 bytes; the bucket is
# (hash & Integer.MAX_VALUE) % N. Implemented from the published
# algorithm (public domain) — no external lib in this container.


def _murmur3_32(data: bytes, seed: int = 0) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n4 = len(data) // 4
    for i in range(n4):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[n4 * 4 :]
    if tail:
        k = int.from_bytes(tail.ljust(4, b"\0"), "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _bucket_of(value, ice_src_type: str, n: int) -> int | None:
    if value is None:
        return None
    if ice_src_type in ("int", "long", "date", "timestamp", "timestamptz"):
        data = int(value).to_bytes(8, "little", signed=True)
    elif ice_src_type == "string":
        data = str(value).encode("utf-8")
    else:
        raise NotImplementedError(
            f"bucket transform over {ice_src_type!r} is out of scope"
        )
    return (_murmur3_32(data) & 0x7FFFFFFF) % n


_TRANSFORM_RE = re.compile(
    r"(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)"
    r"|(year|month|day|hour|void)\s*\(\s*(\w+)\s*\)"
    r"|(\w+)"
)


def _parse_partition_by(entries: list[str]) -> list[dict]:
    """``partition_by`` entries → [{name, transform, source}]:
    ``"col"`` (identity), ``"bucket(N, col)"``, ``"truncate(W, col)"``,
    ``"year(col)"`` / ``"month(col)"`` / ``"day(col)"`` /
    ``"hour(col)"`` / ``"void(col)"`` — the spec's full transform
    vocabulary (r13 completes hour + void)."""
    out = []
    for e in entries:
        m = _TRANSFORM_RE.fullmatch(e.strip())
        if not m:
            raise ValueError(f"unparseable partition_by entry {e!r}")
        if m.group(1):
            kind, param, src = m.group(1), int(m.group(2)), m.group(3)
            suffix = "bucket" if kind == "bucket" else "trunc"
            out.append(
                {
                    "name": f"{src}_{suffix}",
                    "transform": f"{kind}[{param}]",
                    "source": src,
                }
            )
        elif m.group(4):
            kind, src = m.group(4), m.group(5)
            out.append(
                {
                    "name": f"{src}_{kind}",
                    "transform": kind,
                    "source": src,
                }
            )
        else:
            out.append(
                {
                    "name": m.group(6),
                    "transform": "identity",
                    "source": m.group(6),
                }
            )
    return out


def _transform_result_type(transform: str, ice_src_type: str) -> str:
    if transform == "identity":
        return ice_src_type
    if transform.startswith("truncate["):
        return ice_src_type
    return "int"  # bucket / year / month / day


def _eval_transform(transform: str, ice_src_type: str, literal: str):
    """Apply a partition transform to a FILTER LITERAL driver-side
    (planning-time pruning; round-7 verdict elective #4). Returns the
    typed partition value the manifest would carry."""
    import datetime

    if literal is None:
        return None
    if transform == "identity":
        return int(literal) if ice_src_type in ("int", "long") else literal
    if transform.startswith("bucket["):
        n = int(transform[len("bucket[") : -1])
        if ice_src_type == "date":
            days = (
                datetime.date.fromisoformat(literal)
                - datetime.date(1970, 1, 1)
            ).days
            return _bucket_of(days, "date", n)
        if ice_src_type in ("int", "long"):
            return _bucket_of(int(literal), ice_src_type, n)
        return _bucket_of(literal, ice_src_type, n)
    if transform.startswith("truncate["):
        w = int(transform[len("truncate[") : -1])
        if ice_src_type in ("int", "long"):
            v = int(literal)
            return v - (v % w)  # python % is already floor-mod
        if ice_src_type == "string":
            return literal[:w]
        raise NotImplementedError(
            f"truncate over {ice_src_type!r} is out of scope"
        )
    if transform in ("year", "month", "day"):
        d = datetime.date.fromisoformat(literal[:10])
        if transform == "year":
            return d.year - 1970
        if transform == "month":
            return (d.year - 1970) * 12 + d.month - 1
        return (d - datetime.date(1970, 1, 1)).days
    if transform == "hour":
        ts = datetime.datetime.fromisoformat(
            str(literal).replace("Z", "+00:00")
        )
        if ts.tzinfo is not None:
            ts = ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return int(
            (ts - datetime.datetime(1970, 1, 1)).total_seconds() // 3600
        )
    if transform == "void":
        return None  # every void partition value is null
    raise NotImplementedError(f"partition transform {transform!r}")


def _stage_partition_expr(tr: str, src: str, src_t: str):
    """The staging Column evaluating partition transform ``tr`` over
    source column ``src`` (iceberg type ``src_t``) — the spec kernels
    (bucket = murmur3_x86_32 per Appendix B, truncate = floor-mod /
    prefix, year/month/day = epoch offsets). Shared by
    :func:`write_iceberg`'s append staging and the row-level DML
    staging in ``merge._commit_iceberg_mor`` (round-11: MERGE/UPDATE
    over transform-partitioned tables)."""
    from pyspark.sql import functions as F

    if tr == "identity":
        return F.col(src)
    if tr.startswith("truncate["):
        wdt = int(tr[len("truncate[") : -1])
        if src_t in ("int", "long"):
            # spec: v - (v mod W) with floor-mod; pmod IS floor-mod
            return F.col(src) - F.pmod(F.col(src), F.lit(wdt))
        if src_t == "string":
            return F.substring(F.col(src), 1, wdt)
        raise NotImplementedError(
            f"truncate over {src_t!r} is out of scope"
        )
    if tr.startswith("bucket["):
        n_b = int(tr[len("bucket[") : -1])
        if src_t in ("int", "long"):
            return _bucket_col(F.col(src).cast("long"), n_b, False)
        if src_t == "date":
            return _bucket_col(
                F.datediff(F.col(src), F.lit("1970-01-01")).cast("long"),
                n_b,
                False,
            )
        if src_t in ("timestamp", "timestamptz"):
            return _bucket_col(F.unix_micros(F.col(src)), n_b, False)
        if src_t == "string":
            return _bucket_col(F.col(src), n_b, True)
        raise NotImplementedError(f"bucket over {src_t!r} is out of scope")
    if tr in ("year", "month", "day"):
        if src_t not in ("date", "timestamp", "timestamptz"):
            raise NotImplementedError(
                f"{tr} transform over {src_t!r} is out of scope"
            )
        if tr == "year":
            return F.year(F.col(src)) - F.lit(1970)
        if tr == "month":
            return (F.year(F.col(src)) - F.lit(1970)) * F.lit(12) + (
                F.month(F.col(src)) - F.lit(1)
            )
        return F.datediff(F.col(src), F.lit("1970-01-01"))
    if tr == "hour":
        if src_t not in ("timestamp", "timestamptz"):
            raise NotImplementedError(
                f"hour transform over {src_t!r} is out of scope"
            )
        # hours from epoch; floor division keeps pre-1970 correct
        return F.floor(
            F.unix_micros(F.col(src)) / F.lit(3_600_000_000)
        ).cast("int")
    if tr == "void":
        return F.lit(None).cast("int")
    raise NotImplementedError(f"partition transform {tr!r}")


def _bucket_col(col, n: int, is_string: bool):
    """Arrow-batched bucket[N] staging column for the writer. The
    long path is fully numpy-vectorized murmur3_x86_32 (uint32
    wrapping arithmetic — no per-row Python); strings hash per-row
    (variable length). Write-path partition staging only, never a
    query hot path."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if is_string:

        def _b_str(s):
            return pd.array(
                [
                    None if x is None else _bucket_of(x, "string", n)
                    for x in s
                ],
                dtype="Int32",
            )

        # module uses `from __future__ import annotations`, so inline
        # hints would be unresolvable strings — attach real objects
        _b_str.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(_b_str, "int")(col)

    def _b_long(s):
        import numpy as np

        mask = s.isna().to_numpy()
        v = s.fillna(0).to_numpy(dtype="int64")
        u = v.view(np.uint64)
        c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
        h = np.zeros(len(v), dtype=np.uint32)
        for k0 in (
            (u & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (u >> np.uint64(32)).astype(np.uint32),
        ):
            k = (k0 * c1).astype(np.uint32)
            k = ((k << np.uint32(15)) | (k >> np.uint32(17))).astype(
                np.uint32
            )
            k = (k * c2).astype(np.uint32)
            h ^= k
            h = ((h << np.uint32(13)) | (h >> np.uint32(19))).astype(
                np.uint32
            )
            h = (h * np.uint32(5) + np.uint32(0xE6546B64)).astype(np.uint32)
        h ^= np.uint32(8)
        h ^= h >> np.uint32(16)
        h = (h * np.uint32(0x85EBCA6B)).astype(np.uint32)
        h ^= h >> np.uint32(13)
        h = (h * np.uint32(0xC2B2AE35)).astype(np.uint32)
        h ^= h >> np.uint32(16)
        res = ((h & np.uint32(0x7FFFFFFF)) % np.uint32(n)).astype("int64")
        return pd.Series(res).where(~mask, other=None).astype("Int32")

    _b_long.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_b_long, "int")(col)


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _metadata_files(path: str) -> list[tuple[int, str]]:
    d = _meta_dir(path)
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"not an Iceberg table (no metadata/) at {path!r}"
        )
    out = []
    for f in os.listdir(d):
        if not f.endswith(".metadata.json"):
            continue
        m = re.match(r"v?(\d+)", f)
        if m:
            out.append((int(m.group(1)), os.path.join(d, f)))
    return sorted(out)


def _current_metadata(path: str) -> tuple[int, dict]:
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    files = _metadata_files(path)
    if os.path.exists(hint):
        v = int(open(hint).read().strip())
        match = [p for n, p in files if n == v]
        if match:
            return v, json.load(open(match[0]))
    if not files:
        raise FileNotFoundError(f"no metadata json under {path!r}")
    v, p = files[-1]
    return v, json.load(open(p))


def _local(p: str) -> str:
    if p.startswith("file://"):
        p = urllib.parse.urlparse(p).path
    return p


def _renamed_ids(meta: dict) -> dict[int, set[str]]:
    """Field ids that carry more than one name across the table's
    schema history — the signal that by-name parquet resolution would
    mis-bind and field-id resolution is required."""
    schemas = meta.get("schemas") or (
        [meta["schema"]] if "schema" in meta else []
    )
    names_by_id: dict[int, set[str]] = {}
    for s in schemas:
        for f in s.get("fields", []):
            names_by_id.setdefault(f["id"], set()).add(f["name"])
    return {i: n for i, n in names_by_id.items() if len(n) > 1}


#: v3 column types with no v2-compatible Spark mapping — reading them
#: needs codecs (variant binary layout, geo WKB semantics, ns
#: timestamps) this engine does not implement
_V3_UNSUPPORTED_TYPES = (
    "variant",
    "geometry",
    "geography",
    "timestamp_ns",
    "timestamptz_ns",
    "unknown",
)


def _format_version_gate(
    meta: dict, operation: str, write: bool = False,
    v3_write_ok: bool = False, defaults_ok: bool = False,
) -> int:
    """Per-feature format-version gate (r16, r15 verdict #5 — the
    v1/v2 blanket refusal split). v1/v2 pass. v3 metadata PARSES and
    READS when only v2-compatible features are in play; each
    unsupported feature refuses BY NAME:

    - v3 WRITES pass only for verbs that maintain the spec's
      mandatory row-lineage duties (``v3_write_ok=True``): append /
      compaction / UPDATE / MERGE stamp first_row_id blocks and
      materialize rewritten rows' ids, DELETEs commit deletion
      vectors, and the metadata-only verbs carry ``next-row-id`` /
      ``format-version`` forward via their dict(meta) rebuilds. A
      future verb that rebuilds metadata from scratch must keep
      refusing — it would silently DOWNGRADE the table to v2;
    - schema fields typed ``variant``/``geometry``/``geography``/
      ``timestamp_ns``/``timestamptz_ns``/``unknown`` refuse (no
      v2-compatible mapping);
    - fields with a non-null ``initial-default`` refuse: a reader
      ignoring it would surface NULL where the spec says the default
      — wrong data, not a missing feature;
    - ``encryption-keys`` refuses (encrypted bytes);
    - v3 DELETION VECTORS READ everywhere (r16): the scan decodes
      the Puffin blob through the shared roaring codec
      (:func:`_dv_positions_frame`), and the change feed diffs
      consecutive DV states to recover each snapshot's retraction
      images (:func:`read_iceberg_changes`).

    Row-lineage METADATA (``next-row-id``, ``first-row-id``) is
    read-harmless — lineage fields are reader-optional — so its
    presence alone never refuses a read."""
    fv = int(meta.get("format-version", 1))
    if fv <= 2:
        return fv
    if fv > 3:
        raise NotImplementedError(
            f"format-version {fv}: this spec-level engine knows "
            "v1/v2 (full) and v3 (read-only, per-feature)"
        )
    if write and not v3_write_ok:
        raise NotImplementedError(
            f"{operation} on a format-version 3 table: this verb "
            "does not maintain the v3 writer duties (row lineage on "
            "rewrites) — append, DELETE, UPDATE, MERGE and "
            "compaction do (r16)"
        )
    schemas = meta.get("schemas") or (
        [meta["schema"]] if meta.get("schema") else []
    )
    sid = meta.get("current-schema-id", 0)
    cur = next(
        (s for s in schemas if s.get("schema-id", 0) == sid), None
    )
    for f in (cur or {}).get("fields", []):
        t = f.get("type")
        t_name = t if isinstance(t, str) else (t or {}).get("type", "")
        if str(t_name) in _V3_UNSUPPORTED_TYPES or str(
            t_name
        ).startswith(("geometry(", "geography(")):
            raise NotImplementedError(
                f"v3 column {f.get('name')!r} has type {t_name!r} — "
                "no v2-compatible mapping in this reader"
            )
        if f.get("initial-default") is not None and not defaults_ok:
            # read_iceberg materializes defaults since r16
            # (defaults_ok=True → _scan_with_defaults); every OTHER
            # surface would surface NULL where the spec says the
            # default — wrong data, so it refuses
            raise NotImplementedError(
                f"v3 column {f.get('name')!r} declares an "
                "initial-default — this surface does not materialize "
                "defaults (NULL would be wrong data); the main scan "
                "(read_iceberg) does"
            )
    if meta.get("encryption-keys"):
        raise NotImplementedError(
            "v3 table declares encryption-keys — encrypted data "
            "files are out of scope"
        )
    return fv


def _is_dv_entry(d: dict) -> bool:
    """A v3 deletion-vector delete-file entry: it references a Puffin
    blob (``referenced_data_file`` + ``content_offset``/
    ``content_size_in_bytes``) instead of being a parquet file of
    (file_path, pos) rows."""
    return (
        d.get("referenced_data_file") is not None
        or d.get("content_offset") is not None
        or str(d.get("file_format", "")).upper() == "PUFFIN"
    )


#: above this many total deleted positions (the DV entries' manifest
#: record_count) the blob decode fans out to executors — a
#: heavily-deleted 100 TB table's DVs are too big to materialize
#: through a driver createDataFrame (the delta_io threshold)
_ICE_DV_DRIVER_POSITIONS = 100_000


def _dv_positions_frame(
    spark: SparkSession, dv_entries: list[dict]
) -> DataFrame:
    """(__pbase, __pos, __pseq) frame of every v3-DV-deleted row
    index: each entry's Puffin blob decodes through the shared
    roaring codec (:func:`deletion_vectors.read_iceberg_dv`),
    keyed to the basename of its ``referenced_data_file``. Small DV
    sets decode driver-side; above
    :data:`_ICE_DV_DRIVER_POSITIONS` the decode runs
    one-task-per-blob in executors via ``mapInArrow`` (descriptors
    are O(files) metadata; only decoded positions go cluster-side)."""
    from census_asc5_data_pipeline_spark.sources.deletion_vectors import (
        read_iceberg_dv,
    )

    specs = [
        (
            os.path.basename(_local(d["referenced_data_file"])),
            _local(d["file_path"]),
            int(d["content_offset"]),
            int(d["content_size_in_bytes"]),
            int(d["_seq"]),
        )
        for d in dv_entries
    ]
    total = sum(
        int(d.get("record_count", 0) or 0) for d in dv_entries
    )
    if total <= _ICE_DV_DRIVER_POSITIONS:
        rows = [
            (base, int(p), seq)
            for base, fp, off, sz, seq in sorted(specs)
            for p in read_iceberg_dv(fp, off, sz)
        ]
        return spark.createDataFrame(
            rows, "__pbase string, __pos long, __pseq long"
        )

    def _task(batches):
        import pyarrow as pa

        from census_asc5_data_pipeline_spark.sources.deletion_vectors import (
            read_iceberg_dv as _rdv,
        )

        for b in batches:
            for base, fp, off, sz, seq in zip(
                *(b.column(i).to_pylist() for i in range(5))
            ):
                pos = _rdv(fp, off, sz)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([base] * len(pos), pa.string()),
                        pa.array(pos, pa.int64()),
                        pa.array([seq] * len(pos), pa.int64()),
                    ],
                    ["__pbase", "__pos", "__pseq"],
                )

    flist = spark.createDataFrame(
        specs, "b string, f string, o long, s long, q long"
    ).repartition(min(len(specs), 64))
    return flist.mapInArrow(
        _task, "__pbase string, __pos long, __pseq long"
    )


def _schema_of(
    meta: dict, allow_renames: bool = False
) -> tuple[T.StructType, list[dict]]:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        schemas = meta["schemas"]
        ice = next(s for s in schemas if s.get("schema-id", 0) == sid)
    else:  # v1 single-schema form
        ice = meta["schema"]
        schemas = [ice]
    # name-resolution gate: if any field id was RENAMED across schema
    # versions, by-name parquet resolution would silently mis-bind —
    # read_iceberg handles this via parquet-footer field-id resolution
    # (allow_renames=True); every other surface still gates
    renamed = _renamed_ids(meta)
    if renamed and not allow_renames:
        raise NotImplementedError(
            f"table has renamed columns across schema versions "
            f"{renamed} — this surface resolves by NAME and would "
            "mis-bind; use read_iceberg (field-id resolution)"
        )
    spark_schema = T.StructType(
        [
            T.StructField(
                f["name"],
                _ice_type_to_spark(f["type"]),
                not f.get("required", False),
            )
            for f in ice["fields"]
        ]
    )
    return spark_schema, ice["fields"]


def _check_required(df, fields: list[dict], operation: str) -> None:
    """Iceberg's one row constraint: a ``required=true`` field must be
    non-null (table spec §Schemas). Foreign tables declare these;
    this writer validates the staged rows BEFORE any snapshot commits
    (the :func:`delta_io._check_constraints` twin, r12). One
    aggregate job, skipped when no required field exists; columns
    Spark already types non-nullable are statically satisfied."""
    from pyspark.sql import functions as F

    req = [
        f["name"]
        for f in fields
        if f.get("required")
        and f["name"] in df.columns
        and df.schema[f["name"]].nullable
    ]
    if not req:
        return
    row = df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"__r{i}"
            )
            for i, c in enumerate(req)
        ]
    ).collect()[0]
    for i, c in enumerate(req):
        bad = int(row[f"__r{i}"] or 0)
        if bad:
            raise ValueError(
                f"{operation} violates required (non-null) field "
                f"{c!r}: {bad} row(s) are null — nothing was committed"
            )


def _with_field_ids(df, fields: list[dict]):
    """Stamp each column with its Iceberg field id
    (``parquet.field.id`` column metadata → PARQUET field_id in the
    footer via Spark's native writer; spark.sql.parquet.fieldId.write
    is on by default). The table spec REQUIRES field ids in data
    files — they're what makes rename/drop resolution
    (:func:`_read_by_field_id`) work on this engine's own files, not
    just foreign ones (r12). Columns without a schema field (staging
    ``__pt_`` clones — which Spark drops from the files anyway) pass
    through unstamped."""
    from pyspark.sql import functions as F

    id_of = {f["name"]: int(f["id"]) for f in fields}
    return df.select(
        [
            F.col(c).alias(c, metadata={"parquet.field.id": id_of[c]})
            if c in id_of
            else F.col(c)
            for c in df.columns
        ]
    )


def iceberg_snapshots(path: str) -> list[dict]:
    """The table's snapshot log: [{snapshot-id, timestamp-ms,
    manifest-list, summary}, ...] ascending."""
    _v, meta = _current_metadata(path)
    return sorted(
        meta.get("snapshots", []), key=lambda s: s["snapshot-id"]
    )


def snapshot_as_of_timestamp_iceberg(path: str, ts_ms: int) -> int:
    """Latest snapshot whose ``timestamp-ms`` is <= ``ts_ms`` — the
    :func:`delta_io.version_as_of_timestamp_delta` twin (round-8
    verdict #8), resolved through the spec's ``snapshot-log`` (every
    entry carries {timestamp-ms, snapshot-id}; rollbacks append a new
    entry for the restored snapshot, so 'the state AS OF t' honors
    them), falling back to the snapshots' own timestamps for foreign
    metadata without a log."""
    _v, meta = _current_metadata(path)
    entries = meta.get("snapshot-log") or [
        {
            "timestamp-ms": s.get("timestamp-ms", 0),
            "snapshot-id": s["snapshot-id"],
        }
        for s in meta.get("snapshots", [])
    ]
    best = None
    for e in sorted(entries, key=lambda e: int(e.get("timestamp-ms", 0))):
        if int(e.get("timestamp-ms", 0)) <= ts_ms:
            best = e["snapshot-id"]
    if best is None:
        raise ValueError(
            f"no Iceberg snapshot at or before timestamp {ts_ms} "
            f"in {path!r}"
        )
    return best


# above this many manifests the Avro decode fans out to executors
# (round-7 verdict #6): a 100 TB table has 10^6-10^7 data files across
# thousands of manifests, and driver-side decode becomes the planning
# bottleneck long before the scan starts. The file LIST still returns
# to the driver (Spark's parquet reader takes paths there), but that
# is O(files) strings vs O(files × entry-bytes) Avro parsing.
_DIST_MANIFEST_THRESHOLD = 64


def _decode_manifests_distributed(
    spark: SparkSession, manifest_specs: list[tuple[str, int, int]]
) -> list[dict]:
    """Decode many manifest Avro files IN EXECUTORS (one decode task
    per file via ``mapInArrow`` over the (path, seq, content)-list
    frame — the ``avro_io.read_avro`` discipline). Entries come back
    as JSON of exactly the fields the planner uses (status, the
    owning manifest's ``_seq``/``_manifest_content``, data_file
    {content, file_path, file_format, partition, record_count,
    file_size_in_bytes, equality_ids}), so foreign stats blobs
    (possibly non-JSON bytes) never cross the wire."""

    def _task(batches):
        import json as _json

        import pyarrow as pa

        from census_asc5_data_pipeline_spark.sources.avro_io import (
            read_container_generic,
        )

        for b in batches:
            out = []
            for p, seq, content in zip(
                b.column(0).to_pylist(),
                b.column(1).to_pylist(),
                b.column(2).to_pylist(),
            ):
                _s, entries = read_container_generic(p)
                for e in entries:
                    d = e.get("data_file") or {}
                    out.append(
                        _json.dumps(
                            {
                                "status": e.get("status", 1),
                                "_seq": seq,
                                "_manifest_content": content,
                                "data_file": {
                                    "content": d.get("content", 0),
                                    "file_path": d.get("file_path"),
                                    "file_format": d.get(
                                        "file_format", "PARQUET"
                                    ),
                                    "partition": d.get("partition"),
                                    "record_count": d.get(
                                        "record_count", 0
                                    ),
                                    "file_size_in_bytes": d.get(
                                        "file_size_in_bytes", 0
                                    ),
                                    "equality_ids": d.get(
                                        "equality_ids"
                                    ),
                                    # v3 row-lineage field (r16)
                                    "first_row_id": d.get(
                                        "first_row_id"
                                    ),
                                    # v3 deletion-vector fields (r16)
                                    # — dropped here and a DV would
                                    # silently read as an empty
                                    # parquet position-delete
                                    "referenced_data_file": d.get(
                                        "referenced_data_file"
                                    ),
                                    "content_offset": d.get(
                                        "content_offset"
                                    ),
                                    "content_size_in_bytes": d.get(
                                        "content_size_in_bytes"
                                    ),
                                },
                            }
                        )
                    )
            yield pa.RecordBatch.from_arrays(
                [pa.array(out, pa.string())], ["entry_json"]
            )

    flist = spark.createDataFrame(
        list(manifest_specs), "mpath string, mseq long, mcontent int"
    ).repartition(min(len(manifest_specs), 256))
    rows = flist.mapInArrow(_task, "entry_json string").collect()
    return [json.loads(r.entry_json) for r in rows]


def _snapshot_files(
    path: str,
    meta: dict,
    snapshot_id: int | None,
    spark: SparkSession | None = None,
    manifest_pruner=None,
) -> tuple[list[dict], list[dict]]:
    """(data_files, delete_files) of the snapshot's non-deleted
    entries. Every dict carries ``_seq`` — the owning manifest's
    sequence number (the spec's inheritance rule) — which drives
    merge-on-read applicability: a position delete applies to data
    with ``data_seq <= delete_seq``, an equality delete to
    ``data_seq < delete_seq``. With a session and ≥
    ``_DIST_MANIFEST_THRESHOLD`` manifests, the Avro decode runs
    file-parallel in executors."""
    snaps = meta.get("snapshots", [])
    if not snaps:
        return [], []
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            return [], []
    snap = next(
        (s for s in snaps if s["snapshot-id"] == snapshot_id), None
    )
    if snap is None:
        raise ValueError(
            f"snapshot {snapshot_id} not in table {path!r} "
            f"(have {[s['snapshot-id'] for s in snaps]})"
        )
    manifest_specs: list[tuple[str, int, int]] = []  # (path, seq, content)
    if "manifest-list" in snap:
        _sch, manifests = read_container_generic(
            _local(snap["manifest-list"])
        )
        for m in manifests:
            # manifest-list partition field summaries (spec field
            # 508, r14): a DATA manifest whose summaries PROVE no
            # partition can match is skipped before its Avro ever
            # decodes. DELETE manifests always decode — a position/
            # equality delete may target files in surviving manifests
            if (
                manifest_pruner is not None
                and int(m.get("content", 0) or 0) == 0
                and not manifest_pruner(m)
            ):
                continue
            manifest_specs.append(
                (
                    _local(m["manifest_path"]),
                    int(m.get("sequence_number", 0) or 0),
                    int(m.get("content", 0)),
                )
            )
    else:  # v1 inline manifest path list
        manifest_specs = [
            (_local(p), 0, 0) for p in snap.get("manifests", [])
        ]
    if (
        spark is not None
        and len(manifest_specs) >= _DIST_MANIFEST_THRESHOLD
    ):
        all_entries = _decode_manifests_distributed(spark, manifest_specs)
    else:
        all_entries = []
        for mp, seq, content in manifest_specs:
            for e in read_container_generic(mp)[1]:
                e["_seq"] = seq
                e["_manifest_content"] = content
                all_entries.append(e)
    data_out: list[dict] = []
    del_out: list[dict] = []
    for e in all_entries:
        if int(e.get("status", 1)) == 2:  # DELETED
            continue
        df_ = dict(e["data_file"])
        df_["_seq"] = e["_seq"]
        content = int(df_.get("content", 0) or 0)
        if content == 0 and int(e.get("_manifest_content", 0)) == 1:
            # some writers leave data_file.content at 0 inside delete
            # manifests; the manifest-list content wins then
            content = 1
        fmt = str(df_.get("file_format", "PARQUET")).upper()
        if fmt == "PUFFIN" and content == 1:
            # v3 deletion vector (r16): not a data file at all — the
            # scan decodes its blob through the roaring codec
            pass
        elif fmt != "PARQUET":
            raise NotImplementedError(
                f"data file format {fmt!r}; this reader supports "
                "PARQUET only"
            )
        if content == 0:
            data_out.append(df_)
        elif content in (1, 2):
            df_["content"] = content
            del_out.append(df_)
        else:
            raise NotImplementedError(
                f"data_file content {content!r} in "
                f"{df_.get('file_path')!r}"
            )
    return data_out, del_out


def _live_files(
    path: str,
    meta: dict,
    snapshot_id: int | None,
    spark: SparkSession | None = None,
) -> list[dict]:
    """data_file dicts of the snapshot — the deletes-incapable
    surfaces' view (compaction, change feed fallback): raises if the
    snapshot carries row-level delete files, because returning the
    raw data rows would resurrect deleted rows. read_iceberg handles
    deletes via :func:`_scan_with_deletes`."""
    data, deletes = _snapshot_files(path, meta, snapshot_id, spark)
    if deletes:
        raise NotImplementedError(
            "snapshot carries v2 row-level delete files; this surface "
            "cannot apply them — use read_iceberg (merge-on-read)"
        )
    return data


def _parse_name_mapping(meta: dict) -> dict[str, int] | None:
    """``schema.name-mapping.default`` (table-spec §Column Projection;
    round-13 verdict #5) parsed to {file_column_name: field_id}: the
    spec's fallback for data files WITHOUT parquet field-id stamps —
    a JSON list of ``{"field-id": N, "names": [...]}`` entries (an
    entry may list several historical names; nested ``fields`` walk
    with dotted prefixes, though this flat-schema reader only binds
    top-level names). None when the table declares no mapping."""
    raw = (meta.get("properties") or {}).get(
        "schema.name-mapping.default"
    )
    if not raw:
        return None
    entries = json.loads(raw) if isinstance(raw, str) else raw
    out: dict[str, int] = {}

    def _walk(ents, prefix=""):
        for e in ents:
            fid = e.get("field-id")
            for n in e.get("names", []) or []:
                if fid is not None:
                    out[prefix + str(n)] = int(fid)
            if e.get("fields"):
                base = (e.get("names") or [""])[0]
                _walk(e["fields"], prefix + str(base) + ".")

    _walk(entries)
    return out or None


def _read_by_field_id(
    spark: SparkSession,
    files: list[str],
    fields: list[dict],
    name_mapping: dict[str, int] | None = None,
) -> DataFrame:
    """Scan path for RENAMED-column histories (round-7 verdict
    elective #9, the spec's answer): real Iceberg writers stamp every
    parquet column with its field id (``PARQUET:field_id`` footer
    metadata), so each file's physical names are resolved to the
    CURRENT schema by id, not name. Files are grouped by their
    (id→physical-name) layout — at most one group per historical
    schema version — each group is one multi-path Spark scan reading
    the physical names and aliasing to current names (ids absent from
    a file surface as typed nulls: columns added after the file was
    written), and groups union. Files WITHOUT field-id stamps resolve
    through the table's ``schema.name-mapping.default`` when one is
    declared (``name_mapping``, the spec's column-projection
    fallback; round-13 verdict #5) and gate otherwise. Footer reads
    are driver-side and O(files) — the manifest-decode scale contract
    applies (distribute above ~10⁵ files before this is the 100 TB
    path)."""
    import pyarrow.parquet as pq

    want = [
        (f["id"], f["name"], _ice_type_to_spark(f["type"]))
        for f in fields
    ]
    groups: dict[tuple, list[str]] = {}
    for p in files:
        pqs = pq.read_schema(p)
        mapping: dict[int, str] = {}
        for i in range(len(pqs.names)):
            fld = pqs.field(i)
            fid = (fld.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                mapping[int(fid)] = fld.name
        if not mapping and name_mapping:
            # spec: field-id stamps always WIN over the mapping; the
            # mapping binds only unstamped files, by column name
            for n in pqs.names:
                fid2 = name_mapping.get(n)
                if fid2 is not None:
                    mapping[int(fid2)] = n
        if not mapping:
            raise NotImplementedError(
                f"renamed-column table but data file {p!r} carries no "
                "PARQUET:field_id metadata and the table declares no "
                "schema.name-mapping.default — cannot resolve safely"
            )
        groups.setdefault(tuple(sorted(mapping.items())), []).append(p)
    from pyspark.sql import functions as F

    parts = []
    for key, paths in sorted(groups.items()):
        phys_by_id = dict(key)
        read_fields, sel = [], []
        for fid, name, dtype in want:
            if fid in phys_by_id:
                read_fields.append(
                    T.StructField(phys_by_id[fid], dtype, True)
                )
                sel.append(F.col(phys_by_id[fid]).alias(name))
            else:
                sel.append(F.lit(None).cast(dtype).alias(name))
        parts.append(
            spark.read.schema(T.StructType(read_fields))
            .parquet(*paths)
            .select(sel)
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def resolve_ref(meta: dict, ref: str) -> int:
    """Snapshot id a ref (tag or branch name) points at, per the
    table-spec ``refs`` map. ``main`` always resolves to the CURRENT
    snapshot — the spec defines main as the table's current branch
    head, and this engine's writers advance ``current-snapshot-id``
    directly (a stale foreign ``refs.main`` entry must not win over
    the hint-resolved head)."""
    if ref == "main":
        sid = meta.get("current-snapshot-id")
        if sid in (None, -1):
            raise ValueError("table has no current snapshot")
        return int(sid)
    refs = meta.get("refs") or {}
    if ref not in refs:
        raise ValueError(
            f"unknown ref {ref!r} (refs: {sorted(refs) + ['main']})"
        )
    return int(refs[ref]["snapshot-id"])


def _manifest_summary_pruner(
    meta: dict,
    fields: list[dict],
    atoms: list[tuple],
    session_tz: str = "UTC",
):
    """Build the manifest-level keep-callable from manifest-list
    partition field summaries (spec field 508, r14): for each
    IDENTITY partition field whose SOURCE column the predicate
    constrains, decode the summary's Appendix-D bounds and evaluate
    the same conservative ``_atom_allows`` interval logic — a
    manifest is dropped only when a summary PROVES no file in it can
    match. Non-identity transforms, missing/undecodable summaries and
    unknown specs all keep the manifest. None = nothing evaluable."""
    from census_asc5_data_pipeline_spark.sources import delta_stats as dsk

    dtypes = {f["name"]: _ice_type_to_spark(f["type"]) for f in fields}
    fields_by_id = {f["id"]: f for f in fields}
    specs = meta.get("partition-specs") or (
        [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
    )
    specs_by_id = {int(s.get("spec-id", 0)): s for s in specs}
    lits_by_col: dict[str, list[tuple]] = {}
    for col, op, v in atoms:
        if col not in dtypes:
            continue
        try:
            if op == "in":
                v = [
                    dsk._coerce_lit(x, dtypes[col], session_tz)
                    for x in v
                ]
            elif v is not None:
                v = dsk._coerce_lit(v, dtypes[col], session_tz)
        except (TypeError, ValueError, ArithmeticError):
            continue
        lits_by_col.setdefault(col, []).append((col, op, v))
    if not lits_by_col:
        return None

    def keep(m: dict) -> bool:
        sums = m.get("partitions")
        if not sums:
            return True
        spec = specs_by_id.get(int(m.get("partition_spec_id", 0) or 0))
        if spec is None:
            return True
        for s, pf in zip(sums, spec.get("fields", [])):
            if not isinstance(s, dict):
                continue
            if pf.get("transform", "identity") != "identity":
                continue
            src = fields_by_id.get(pf["source-id"])
            if src is None:
                continue
            col = src["name"]
            lits = lits_by_col.get(col)
            if not lits:
                continue
            ice_t = str(src["type"])
            lo = hi = None
            try:
                lb, ub = s.get("lower_bound"), s.get("upper_bound")
                if lb is not None:
                    lo = iceberg_bounds.decode_bound(ice_t, bytes(lb))
                if ub is not None:
                    hi = iceberg_bounds.decode_bound(ice_t, bytes(ub))
            except Exception:
                lo = hi = None
            nc = 1 if s.get("contains_null") else 0
            for atom in lits:
                try:
                    # nrec = nc + 2 so the all-null proof never fires
                    # (summaries can't prove it) — conservative
                    if not dsk._atom_allows(atom, lo, hi, nc, nc + 2):
                        return False
                except (TypeError, ValueError, ArithmeticError):
                    continue
        return True

    return keep


def _skip_by_bounds(
    live: list[dict],
    atoms: list[tuple],
    fields: list[dict],
    meta: dict,
    session_tz: str = "UTC",
) -> list[dict]:
    """Prune data_file entries whose manifest column metrics
    (lower/upper bounds + null/value counts, decoded per Appendix D)
    PROVE no row matches the parsed predicate atoms — the
    :func:`delta_stats.skip_files` evaluator over Iceberg metadata
    (r13). Identity-transform partition values fold in as point
    intervals, so one predicate drives partition and bounds pruning
    uniformly. Conservative: any decode surprise keeps the file."""
    from census_asc5_data_pipeline_spark.sources import delta_stats as dsk

    dtypes = {
        f["name"]: _ice_type_to_spark(f["type"]) for f in fields
    }
    fields_by_id = {f["id"]: f for f in fields}
    specs = meta.get("partition-specs") or (
        [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
    )
    # identity partition field name -> source column name, per spec
    ident_of: dict[str, str] = {}
    for s in specs:
        for pf in s.get("fields", []):
            if pf.get("transform", "identity") == "identity":
                src = fields_by_id.get(pf["source-id"])
                if src is not None:
                    ident_of[pf["name"]] = src["name"]
    lits: list[tuple] = []
    for col, op, v in atoms:
        if col not in dtypes:
            continue
        try:
            if op == "in":
                v = [
                    dsk._coerce_lit(x, dtypes[col], session_tz)
                    for x in v
                ]
            elif v is not None:
                v = dsk._coerce_lit(v, dtypes[col], session_tz)
        except (TypeError, ValueError, ArithmeticError):
            continue
        lits.append((col, op, v))
    if not lits:
        return live
    kept: list[dict] = []
    for d in live:
        try:
            iv = iceberg_bounds.file_intervals(d, fields)
        except Exception:
            iv = {}
        nrec = d.get("record_count")
        for pname, raw in (d.get("partition") or {}).items():
            src = ident_of.get(pname)
            if src is None or src not in dtypes:
                continue
            try:
                if raw is None:
                    iv[src] = (None, None, 1, 1)
                else:
                    pv = dsk._decode(raw, dtypes[src])
                    iv[src] = (pv, pv, 0, nrec or 1)
            except (TypeError, ValueError, ArithmeticError):
                continue
        ok = True
        for col, op, v in lits:
            got = iv.get(col)
            if got is None:
                continue
            lo, hi, nc, vc = got
            try:
                if not dsk._atom_allows(
                    (col, op, v), lo, hi, nc, vc if vc is not None else nrec
                ):
                    ok = False
                    break
            except (TypeError, ValueError, ArithmeticError):
                continue
        if ok:
            kept.append(d)
    return kept


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    partition_filter: dict[str, str] | None = None,
    ref: str | None = None,
    predicate: str | None = None,
    row_lineage: bool = False,
) -> DataFrame:
    """Read an Iceberg table (current snapshot, AS OF
    ``snapshot_id``, or AS OF a named ``ref`` — tag or branch, spec
    §refs; round-12 verdict #3). ``partition_filter`` is an
    exact-match {identity_partition_col: string_value} pruning the
    file list before the scan plans. Renamed-column histories resolve
    by parquet field id (see :func:`_read_by_field_id`); v2 row-level
    deletes (position + equality) apply via anti-joins (see
    :func:`_scan_with_deletes`).

    ``predicate`` (r13 — bounds-based skipping): a SQL boolean over
    the table's columns; data files whose manifest column metrics
    PROVE no match are dropped before Spark plans the scan
    (:func:`_skip_by_bounds`), and the full predicate then applies as
    a Spark filter so results stay exact regardless of how
    conservative the evaluator is.

    ``row_lineage=True`` (r16 — the v3 spec\'s Row Lineage, the
    delta rowTracking READ twin): the result carries ``_row_id`` /
    ``_last_updated_sequence_number`` — the file\'s MATERIALIZED
    lineage columns when present (rows carried through a compaction
    keep their identity that way), else the manifest entry\'s
    ``first_row_id`` + the row\'s position / the file\'s data
    sequence number. Requires format-version 3 with every live data
    file carrying ``first_row_id`` (loud refusal — lineage ids are
    never fabricated)."""
    _v, meta = _current_metadata(path)
    if ref is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id OR ref, not both")
        snapshot_id = resolve_ref(meta, ref)
    fv = _format_version_gate(meta, "read", defaults_ok=True)
    renamed = _renamed_ids(meta)
    schema, _fields = _schema_of(meta, allow_renames=bool(renamed))
    defaulted = (
        [f for f in _fields if f.get("initial-default") is not None]
        if fv >= 3
        else []
    )
    if defaulted and renamed:
        raise NotImplementedError(
            "initial-default over a renamed-column history — the "
            "field-id scan and the defaults scan don't compose"
        )
    atoms = None
    pruner = None
    if predicate:
        from census_asc5_data_pipeline_spark.sources import (
            delta_stats as _dsk,
        )

        atoms = _dsk.parse_skip_predicate(predicate)
        if atoms is not None:
            pruner = _manifest_summary_pruner(
                meta,
                _fields,
                atoms,
                session_tz=spark.conf.get(
                    "spark.sql.session.timeZone", "UTC"
                ),
            )
    live, deletes = _snapshot_files(
        path, meta, snapshot_id, spark=spark, manifest_pruner=pruner
    )
    if deletes and renamed:
        raise NotImplementedError(
            "row-level deletes on a renamed-column history — the "
            "field-id scan and the delete scan don't compose yet"
        )
    if partition_filter:
        specs = meta.get("partition-specs") or (
            [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
        )
        all_names = {
            f["name"] for s in specs for f in s.get("fields", [])
        }
        fields_by_id = {f["id"]: f for f in _fields}
        # predicates resolve two ways (round-7 verdict elective #4):
        # a partition FIELD name matches its stored value directly; a
        # SOURCE column name evaluates the field's transform (bucket =
        # spec murmur3, truncate = floor-mod/prefix, year/month/day =
        # epoch offsets) on the literal DRIVER-side, so bucket/
        # truncate-partitioned tables prune at planning time too.
        # Under partition EVOLUTION (r13) every spec contributes its
        # expected value for the fields it defines, and a file whose
        # partition record never CARRIED a predicated field (written
        # before the evolution) is KEPT — pruning it would drop rows
        # the caller asked for; bounds skipping handles those files
        # by source-column metrics instead.
        expected: dict[str, set[str]] = {}
        for k, v in partition_filter.items():
            found = False
            for s in specs:
                for f in s.get("fields", []):
                    if f["name"] == k:
                        expected.setdefault(k, set()).add(str(v))
                        found = True
                    elif (
                        fields_by_id.get(f["source-id"], {}).get("name")
                        == k
                    ):
                        src_t = fields_by_id[f["source-id"]]["type"]
                        val = _eval_transform(
                            f.get("transform", "identity"), src_t, v
                        )
                        expected.setdefault(f["name"], set()).add(
                            str(val)
                        )
                        found = True
            if not found:
                raise ValueError(
                    f"{k!r} is not a partition field or partition "
                    f"source in any spec "
                    f"(fields: {sorted(all_names)})"
                )
        live = [
            d
            for d in live
            if all(
                name not in (d.get("partition") or {})
                or str(d["partition"][name]) in vals
                for name, vals in expected.items()
            )
        ]
    residual = None
    if predicate:
        from pyspark.sql import functions as F

        residual = F.expr(predicate)
        if atoms is not None:
            live = _skip_by_bounds(
                live,
                atoms,
                _fields,
                meta,
                session_tz=spark.conf.get(
                    "spark.sql.session.timeZone", "UTC"
                ),
            )
    if row_lineage:
        if fv < 3:
            raise ValueError(
                "row_lineage=True needs format-version 3 — row "
                "lineage does not exist before v3, so materializing "
                "ids would fabricate values"
            )
        if renamed:
            raise NotImplementedError(
                "row_lineage over a renamed-column history — the "
                "field-id scan and the lineage scan don\'t compose"
            )
    if not live:
        out = spark.createDataFrame([], schema)
        if row_lineage:
            from pyspark.sql import functions as F

            out = out.withColumn(
                "_row_id", F.lit(None).cast("long")
            ).withColumn(
                "_last_updated_sequence_number",
                F.lit(None).cast("long"),
            )
        return out.filter(residual) if residual is not None else out
    files = [_local(d["file_path"]) for d in live]
    if row_lineage or defaulted:
        out = (
            _scan_with_defaults(
                spark, schema, _fields, live, deletes, defaulted,
                lineage=row_lineage,
            )
            if defaulted
            else _lineage_scan(spark, schema, _fields, live, deletes)
        )
        return out.filter(residual) if residual is not None else out
    if renamed:
        out = _read_by_field_id(
            spark, files, _fields, name_mapping=_parse_name_mapping(meta)
        )
    elif deletes:
        out = _scan_with_deletes(spark, schema, _fields, live, deletes)
    else:
        out = spark.read.schema(schema).parquet(*files)
    # skipping only prunes files PROVEN matchless; the row-wise
    # filter keeps the semantics exact
    return out.filter(residual) if residual is not None else out


def _lineage_scan(
    spark: SparkSession,
    schema: T.StructType,
    fields: list[dict],
    live: list[dict],
    deletes: list[dict],
    keep_pos: bool = False,
) -> DataFrame:
    """All schema columns + the v3 Row Lineage pair, coalesced per
    row per spec: the file's MATERIALIZED ``_row_id`` /
    ``_last_updated_sequence_number`` columns when non-null (rows
    carried through a rewrite keep their identity), else the manifest
    entry's ``first_row_id`` + the row's position / the file's data
    sequence number. Every live file must carry ``first_row_id``
    (loud refusal — lineage ids are never fabricated). Shared by
    ``read_iceberg(row_lineage=True)`` and the v3 rewriting verbs,
    whose spec duty is to write exactly these values back."""
    from pyspark.sql import functions as F

    missing = sorted(
        os.path.basename(_local(d["file_path"]))
        for d in live
        if d.get("first_row_id") is None
    )
    if missing:
        raise ValueError(
            f"{len(missing)} live data file(s) carry no "
            f"first_row_id (e.g. {missing[0]!r}) — lineage ids "
            "cannot be materialized for them"
        )
    # read the materialized lineage columns alongside the schema
    # (files without them fill null; materialized wins) and keep
    # positions through the delete-aware scan
    lineage_schema = T.StructType(
        schema.fields
        + [
            T.StructField("_row_id", T.LongType(), True),
            T.StructField(
                "_last_updated_sequence_number", T.LongType(), True
            ),
        ]
    )
    scan = _scan_with_deletes(
        spark, lineage_schema, fields, live, deletes,
        keep_pos=True,
    )
    fr_rows = [
        (
            os.path.basename(_local(d["file_path"])),
            int(d["first_row_id"]),
            int(d["_seq"]),
        )
        for d in live
    ]
    fr_df = spark.createDataFrame(
        fr_rows, "__frbase string, __fr long, __fseq long"
    )
    joined = scan.join(
        F.broadcast(fr_df),
        scan["__base"] == fr_df["__frbase"],
        "left",
    )
    sel = [F.col(f.name) for f in schema.fields] + [
        F.coalesce(F.col("_row_id"), F.col("__fr") + F.col("__ri"))
        .cast("long")
        .alias("_row_id"),
        F.coalesce(
            F.col("_last_updated_sequence_number"),
            F.col("__fseq"),
        )
        .cast("long")
        .alias("_last_updated_sequence_number"),
    ]
    if keep_pos:
        # the MoR DML planners address rows by (file basename,
        # position) — keep the scan's addressing columns
        sel += [scan["__base"], scan["__ri"]]
    return joined.select(sel)


def _default_literal(
    f: dict, spark_type: T.DataType, key: str = "initial-default"
):
    """A v3 ``initial-default`` / ``write-default`` JSON single-value
    as a typed Spark literal (table spec §JSON single-value
    serialization): booleans and numbers are their JSON forms;
    string/date/decimal/timestamp defaults arrive as JSON strings and
    cast to the column's type. Unsupported shapes
    (struct/list/map/binary/uuid) refuse by name."""
    from pyspark.sql import functions as F

    v = f[key]
    t = f.get("type")
    t_name = t if isinstance(t, str) else (t or {}).get("type", "")
    if isinstance(v, (dict, list)) or str(t_name) in (
        "binary", "fixed", "uuid", "struct", "list", "map",
    ):
        raise NotImplementedError(
            f"initial-default for column {f.get('name')!r} of type "
            f"{t_name!r} is out of scope (primitive defaults only)"
        )
    return F.lit(v).cast(spark_type)


def _scan_with_defaults(
    spark: SparkSession,
    schema: T.StructType,
    fields: list[dict],
    live: list[dict],
    deletes: list[dict],
    defaulted: list[dict],
    keep_pos: bool = False,
    lineage: bool = False,
) -> DataFrame:
    """Scan a v3 table whose current schema declares
    ``initial-default`` columns (added after some data was written):
    rows in files that PREDATE a column must surface its declared
    default, not NULL — so live files group by which defaulted
    columns their parquet footer actually lacks (driver-side footer
    sniff, O(files) metadata; only tables WITH defaults pay it), each
    group scans once through the delete-aware path, and the missing
    columns fill with the typed default literal. Files that carry
    the column keep its stored values — including real NULLs (the
    spec: initial-default applies only to pre-schema files).
    ``lineage`` threads the group scans through
    :func:`_lineage_scan` (the row-lineage pair rides along);
    ``keep_pos`` keeps the (``__base``, ``__ri``) addressing columns
    — together they make the DML planners default-aware."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    groups: dict[frozenset, list[dict]] = {}
    for d in live:
        fpath = _local(d["file_path"])
        have = set(pq.ParquetFile(fpath).schema_arrow.names)
        missing = frozenset(
            f["name"] for f in defaulted if f["name"] not in have
        )
        groups.setdefault(missing, []).append(d)
    by_name = {f.name: f for f in schema.fields}
    extras = (
        ["_row_id", "_last_updated_sequence_number"] if lineage else []
    ) + (["__base", "__ri"] if keep_pos else [])
    parts: list[DataFrame] = []
    for missing, files in sorted(
        groups.items(), key=lambda kv: sorted(kv[0])
    ):
        if lineage:
            df = _lineage_scan(
                spark, schema, fields, files, deletes,
                keep_pos=keep_pos,
            )
        elif deletes or keep_pos:
            df = _scan_with_deletes(
                spark, schema, fields, files, deletes,
                keep_pos=keep_pos,
            )
        else:
            df = spark.read.schema(schema).parquet(
                *[_local(d["file_path"]) for d in files]
            )
        for f in defaulted:
            if f["name"] in missing:
                df = df.withColumn(
                    f["name"],
                    _default_literal(f, by_name[f["name"]].dataType),
                )
        parts.append(
            df.select(
                [F.col(fl.name) for fl in schema.fields]
                + [F.col(c) for c in extras]
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def _scan_with_deletes(
    spark: SparkSession,
    schema: T.StructType,
    fields: list[dict],
    data_files: list[dict],
    delete_files: list[dict],
    keep_pos: bool = False,
) -> DataFrame:
    """v2 MERGE-ON-READ: apply position (content=1) and equality
    (content=2) delete files to the data scan with anti-joins — the
    Spark-native form of the spec's delete semantics, no per-row
    Python anywhere:

    - the data scan rides ``_metadata.file_path`` / ``row_index``
      (Spark's parquet metadata columns) plus each file's manifest
      sequence number, attached by a broadcast basename join (the
      delta_io discipline; basename collisions raise);
    - POSITION deletes: ``left_anti`` on (file basename, pos) with
      the residual ``delete_seq >= data_seq`` — equi keys keep it a
      hash join, never a nested loop;
    - EQUALITY deletes, grouped by their ``equality_ids`` set: rows
      are removed when a delete row null-safe-equals on every
      equality column AND ``delete_seq > data_seq`` (the spec's
      strict ordering: an equality delete never affects data written
      in the same or a later sequence). Each group's delete files
      read once, distinct-ed, and anti-joined.

    Both delete frames shuffle on their join keys — at 100 TB the
    delete side is typically ≪ data side and AQE may broadcast it;
    nothing here is driver-side except the O(files) seq map."""
    from pyspark.sql import functions as F

    files = [_local(d["file_path"]) for d in data_files]
    by_base: dict[str, int] = {}
    for d in data_files:
        base = os.path.basename(_local(d["file_path"]))
        if base in by_base and by_base[base] != int(d["_seq"]):
            raise ValueError(
                f"duplicate data-file basename {base!r} with differing "
                "sequence numbers — cannot apply deletes safely"
            )
        by_base[base] = int(d["_seq"])
    seq_df = F.broadcast(
        spark.createDataFrame(
            sorted(by_base.items()), "__base string, __dseq long"
        )
    )
    df = (
        spark.read.schema(schema)
        .parquet(*files)
        .withColumn(
            "__base",
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
        )
        .withColumn("__ri", F.col("_metadata.row_index"))
        .join(seq_df, "__base")
    )
    pos_groups: dict[int, list[str]] = {}
    eq_groups: dict[tuple, list[tuple[str, int]]] = {}
    dv_entries: list[dict] = []
    for d in delete_files:
        if _is_dv_entry(d):
            # v3 deletion vector: positions live in a Puffin blob
            # keyed to ONE referenced data file (r16 — decoded below
            # through the shared roaring codec; union with v2-style
            # position deletes is safe, the spec's upgrade rule makes
            # a DV a superset of the positions it replaced)
            dv_entries.append(d)
            continue
        if int(d["content"]) == 1:
            pos_groups.setdefault(int(d["_seq"]), []).append(
                _local(d["file_path"])
            )
        else:
            ids = tuple(sorted(d.get("equality_ids") or ()))
            if not ids:
                raise ValueError(
                    f"equality delete {d.get('file_path')!r} carries "
                    "no equality_ids"
                )
            eq_groups.setdefault(ids, []).append(
                (_local(d["file_path"]), int(d["_seq"]))
            )
    if pos_groups or dv_entries:
        pos_parts = [
            spark.read.schema("file_path string, pos long")
            .parquet(*paths)
            .select(
                F.element_at(F.split("file_path", "/"), -1).alias(
                    "__pbase"
                ),
                F.col("pos").alias("__pos"),
                F.lit(seq).cast("long").alias("__pseq"),
            )
            for seq, paths in sorted(pos_groups.items())
        ]
        if dv_entries:
            pos_parts.append(_dv_positions_frame(spark, dv_entries))
        pos = pos_parts[0]
        for p_ in pos_parts[1:]:
            pos = pos.unionByName(p_)
        df = df.join(
            pos,
            (F.col("__base") == F.col("__pbase"))
            & (F.col("__ri") == F.col("__pos"))
            & (F.col("__pseq") >= F.col("__dseq")),
            "left_anti",
        )
    name_of_id = {f["id"]: f["name"] for f in fields}
    type_of_name = {f.name: f.dataType for f in schema.fields}
    for ids, file_seqs in sorted(eq_groups.items()):
        cols = []
        for fid in ids:
            nm = name_of_id.get(fid)
            if nm is None or nm not in type_of_name:
                raise NotImplementedError(
                    f"equality delete references field id {fid} not in "
                    "the current schema"
                )
            cols.append(nm)
        read_schema = T.StructType(
            [T.StructField(c, type_of_name[c], True) for c in cols]
        )
        parts = [
            spark.read.schema(read_schema)
            .parquet(p_)
            .withColumn("__eseq", F.lit(seq).cast("long"))
            for p_, seq in sorted(file_seqs)
        ]
        eq = parts[0]
        for p_ in parts[1:]:
            eq = eq.unionByName(p_)
        eq = eq.groupBy(cols).agg(F.max("__eseq").alias("__eseq"))
        cond = F.col("__eseq") > F.col("__dseq")
        for c in cols:
            cond = cond & df[c].eqNullSafe(eq[c])
        df = df.join(eq, cond, "left_anti")
    sel = [F.col(f.name) for f in schema.fields]
    if keep_pos:
        sel += [F.col("__base"), F.col("__ri")]
    return df.select(sel)


# ----------------------------------------------------------- writer


def _KV_MAP(name: str, value_type: str) -> list:
    """The spec's optional map<int, value> avro shape: a nullable
    array of {key:int, value:<t>} records (Avro maps key by string,
    so Iceberg maps with int keys use this k/v-array form)."""
    return [
        "null",
        {
            "type": "array",
            "logicalType": "map",
            "items": {
                "type": "record",
                "name": name,
                "fields": [
                    {"name": "key", "type": "int"},
                    {"name": "value", "type": value_type},
                ],
            },
        },
    ]


_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102", "fields": [],
                    }},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    # per-file column metrics (table-spec §Manifests,
                    # r13): map<int,…> in the spec's k/v-array avro
                    # encoding, keyed by field id — read_iceberg's
                    # predicate pruning decodes these (Appendix D)
                    {
                        "name": "value_counts",
                        "type": _KV_MAP("k119_v120", "long"),
                        "default": None,
                    },
                    {
                        "name": "null_value_counts",
                        "type": _KV_MAP("k121_v122", "long"),
                        "default": None,
                    },
                    {
                        "name": "lower_bounds",
                        "type": _KV_MAP("k126_v127", "bytes"),
                        "default": None,
                    },
                    {
                        "name": "upper_bounds",
                        "type": _KV_MAP("k129_v130", "bytes"),
                        "default": None,
                    },
                    # the sort order the file was written under
                    # (spec data_file field 140; 0/absent = unsorted)
                    {
                        "name": "sort_order_id",
                        "type": ["null", "int"],
                        "default": None,
                    },
                ],
            },
        },
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
        # table-spec §Manifest Lists field 508: per-partition-field
        # summaries (positional by the manifest's spec fields) — at
        # 100 TB these skip WHOLE manifests for partition predicates
        # before any manifest Avro decodes (r14, r13 verdict #2)
        {
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "field_summary",
                        "fields": [
                            {
                                "name": "contains_null",
                                "type": "boolean",
                            },
                            {
                                "name": "contains_nan",
                                "type": ["null", "boolean"],
                                "default": None,
                            },
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                            },
                        ],
                    },
                },
            ],
            "default": None,
        },
    ],
}


def _ml_row(m: dict) -> dict:
    """Normalize a manifest_file dict (ours or a foreign decode) to
    exactly the manifest-list schema's fields — carried-forward
    entries must keep their partition summaries, never default them
    to a type-invalid 0."""
    row = {
        k: m.get(k, 0)
        for k in (f["name"] for f in _MANIFEST_FILE_SCHEMA["fields"])
        if k != "partitions"
    }
    sums = m.get("partitions")
    row["partitions"] = (
        [
            {
                "contains_null": bool(s.get("contains_null", False)),
                "contains_nan": s.get("contains_nan"),
                "lower_bound": s.get("lower_bound"),
                "upper_bound": s.get("upper_bound"),
            }
            for s in sums
        ]
        if sums
        else None
    )
    return row


def _ml_totals(ml_rows: list[dict]) -> tuple[int, int, int, int]:
    """(total data files, total data records, total delete files,
    total delete records) over a manifest list's rows. Entries a
    manifest lists as ADDED or EXISTING are live; DELETED ones are
    not — so live counts are added + existing per manifest, summed.
    Metadata-plane arithmetic over the rows each commit already
    writes; no file scan."""
    df = dr = delf = delr = 0
    for m in ml_rows:
        files = int(m.get("added_files_count", 0) or 0) + int(
            m.get("existing_files_count", 0) or 0
        )
        rows = int(m.get("added_rows_count", 0) or 0) + int(
            m.get("existing_rows_count", 0) or 0
        )
        if int(m.get("content", 0) or 0) == 1:
            delf += files
            delr += rows
        else:
            df += files
            dr += rows
    return df, dr, delf, delr


def _snapshot_summary(
    operation: str,
    ml_rows: list[dict],
    parent_summary: dict | None,
    **deltas,
) -> dict[str, str]:
    """The spec's snapshot ``summary`` map (r15 verdict #9 — the
    Delta operationMetrics twin): ``operation`` plus the
    added/deleted per-commit deltas the caller supplies
    (added-data-files, added-records, added-files-size,
    deleted-data-files, deleted-records, removed-files-size,
    added-delete-files, added-position-deletes — zero/None deltas are
    omitted, the spark-iceberg convention) and exact
    total-data-files / total-records / total-delete-files /
    total-position-deletes recomputed from the NEW manifest list's
    own rows. ``total-files-size`` chains through the parent
    snapshot's summary (parent total + added - removed) and is
    omitted when a foreign parent never stamped it — never guessed.
    Every value serializes as a string, per spec
    (map<string, string>)."""
    out: dict[str, str] = {"operation": operation}
    for k in (
        "added-data-files",
        "added-records",
        "added-files-size",
        "deleted-data-files",
        "deleted-records",
        "removed-files-size",
        "added-delete-files",
        "added-position-deletes",
    ):
        v = deltas.get(k.replace("-", "_"))
        if v:
            out[k] = str(int(v))
    tdf, tdr, tdelf, tdelr = _ml_totals(ml_rows)
    out["total-data-files"] = str(tdf)
    out["total-records"] = str(tdr)
    out["total-delete-files"] = str(tdelf)
    out["total-position-deletes"] = str(tdelr)
    added_sz = int(deltas.get("added_files_size") or 0)
    removed_sz = int(deltas.get("removed_files_size") or 0)
    if deltas.get("total_files_size") is not None:
        # the caller knows the live byte total outright (overwrite:
        # the new files ARE the table) — no chaining needed
        out["total-files-size"] = str(int(deltas["total_files_size"]))
    elif parent_summary is None:
        out["total-files-size"] = str(added_sz)
    elif "total-files-size" in parent_summary:
        out["total-files-size"] = str(
            max(
                0,
                int(parent_summary["total-files-size"])
                + added_sz
                - removed_sz,
            )
        )
    return out


def _parent_summary(meta: dict, parent_id) -> dict | None:
    """The parent snapshot's summary map, or None when this commit
    has no parent (table creation / overwrite of an empty table)."""
    if parent_id is None or parent_id == -1:
        return None
    snap = next(
        (
            s
            for s in meta.get("snapshots", [])
            if s["snapshot-id"] == parent_id
        ),
        None,
    )
    return (snap or {}).get("summary") or {}


def iceberg_ndv(path: str, snapshot_id: int | None = None) -> dict[str, int]:
    """column name → distinct-count (ndv) from the table's Puffin
    statistics files (r15 verdict #3 — the spec's CBO sidecar; the
    ``statistics`` metadata field was previously ignored).

    Resolution follows spark-iceberg's ComputeTableStats consumption:
    the ``statistics`` entry whose ``snapshot-id`` matches the
    requested (default: current) snapshot wins; with no exact match
    the entry for the nearest ANCESTOR of the requested snapshot is
    used (stale ndv beats no ndv for a CBO — the estimate degrades
    gracefully as the table drifts from the analyzed snapshot).
    Per-field ndv comes from the entry's ``blob-metadata``
    ``properties.ndv`` (spec-required on
    apache-datasketches-theta-v1 blobs), falling back to reading the
    Puffin file's footer when a foreign writer embedded bare
    blob-metadata. Field ids bind to CURRENT column names via the
    schema, so renames stay correct. Returns {} when the table
    carries no statistics — callers fall through to computing their
    own distincts."""
    from census_asc5_data_pipeline_spark.sources import puffin

    _v, meta = _current_metadata(path)
    stats = meta.get("statistics") or []
    if not stats:
        return {}
    target = (
        int(snapshot_id)
        if snapshot_id is not None
        else meta.get("current-snapshot-id")
    )
    if target is None or target == -1:
        return {}
    by_snap = {int(s["snapshot-id"]): s for s in stats}
    entry = by_snap.get(int(target))
    if entry is None:
        # walk the ancestry for the nearest analyzed ancestor
        snaps = {
            int(s["snapshot-id"]): s for s in meta.get("snapshots", [])
        }
        cur = snaps.get(int(target))
        while cur is not None:
            parent = cur.get("parent-snapshot-id")
            if parent is None:
                break
            if int(parent) in by_snap:
                entry = by_snap[int(parent)]
                break
            cur = snaps.get(int(parent))
    if entry is None:
        return {}
    ndv_by_id: dict[int, int] = {}
    missing_props = False
    for blob in entry.get("blob-metadata") or []:
        if blob.get("type") not in puffin.NDV_BLOB_TYPES:
            continue
        fields = blob.get("fields") or []
        ndv = (blob.get("properties") or {}).get("ndv")
        if len(fields) != 1:
            continue
        if ndv is None:
            missing_props = True
        else:
            ndv_by_id[int(fields[0])] = int(ndv)
    if missing_props or not (entry.get("blob-metadata")):
        sp = _local(entry["statistics-path"])
        if os.path.exists(sp):
            for fid, v in puffin.puffin_ndv(sp).items():
                ndv_by_id.setdefault(fid, v)
    _schema, fields = _schema_of(meta, allow_renames=True)
    name_of = {int(f["id"]): f["name"] for f in fields}
    return {
        name_of[fid]: v
        for fid, v in sorted(ndv_by_id.items())
        if fid in name_of
    }


def attach_statistics(
    path: str,
    statistics_path: str,
    blob_metadata: list[dict] | None = None,
    snapshot_id: int | None = None,
) -> int:
    """Register a Puffin statistics file in the table metadata's
    ``statistics`` field (the spec's SetStatistics update): one new
    metadata version whose entry replaces any existing entry for the
    same snapshot (the spec allows at most one statistics file per
    snapshot). ``blob_metadata`` defaults to the Puffin footer's own
    blob list. Returns the new metadata version."""
    from census_asc5_data_pipeline_spark.sources import puffin

    cur_v, meta = _current_metadata(path)
    sid = (
        int(snapshot_id)
        if snapshot_id is not None
        else meta.get("current-snapshot-id")
    )
    if sid is None or sid == -1:
        raise ValueError("table has no snapshot to attach statistics to")
    # the spec marks file-footer-size-in-bytes REQUIRED on the
    # statistics-file struct (Java's StatisticsFileParser rejects
    # metadata without it, r15 ADVICE) — derive it from the Puffin
    # framing itself, never guessed
    footer_size = puffin.puffin_footer_size(statistics_path)
    if blob_metadata is None:
        blob_metadata = puffin.read_puffin_footer(statistics_path).get(
            "blobs", []
        )
    entry = {
        "snapshot-id": int(sid),
        "statistics-path": os.path.abspath(statistics_path),
        "file-size-in-bytes": os.path.getsize(statistics_path),
        "file-footer-size-in-bytes": int(footer_size),
        "blob-metadata": blob_metadata,
    }
    new_meta = dict(meta)
    new_meta["statistics"] = [
        s
        for s in (meta.get("statistics") or [])
        if int(s["snapshot-id"]) != int(sid)
    ] + [entry]
    new_v = cur_v + 1
    _write_metadata_version(path, new_v, new_meta)
    return new_v


def analyze_iceberg_ndv(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    exact: bool = False,
) -> int:
    """ANALYZE for the CBO sidecar (r15 — the WRITE half of the
    Puffin ndv READ; spark-iceberg's ComputeTableStats analog):
    compute per-column distinct counts over the CURRENT snapshot in
    ONE distributed aggregate (HLL++ ``approx_count_distinct`` by
    default — at 100 TB an exact distinct per column is a wide
    shuffle; ``exact=True`` for deterministic tests), write them as a
    Puffin statistics file under ``metadata/`` and register it via
    :func:`attach_statistics`. Blobs use the engine's honest
    ``census-asc5-ndv-v1`` type (payload = self-describing JSON, the
    spec-shaped ``ndv`` property carries the value) — NOT the theta
    type, whose payload must be a real DataSketches sketch for
    foreign merges; :func:`iceberg_ndv` and spark's own property
    readers consume the ndv either way, unknown readers skip the
    blob per Puffin's contract. Returns the new metadata version."""
    cur_v, meta = _current_metadata(path)
    snap_id = meta.get("current-snapshot-id")
    if snap_id is None or snap_id == -1:
        raise ValueError("table has no snapshot to analyze")
    snap = next(
        s
        for s in meta.get("snapshots", [])
        if s["snapshot-id"] == snap_id
    )
    from pyspark.sql import functions as F

    _schema, fields = _schema_of(meta, allow_renames=True)
    id_of = {f["name"]: int(f["id"]) for f in fields}
    cols = list(columns) if columns else [f["name"] for f in fields]
    unknown = [c for c in cols if c not in id_of]
    if unknown:
        raise ValueError(f"columns {unknown} not in the table schema")
    df = read_iceberg(spark, path)
    aggs = [
        (
            F.count_distinct(F.col(f"`{c}`"))
            if exact
            else F.approx_count_distinct(f"`{c}`", 0.02)
        ).alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).collect()[0]
    from census_asc5_data_pipeline_spark.sources import puffin

    seq = int(snap.get("sequence-number", 0) or 0)
    blobs = []
    for c in cols:
        ndv = int(row[c])
        blobs.append(
            (
                json.dumps(
                    {"ndv": ndv, "column": c, "field-id": id_of[c]}
                ).encode("utf-8"),
                {
                    "type": "census-asc5-ndv-v1",
                    "fields": [id_of[c]],
                    "snapshot-id": int(snap_id),
                    "sequence-number": seq,
                    "properties": {"ndv": str(ndv)},
                },
            )
        )
    sp = os.path.join(
        _meta_dir(path),
        f"stats-{snap_id}-{uuid.uuid4().hex}.puffin",
    )
    blob_meta = puffin.write_puffin(
        sp,
        blobs,
        properties={
            "created-by": "census_asc5_data_pipeline_spark analyze"
        },
    )
    return attach_statistics(
        path, sp, blob_metadata=blob_meta, snapshot_id=int(snap_id)
    )


def _partition_summaries(
    files: list[dict], pcol_ice: list[tuple[str, str]]
) -> list[dict] | None:
    """field_summary per partition field (spec field 508) from the
    manifest's data_file partition structs: contains_null + Appendix-D
    lower/upper bounds in the field's RESULT type. A field whose
    values don't bound (encode returns None) gets a null-bounds
    summary — contains_null stays trustworthy, bounds just don't
    prune."""
    if not pcol_ice or not files:
        return None
    out: list[dict] = []
    for name, ice_t in pcol_ice:
        contains_null = False
        unbounded = False
        lo = hi = None
        for d in files:
            v = (d.get("partition") or {}).get(name)
            if v is None:
                # keep scanning ALL files for nulls even when bounds
                # fail — an under-reported contains_null would let an
                # IS NULL predicate prune a manifest wrongly
                contains_null = True
                continue
            if unbounded:
                continue
            try:
                if lo is None or v < lo:
                    lo = v
                if hi is None or hi < v:
                    hi = v
            except TypeError:
                unbounded = True
                lo = hi = None
        lb = (
            iceberg_bounds.encode_bound(ice_t, lo)
            if lo is not None
            else None
        )
        ub = (
            iceberg_bounds.encode_bound(ice_t, hi)
            if hi is not None
            else None
        )
        out.append(
            {
                "contains_null": contains_null,
                "contains_nan": None,
                "lower_bound": lb,
                "upper_bound": ub if lb is not None else None,
            }
        )
    return out


def _entry_schema_for(pcols: list[tuple[str, str]]) -> dict:
    """manifest_entry schema with the table's partition struct
    (identity fields, nullable)."""
    sch = json.loads(json.dumps(_MANIFEST_ENTRY_SCHEMA))
    part = sch["fields"][2]["type"]["fields"][3]["type"]
    part["fields"] = [
        {"name": n, "type": ["null", t]} for n, t in pcols
    ]
    return sch


def write_iceberg(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    branch: str | None = None,
    format_version: int | None = None,
) -> int:
    """Write ``df`` as a new Iceberg v2 snapshot; returns the
    snapshot id. ``append`` keeps prior manifests in the new
    snapshot's manifest list; ``overwrite`` lists only the new one
    (prior snapshots stay readable AS OF — the log is immutable).
    Data files keep ALL columns (identity-partition sources included,
    per spec): the partition layout is driven by a cloned staging
    column so the real column stays in the parquet. Commit =
    manifest avro → manifest-list avro → new ``v<N>.metadata.json`` →
    ``version-hint.text`` atomic replace (readers resolve hint-first,
    so a crash before the hint flip leaves the old version current —
    the delta_io pointer discipline).

    ``branch`` (round-13 verdict #3, table-spec §refs — the
    write-audit-publish flow): commit the snapshot onto an EXISTING
    branch ref instead of main — the snapshot's parent (and, for
    append, its inherited manifests) is the branch's head,
    ``refs[branch]`` advances to the new snapshot (retention knobs
    preserved), and ``current-snapshot-id`` / ``snapshot-log`` (the
    main lineage, per spec) do NOT move. Audit with
    ``read_iceberg(..., ref=branch)``; publish with
    :func:`fast_forward`.

    ``format_version`` (r16): create the table at format-version 3
    (row lineage maintained from ``next-row-id`` 0) instead of the
    default 2. On an EXISTING table the table's own version governs;
    passing a different one raises."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r} (append|overwrite)")
    if format_version is not None and int(format_version) not in (2, 3):
        raise ValueError(
            f"format_version {format_version!r}: 2 (default) or 3"
        )
    spark = df.sparkSession
    part_fields = _parse_partition_by(list(partition_by or []))
    for pf in part_fields:
        if pf["source"] not in df.columns:
            raise ValueError(
                f"partition source column {pf['source']!r} not in DataFrame"
            )
    # v3 write-default (late r16, table spec §Default values): a df
    # missing a column whose field declares write-default fills it at
    # write time and reorders to the table schema — the ordinary
    # signature enforcement below still guards real drift (a missing
    # column WITHOUT a write-default keeps raising)
    if os.path.isdir(_meta_dir(path)) and _metadata_files(path):
        _wd_meta = _current_metadata(path)[1]
        if int(_wd_meta.get("format-version", 2)) >= 3:
            _wd_schema, _wd_fields = _schema_of(_wd_meta)
            fill = [
                f
                for f in _wd_fields
                if f.get("write-default") is not None
                and f["name"] not in df.columns
            ]
            if fill and {f["name"] for f in _wd_fields} == (
                set(df.columns) | {f["name"] for f in fill}
            ):
                from pyspark.sql import functions as F

                by_name = {f.name: f for f in _wd_schema.fields}
                for f in fill:
                    df = df.withColumn(
                        f["name"],
                        _default_literal(
                            f,
                            by_name[f["name"]].dataType,
                            key="write-default",
                        ),
                    )
                df = df.select(
                    [F.col(f.name) for f in _wd_schema.fields]
                )
    ice_fields = []
    for i, f in enumerate(df.schema.fields):
        t = _SPARK_TO_ICE.get(f.dataType.simpleString())
        if t is None:
            raise ValueError(
                "iceberg writer supports flat primitives + timestamp; "
                f"{f.name!r} is {f.dataType.simpleString()!r}"
            )
        ice_fields.append(
            {
                "id": i + 1,
                "name": f.name,
                "required": not f.nullable,
                "type": t,
            }
        )
    ice_by_name = {f["name"]: f for f in ice_fields}

    def _pcol_ice_of(pfs: list[dict]) -> list[tuple[str, str]]:
        return [
            (
                pf["name"],
                _transform_result_type(
                    pf["transform"], ice_by_name[pf["source"]]["type"]
                ),
            )
            for pf in pfs
        ]

    pcol_ice = _pcol_ice_of(part_fields)

    exists = os.path.isdir(_meta_dir(path)) and _metadata_files(path)
    schema_changed = False
    prev_schemas: list[dict] = []
    prev_sid = 0
    branch_base: int | None = None
    if branch is not None and not exists:
        raise ValueError(
            f"branch write to {branch!r} requires an existing table — "
            "create the table (and the branch ref) first"
        )
    if exists:
        cur_v, meta = _current_metadata(path)
        _format_version_gate(
            meta, "write_iceberg", write=True, v3_write_ok=True,
            # appends stage files carrying EVERY column (write-default
            # fill above), so initial-default semantics are unaffected
            defaults_ok=True,
        )
        if branch is not None:
            bref = (meta.get("refs") or {}).get(branch)
            if bref is None:
                raise ValueError(
                    f"unknown branch {branch!r} — create_branch first "
                    f"(refs: {sorted(meta.get('refs') or {})})"
                )
            if bref.get("type") != "branch":
                raise ValueError(
                    f"ref {branch!r} is a {bref.get('type')!r}, not a "
                    "branch — only branches accept writes"
                )
            branch_base = int(bref["snapshot-id"])
        _prev_schema, prev_fields = _schema_of(meta)
        prev_schemas = list(
            meta.get("schemas") or ([meta["schema"]] if "schema" in meta else [])
        )
        prev_sid = meta.get("current-schema-id", 0)
        # schema enforcement (round-7 ADVICE): an append whose (name,
        # type) signature drifts from the current schema would rebind
        # field ids and null old data on by-name reads — raise; an
        # overwrite registers the new schema as a NEW schema-id with
        # name-stable field ids, and the prior schemas list is carried
        # forward so the _schema_of rename gate keeps seeing history
        prev_sig = [(f["name"], f["type"]) for f in prev_fields]
        new_sig = [(f["name"], f["type"]) for f in ice_fields]
        if new_sig == prev_sig:
            # a FOREIGN table may declare required=true fields; this
            # writer validates them before the snapshot commits (a
            # schema-replacing overwrite re-registers with this
            # writer's all-optional fields, so no check there)
            _check_required(df, prev_fields, mode.upper())
        if new_sig != prev_sig:
            if mode != "overwrite":
                raise ValueError(
                    "schema mismatch vs table's current schema: "
                    f"table={prev_sig} df={new_sig}; only "
                    "mode='overwrite' may evolve the schema"
                )
            if branch is not None:
                raise NotImplementedError(
                    "schema evolution on a BRANCH write is out of "
                    "scope — current-schema-id is table-global, so it "
                    "would change what main readers see before publish"
                )
            schema_changed = True
            prev_by_name = {f["name"]: f["id"] for f in prev_fields}
            next_id = max(
                [meta.get("last-column-id", 0)]
                + [f["id"] for s in prev_schemas for f in s.get("fields", [])]
            )
            for f in ice_fields:
                if f["name"] in prev_by_name:
                    f["id"] = prev_by_name[f["name"]]
                else:
                    next_id += 1
                    f["id"] = next_id
        else:
            for f, pf in zip(ice_fields, prev_fields):
                f["id"] = pf["id"]
        id_to_name = {f["id"]: f["name"] for f in ice_fields}
        # writes follow the table's DEFAULT spec (r13 partition
        # evolution: older specs remain in partition-specs for their
        # files; new data lays out under default-spec-id)
        _specs_all = meta.get("partition-specs") or [
            {"spec-id": 0, "fields": meta.get("partition-spec", [])}
        ]
        prev_spec = next(
            s
            for s in _specs_all
            if s.get("spec-id", 0) == meta.get("default-spec-id", 0)
        )
        prev_pfs = [
            {
                "name": f["name"],
                "transform": f.get("transform", "identity"),
                "source": id_to_name.get(f["source-id"], "?"),
            }
            for f in prev_spec.get("fields", [])
        ]
        for pf in prev_pfs:
            if pf["source"] not in ice_by_name:
                raise ValueError(
                    f"partition source for field {pf['name']!r} is not "
                    "in the written schema — cannot keep the table's "
                    "partition spec"
                )
        if partition_by is not None and part_fields != prev_pfs:
            raise ValueError(
                f"partition_by {part_fields} != table spec {prev_pfs}"
            )
        part_fields = prev_pfs
        pcol_ice = _pcol_ice_of(part_fields)
    else:
        cur_v, meta = 0, {}

    # stage data files; clone partition sources so the parquet keeps
    # every column (spec requirement delta/hive don't have)
    from pyspark.sql import functions as F

    staging = os.path.join(path, "data", f".staging-{uuid.uuid4().hex}")
    # field-id stamps (spec requirement) make rename/drop resolution
    # work on this engine's own files
    out_df = _with_field_ids(df, ice_fields)
    writer_cols = []
    for pf in part_fields:
        e = _stage_partition_expr(
            pf["transform"], pf["source"], ice_by_name[pf["source"]]["type"]
        )
        out_df = out_df.withColumn(f"__pt_{pf['name']}", e)
        writer_cols.append(f"__pt_{pf['name']}")
    # the table's DEFAULT sort order (r13, spec §Sorting): a local
    # in-task sort clusters rows so every file's column bounds are
    # tight — write-side clustering composes with manifest-bounds
    # skipping at zero shuffle cost (sortWithinPartitions is narrow)
    sort_exprs = _sort_order_exprs(meta, ice_fields) if exists else []
    _so_id = (
        _default_sort_order(meta)[0] if exists and sort_exprs else 0
    )
    if sort_exprs:
        out_df = out_df.sortWithinPartitions(*sort_exprs)
    w = out_df.write.mode("overwrite")
    if writer_cols:
        w = w.partitionBy(*writer_cols)
    w.parquet(staging)

    import pyarrow.parquet as pq

    now_ms = int(time.time() * 1000)
    data_files = []
    try:
        for root, _dirs, fnames in os.walk(staging):
            for fn in sorted(fnames):
                if not fn.endswith(".parquet") or fn.startswith("."):
                    continue
                src = os.path.join(root, fn)
                rel = os.path.relpath(src, staging)
                pv: dict[str, str | None] = {}
                for comp in rel.split(os.sep)[:-1]:
                    if "=" in comp:
                        k, _, v = comp.partition("=")
                        v = urllib.parse.unquote(v)
                        pv[k.removeprefix("__pt_")] = (
                            None if v == "__HIVE_DEFAULT_PARTITION__" else v
                        )
                # per-FILE uuid rename: one task writing several
                # partition dirs reuses its part/task stem, and the
                # merge-on-read + change-feed basename maps require
                # global uniqueness (the delta_io._stage_adds rule)
                dst_rel = os.path.join(
                    os.path.dirname(rel.replace("__pt_", "")),
                    f"part-{uuid.uuid4().hex}.parquet",
                )
                dst = os.path.join(path, "data", dst_rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(src, dst)
                n_rows = pq.ParquetFile(dst).metadata.num_rows
                part_rec = {}
                for name, ice_t in pcol_ice:
                    raw = pv.get(name)
                    if raw is None:
                        part_rec[name] = None
                    elif ice_t in ("int", "long"):
                        part_rec[name] = int(raw)
                    else:
                        part_rec[name] = raw
                data_files.append(
                    {
                        "content": 0,
                        "file_path": os.path.abspath(dst),
                        "file_format": "PARQUET",
                        "partition": part_rec,
                        "record_count": int(n_rows),
                        "file_size_in_bytes": os.path.getsize(dst),
                        # column metrics from the footer (r13): value/
                        # null counts + Appendix-D bounds by field id
                        **iceberg_bounds.file_column_metrics(
                            dst, ice_fields
                        ),
                        **(
                            {"sort_order_id": _so_id}
                            if _so_id
                            else {}
                        ),
                    }
                )
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    new_v = (cur_v or 0) + 1
    snap_id = new_v
    seq = new_v
    # v3 ROW LINEAGE maintenance (r16 — the spec's mandatory v3
    # writer duty): every new data file takes an explicit
    # first_row_id block above the table's next-row-id, the snapshot
    # records its first-row-id, and next-row-id advances in the same
    # commit — fresh-row identity without any data rewrite
    if exists:
        fv_tbl = int(meta.get("format-version", 2))
        if format_version is not None and int(format_version) != fv_tbl:
            raise ValueError(
                f"table is format-version {fv_tbl}; cannot write it "
                f"as {format_version} — the table's version governs"
            )
    else:
        fv_tbl = int(format_version or 2)
    lineage_first: int | None = None
    lineage_next: int | None = None
    if fv_tbl >= 3:
        lineage_first = int(meta.get("next-row-id", 0) or 0)
        lineage_next = lineage_first
        for d in data_files:
            d["first_row_id"] = lineage_next
            lineage_next += int(d["record_count"])
    os.makedirs(_meta_dir(path), exist_ok=True)
    man_path = os.path.join(
        _meta_dir(path), f"manifest-{snap_id}-{uuid.uuid4().hex}.avro"
    )
    entry_schema = _entry_schema_for(pcol_ice)
    if fv_tbl >= 3:
        entry_schema["fields"][2]["type"]["fields"].append(
            {"name": "first_row_id", "type": ["null", "long"],
             "default": None}
        )
    with open(man_path, "wb") as fh:
        write_container_generic(
            fh,
            entry_schema,
            [
                {"status": 1, "snapshot_id": snap_id, "data_file": d}
                for d in data_files
            ],
        )
    prev_manifests: list[dict] = []
    if exists and mode == "append":
        # a branch append inherits the BRANCH head's manifests, not
        # main's — that is what makes the branch an independent line
        cur_snap_id = (
            branch_base
            if branch is not None
            else meta.get("current-snapshot-id")
        )
        snap = next(
            (
                s
                for s in meta.get("snapshots", [])
                if s["snapshot-id"] == cur_snap_id
            ),
            None,
        )
        if snap is not None and "manifest-list" in snap:
            _s, prev_manifests = read_container_generic(
                _local(snap["manifest-list"])
            )
    new_manifest = {
        "manifest_path": os.path.abspath(man_path),
        "manifest_length": os.path.getsize(man_path),
        "partition_spec_id": (
            int(meta.get("default-spec-id", 0)) if exists else 0
        ),
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(data_files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(d["record_count"] for d in data_files),
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": _partition_summaries(data_files, pcol_ice),
    }
    ml_path = os.path.join(
        _meta_dir(path), f"snap-{snap_id}-{uuid.uuid4().hex}.avro"
    )
    ml_rows = [_ml_row(m) for m in prev_manifests] + [
        _ml_row(new_manifest)
    ]
    with open(ml_path, "wb") as fh:
        write_container_generic(fh, _MANIFEST_FILE_SCHEMA, ml_rows)
    if not exists:
        cur_sid = 0
        schemas = [{"schema-id": 0, "type": "struct", "fields": ice_fields}]
    elif schema_changed:
        cur_sid = (
            max(s.get("schema-id", 0) for s in prev_schemas) + 1
            if prev_schemas
            else prev_sid + 1
        )
        schemas = prev_schemas + [
            {"schema-id": cur_sid, "type": "struct", "fields": ice_fields}
        ]
    else:
        cur_sid = prev_sid
        schemas = prev_schemas
    parent = (
        branch_base
        if branch is not None
        else meta.get("current-snapshot-id")
    )
    psum = _parent_summary(meta, parent if exists else None)
    deleted_kw: dict = {}
    if mode == "overwrite" and exists and psum:
        # overwrite logically drops the parent's whole live set; its
        # summary totals (stamped by every engine commit) ARE the
        # deleted deltas — foreign parents without totals just omit
        if "total-data-files" in psum:
            deleted_kw["deleted_data_files"] = int(
                psum["total-data-files"]
            )
        if "total-records" in psum:
            deleted_kw["deleted_records"] = int(psum["total-records"])
        if "total-files-size" in psum:
            deleted_kw["removed_files_size"] = int(
                psum["total-files-size"]
            )
    if mode == "overwrite":
        # after a replace the new files ARE the table, whatever the
        # parent knew about its own byte total
        deleted_kw["total_files_size"] = sum(
            int(d.get("file_size_in_bytes", 0) or 0)
            for d in data_files
        )
    snapshot = {
        "snapshot-id": snap_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": os.path.abspath(ml_path),
        "summary": _snapshot_summary(
            mode,
            ml_rows,
            psum,
            added_data_files=len(data_files),
            added_records=sum(d["record_count"] for d in data_files),
            added_files_size=sum(
                int(d.get("file_size_in_bytes", 0) or 0)
                for d in data_files
            ),
            **deleted_kw,
        ),
        "schema-id": cur_sid,
    }
    if lineage_first is not None:
        snapshot["first-row-id"] = int(lineage_first)
    if parent is not None and parent != -1:
        # spec §snapshots: parent-snapshot-id makes branch ancestry
        # (fast_forward's is-ancestor check) exact instead of
        # timestamp-approximated
        snapshot["parent-snapshot-id"] = int(parent)
    refs_out = dict(meta.get("refs") or {})
    if branch is not None:
        # the branch head advances; retention knobs ride along
        refs_out[branch] = {**refs_out[branch], "snapshot-id": snap_id}
    new_meta = {
        # a v3 table stays v3 — rebuilding at 2 would downgrade it
        # a v3 table stays v3 (and may be BORN v3 since r16) — the
        # rebuild preserves the table's version, never downgrades
        "format-version": fv_tbl,
        **(
            {"next-row-id": int(lineage_next)}
            if lineage_next is not None
            else {}
        ),
        "table-uuid": meta.get("table-uuid", str(uuid.uuid4())),
        "location": os.path.abspath(path),
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": max(
            f["id"] for s in schemas for f in s.get("fields", [])
        ),
        "current-schema-id": cur_sid,
        "schemas": schemas,
        # an existing table's spec HISTORY survives the write (r13
        # partition evolution — pre-r13 this rebuild clobbered every
        # non-default spec); creation mints spec 0
        "default-spec-id": (
            int(meta.get("default-spec-id", 0)) if exists else 0
        ),
        "partition-specs": (
            meta["partition-specs"]
            if exists and meta.get("partition-specs")
            else [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": pf["name"],
                            "transform": pf["transform"],
                            "source-id": ice_by_name[pf["source"]]["id"],
                            "field-id": 1000 + i,
                        }
                        for i, pf in enumerate(part_fields)
                    ],
                }
            ]
        ),
        # sort-order declarations survive writes too (r13)
        "default-sort-order-id": (
            int(meta.get("default-sort-order-id", 0)) if exists else 0
        ),
        "sort-orders": (
            meta["sort-orders"]
            if exists and meta.get("sort-orders")
            else [{"order-id": 0, "fields": []}]
        ),
        "properties": meta.get("properties", {}),
        # a branch write does NOT move main: current-snapshot-id and
        # snapshot-log (the main lineage, per spec) stay put
        "current-snapshot-id": (
            meta.get("current-snapshot-id", -1)
            if branch is not None
            else snap_id
        ),
        "snapshots": meta.get("snapshots", []) + [snapshot],
        "snapshot-log": (
            meta.get("snapshot-log", [])
            if branch is not None
            else meta.get("snapshot-log", [])
            + [{"timestamp-ms": now_ms, "snapshot-id": snap_id}]
        ),
        "metadata-log": meta.get("metadata-log", []),
    }
    if refs_out or meta.get("refs") is not None:
        # refs survive every write (pre-r13 this writer dropped them)
        new_meta["refs"] = refs_out
    if meta.get("statistics"):
        # Puffin statistics registrations survive writes too (r15 —
        # this rebuild would otherwise drop the field, exactly the
        # refs clobber class): the ndv reader walks the ancestry to
        # the nearest analyzed snapshot
        new_meta["statistics"] = meta["statistics"]
    _write_metadata_version(path, new_v, new_meta)
    return snap_id


def register_iceberg_views(
    spark: SparkSession, name: str, path: str
) -> list[str]:
    """SQL surface for the Iceberg table: ``name`` = current snapshot
    plus one ``name__s<id>`` view per snapshot in the log (snapshot
    ids, not versions — Iceberg's own addressing), mirroring
    ``delta_io.register_delta_views``. Returns the registered
    names."""
    out = [name]
    read_iceberg(spark, path).createOrReplaceTempView(name)
    for s in iceberg_snapshots(path):
        sid = s["snapshot-id"]
        vname = f"{name}__s{sid}"
        read_iceberg(spark, path, snapshot_id=sid).createOrReplaceTempView(
            vname
        )
        out.append(vname)
    return out


def _changed_files_of_range(
    path: str, snaps: list[dict]
) -> tuple[
    list[tuple[str, int]],
    list[tuple[str, int]],
    list[tuple[str, int, tuple]],
    list[tuple[dict, int]],
]:
    """(inserts, position_deletes, equality_deletes, dv_deletes)
    added by exactly the given snapshots. Attribution comes from the
    manifest LIST: a manifest belongs to the snapshot named by its
    ``added_snapshot_id``, so a snapshot's changes are the ADDED
    (status=1) entries of exactly its own manifests — appended/delete
    snapshots re-list prior manifests, which are skipped;
    ``rewrite_data_files`` lists status=0 EXISTING entries, also
    skipped (a compaction is not a logical change). Driver-side,
    metadata scale. Tuples: (data_path, sid) / (delete_path, sid) /
    (delete_path, sid, equality_ids) / (full DV entry dict, sid) —
    the DV entry keeps its reference fields because the feed must
    DIFF it against the prior DV state (a replacement blob is old ∪
    new; only the difference is this snapshot's retraction)."""
    inserts: list[tuple[str, int]] = []
    pos_dels: list[tuple[str, int]] = []
    eq_dels: list[tuple[str, int, tuple]] = []
    dv_dels: list[tuple[dict, int]] = []
    for snap in snaps:
        sid = snap["snapshot-id"]
        _sch, manifests = read_container_generic(
            _local(snap["manifest-list"])
        )
        for m in manifests:
            if int(m.get("added_snapshot_id", sid)) != sid:
                continue  # re-listed prior manifest: not this snapshot's
            mcontent = int(m.get("content", 0))
            _s2, entries = read_container_generic(
                _local(m["manifest_path"])
            )
            for e in entries:
                if int(e.get("status", 1)) != 1:
                    continue
                d = e["data_file"]
                content = int(d.get("content", 0) or 0)
                if content == 0 and mcontent == 1:
                    content = 1  # delete manifest default (spec rule)
                p_ = _local(d["file_path"])
                if content == 0:
                    inserts.append((p_, sid))
                elif content == 1 and _is_dv_entry(d):
                    dv_dels.append((dict(d), sid))
                elif content == 1:
                    pos_dels.append((p_, sid))
                elif content == 2:
                    eq_dels.append(
                        (p_, sid, tuple(d.get("equality_ids") or ()))
                    )
                else:
                    raise NotImplementedError(
                        f"data_file content {content!r} in {p_!r}"
                    )
    return inserts, pos_dels, eq_dels, dv_dels


def read_iceberg_changes(
    spark: SparkSession,
    path: str,
    since_snapshot_id: int | None = None,
) -> tuple[DataFrame, int | None]:
    """Incremental tail (the delta_io ``read_delta_changes`` contract
    on Iceberg's log): the rows CHANGED by each snapshot after
    ``since_snapshot_id``, tagged ``_snapshot_id`` and
    ``_change_type`` ('insert' | 'delete') — since round 9 a CDC
    consumer can tail a table that :func:`delete_iceberg_where` /
    :func:`delete_iceberg_positions` writes to (round-8 verdict #3)
    instead of the old delete-manifest gate:

    - inserts: the snapshot's own ADDED data files, full rows;
    - POSITION deletes (content=1): the deleted rows' FULL images,
      recovered by an inner hash join of the delete file's
      (file basename, pos) pairs against a ``_metadata.row_index``
      scan of exactly the referenced data files — O(referenced
      files), never a table scan;
    - EQUALITY deletes (content=2): key-only retraction rows — the
      equality columns carry the deleted keys, every other column is
      NULL (the delete file stores keys, not row images; emitting
      keys is the spec-faithful retraction, same contract as Iceberg's
      own changelog procedure for equality deletes);
    - v3 DELETION VECTORS (late r16): each snapshot's retraction set
      is the DIFF of its DV blob against the file's DV at the parent
      snapshot (a replacement blob is old ∪ new, so the diff is
      exactly this snapshot's deletions); full images recover
      through the same referenced-files join.

    ``rewrite_data_files`` compactions emit NOTHING (status=0
    entries are skipped). Returns (frame, last_snapshot_id)."""
    _v, meta = _current_metadata(path)
    _format_version_gate(meta, "read_iceberg_changes", write=False)
    schema, fields = _schema_of(meta)
    snaps = sorted(
        meta.get("snapshots", []), key=lambda s: s["snapshot-id"]
    )
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in schema.fields]
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_snapshot_id", T.LongType()),
        ]
    )
    if not snaps:
        return spark.createDataFrame([], out_schema), since_snapshot_id
    # cursor stops at the MAIN head (r13): unpublished WAP-branch
    # snapshots are not main changes — a fast_forward publish moves
    # the head past them, so they surface exactly at publish time
    head = meta.get("current-snapshot-id")
    if head in (None, -1):
        head = snaps[-1]["snapshot-id"]
    last = max(
        int(head),
        since_snapshot_id if since_snapshot_id is not None else int(head),
    )
    want = [
        s
        for s in snaps
        if (
            since_snapshot_id is None
            or s["snapshot-id"] > since_snapshot_id
        )
        and s["snapshot-id"] <= int(head)
    ]
    inserts, pos_dels, eq_dels, dv_dels = _changed_files_of_range(
        path, want
    )
    from pyspark.sql import functions as F

    parts: list[DataFrame] = []
    if inserts:
        by_base: dict[str, int] = {}
        for p_, sid in inserts:
            base = os.path.basename(p_)
            if base in by_base and by_base[base] != sid:
                raise ValueError(
                    f"duplicate data-file basename {base!r} across "
                    "snapshots — cannot attribute rows safely"
                )
            by_base[base] = sid
        sid_df = spark.createDataFrame(
            sorted(by_base.items()), "__base string, _snapshot_id long"
        )
        parts.append(
            spark.read.schema(schema)
            .parquet(*[p_ for p_, _sid in inserts])
            .withColumn(
                "__base",
                F.element_at(F.split(F.input_file_name(), "/"), -1),
            )
            .join(F.broadcast(sid_df), "__base")
            .select(
                [F.col(f.name) for f in schema.fields]
                + [
                    F.lit("insert").alias("_change_type"),
                    F.col("_snapshot_id"),
                ]
            )
        )
    if pos_dels:
        # the delete files name which data files they touch; scan ONLY
        # those with row_index and recover the deleted rows' images,
        # resolved against the data files live AT the delete snapshot
        for sid in sorted({s for _p, s in pos_dels}):
            data_at, _dels = _snapshot_files(path, meta, sid)
            abs_data: dict[str, str] = {}
            for d in data_at:
                ap = _local(d["file_path"])
                base = os.path.basename(ap)
                if base in abs_data and abs_data[base] != ap:
                    raise ValueError(
                        f"duplicate data-file basename {base!r} at "
                        f"snapshot {sid} — cannot attribute deleted-row "
                        "images safely"
                    )
                abs_data[base] = ap
            dpaths = [p_ for p_, s in pos_dels if s == sid]
            pos = (
                spark.read.schema("file_path string, pos long")
                .parquet(*dpaths)
                .select(
                    F.element_at(
                        F.split("file_path", "/"), -1
                    ).alias("__pbase"),
                    F.col("pos").alias("__pos"),
                )
            )
            ref_bases = [
                r["__pbase"]
                for r in pos.select("__pbase").distinct().collect()
            ]
            missing = [b for b in ref_bases if b not in abs_data]
            if missing:
                raise ValueError(
                    f"position delete references data file(s) {missing} "
                    "not live at the delete snapshot"
                )
            scan = (
                spark.read.schema(schema)
                .parquet(*[abs_data[b] for b in ref_bases])
                .withColumn(
                    "__base",
                    F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1
                    ),
                )
                .withColumn("__ri", F.col("_metadata.row_index"))
            )
            parts.append(
                scan.join(
                    pos,
                    (F.col("__base") == F.col("__pbase"))
                    & (F.col("__ri") == F.col("__pos")),
                    "inner",
                ).select(
                    [F.col(f.name) for f in schema.fields]
                    + [
                        F.lit("delete").alias("_change_type"),
                        F.lit(sid).cast("long").alias("_snapshot_id"),
                    ]
                )
            )
    if dv_dels:
        # v3 DELETION VECTORS (late r16, the r17 #1 candidate pulled
        # forward): a snapshot's retraction set on file F = positions
        # in its DV − positions in F's DV at the PARENT snapshot (a
        # replacement blob is old ∪ new per the at-most-one-DV rule,
        # so the blob DIFF is exactly this snapshot's deletions).
        # Blobs decode driver-side — O(deleted rows), the same trade
        # as the DV writer — and row images recover through the same
        # (basename, row_index) inner join as parquet position
        # deletes, over ONLY the referenced data files.
        from census_asc5_data_pipeline_spark.sources.deletion_vectors import (
            read_iceberg_dv,
        )

        snap_by_id = {s["snapshot-id"]: s for s in snaps}

        def _dv_positions(entry: dict) -> set[int]:
            return set(
                read_iceberg_dv(
                    _local(entry["file_path"]),
                    int(entry["content_offset"]),
                    int(entry["content_size_in_bytes"]),
                )
            )

        for sid in sorted({s for _e, s in dv_dels}):
            entries = [e for e, s in dv_dels if s == sid]
            snap = snap_by_id[sid]
            parent = snap.get("parent-snapshot-id")
            if parent is None:
                older = [
                    s["snapshot-id"]
                    for s in snaps
                    if s["snapshot-id"] < sid
                ]
                parent = max(older) if older else None
            prior_by_base: dict[str, dict] = {}
            if parent is not None:
                _pdata, prior_dels = _snapshot_files(
                    path, meta, int(parent)
                )
                for d in prior_dels:
                    if _is_dv_entry(d):
                        prior_by_base[
                            os.path.basename(
                                _local(d["referenced_data_file"])
                            )
                        ] = d
            data_at, _cur_dels = _snapshot_files(path, meta, sid)
            abs_data: dict[str, str] = {}
            for d in data_at:
                ap = _local(d["file_path"])
                base = os.path.basename(ap)
                if base in abs_data and abs_data[base] != ap:
                    raise ValueError(
                        f"duplicate data-file basename {base!r} at "
                        f"snapshot {sid} — cannot attribute deleted-"
                        "row images safely"
                    )
                abs_data[base] = ap
            pairs: list[tuple[str, int]] = []
            for e in entries:
                base = os.path.basename(
                    _local(e["referenced_data_file"])
                )
                fresh = _dv_positions(e)
                prior = prior_by_base.get(base)
                if prior is not None:
                    fresh -= _dv_positions(prior)
                pairs += [(base, int(p_)) for p_ in sorted(fresh)]
            if not pairs:
                continue
            ref_bases = sorted({b for b, _p in pairs})
            missing = [b for b in ref_bases if b not in abs_data]
            if missing:
                raise ValueError(
                    f"deletion vector references data file(s) "
                    f"{missing} not live at the delete snapshot"
                )
            pos = spark.createDataFrame(
                pairs, "__pbase string, __pos long"
            )
            scan = (
                spark.read.schema(schema)
                .parquet(*[abs_data[b] for b in ref_bases])
                .withColumn(
                    "__base",
                    F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1
                    ),
                )
                .withColumn("__ri", F.col("_metadata.row_index"))
            )
            parts.append(
                scan.join(
                    F.broadcast(pos),
                    (F.col("__base") == F.col("__pbase"))
                    & (F.col("__ri") == F.col("__pos")),
                    "inner",
                ).select(
                    [F.col(f.name) for f in schema.fields]
                    + [
                        F.lit("delete").alias("_change_type"),
                        F.lit(sid).cast("long").alias("_snapshot_id"),
                    ]
                )
            )
    if eq_dels:
        name_of_id = {f["id"]: f["name"] for f in fields}
        type_of_name = {f.name: f.dataType for f in schema.fields}
        for p_, sid, ids in sorted(eq_dels):
            cols = []
            for fid in ids:
                nm = name_of_id.get(fid)
                if nm is None:
                    raise NotImplementedError(
                        f"equality delete references field id {fid} "
                        "not in the current schema"
                    )
                cols.append(nm)
            read_schema = T.StructType(
                [T.StructField(c, type_of_name[c], True) for c in cols]
            )
            keys = spark.read.schema(read_schema).parquet(p_)
            sel = [
                F.col(f.name)
                if f.name in cols
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
            parts.append(
                keys.select(
                    sel
                    + [
                        F.lit("delete").alias("_change_type"),
                        F.lit(sid).cast("long").alias("_snapshot_id"),
                    ]
                )
            )
    if not parts:
        return spark.createDataFrame([], out_schema), last
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out, last


def iceberg_tail_fold(
    spark: SparkSession, path: str, cursor_path: str, fn
) -> tuple[int, int | None]:
    """Exactly-once consumption of the Iceberg snapshot tail — the
    ``delta_tail_fold`` discipline: ``fn(changes_df)`` first, the
    atomic JSON cursor advances after (at-least-once into an
    idempotent consumer on a crash between the two). Returns
    (snapshots_processed, new_cursor)."""
    since = None
    if os.path.exists(cursor_path):
        since = json.load(open(cursor_path)).get("snapshot_id")
    changes, last = read_iceberg_changes(
        spark, path, since_snapshot_id=since
    )
    if last is None or (since is not None and last <= since):
        return 0, since
    fn(changes)
    tmp = cursor_path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump({"snapshot_id": last}, fh)
    os.replace(tmp, cursor_path)
    done = (
        last - since
        if since is not None
        else len(iceberg_snapshots(path))
    )
    return done, last


# ------------------------------------------------- lifecycle (r8)


def _write_metadata_version(path: str, new_v: int, new_meta: dict) -> None:
    """v<N>.metadata.json + version-hint atomic replace (the writer's
    pointer discipline, shared by the lifecycle ops).

    Maintains the spec's ``metadata-log``: every commit appends the
    PREVIOUS metadata file's {timestamp-ms, metadata-file} entry, the
    list is trimmed to the ``write.metadata.previous-versions-max``
    table property (spec default 100), and when
    ``write.metadata.delete-after-commit.enabled`` is ``"true"`` the
    files that fell off the window are physically removed — Iceberg's
    metadata-retention contract (reference: iceberg spec §"Table
    Metadata Fields" metadata-log + TableProperties
    METADATA_PREVIOUS_VERSIONS_MAX). Driver-side, O(1) per commit."""
    props = new_meta.get("properties") or {}
    entries = list(new_meta.get("metadata-log") or [])
    prev = [(n, p) for n, p in _metadata_files(path) if n < new_v]
    if prev:
        _pn, pp = max(prev)
        try:
            with open(pp) as fh:
                prev_ts = json.load(fh).get("last-updated-ms")
        except (OSError, ValueError):
            prev_ts = None
        if prev_ts is None:
            prev_ts = int(os.path.getmtime(pp) * 1000)
        entries.append(
            {
                "timestamp-ms": int(prev_ts),
                "metadata-file": os.path.abspath(pp),
            }
        )
    try:
        max_keep = int(props.get("write.metadata.previous-versions-max", 100))
    except (TypeError, ValueError):
        max_keep = 100
    dropped = entries[:-max_keep] if len(entries) > max_keep else []
    new_meta["metadata-log"] = entries[-max_keep:]
    meta_path = os.path.join(_meta_dir(path), f"v{new_v}.metadata.json")
    tmp = meta_path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(new_meta, fh)
    os.replace(tmp, meta_path)
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    tmp = hint + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        fh.write(str(new_v))
    os.replace(tmp, hint)
    # delete-after-commit runs strictly AFTER the hint flip: a crash
    # mid-commit never removes a file the current pointer still needs
    if str(props.get(
        "write.metadata.delete-after-commit.enabled", "false"
    )).lower() == "true":
        for e in dropped:
            mf = e.get("metadata-file")
            if mf and os.path.abspath(mf) != os.path.abspath(meta_path):
                try:
                    os.remove(mf)
                except OSError:
                    pass


def set_iceberg_properties(path: str, props: dict[str, str]) -> int:
    """Iceberg ``ALTER TABLE ... SET TBLPROPERTIES`` at spec level: a
    NEW metadata version whose ``properties`` map merges ``props``
    over the existing ones (a value of ``None`` unsets the key). No
    snapshot is created — properties changes are metadata-only
    commits, exactly as the reference engine's table-options DDL
    behaves. Returns the new metadata version number."""
    cur_v, meta = _current_metadata(path)
    _format_version_gate(
        meta, "SET TBLPROPERTIES", write=True,
        # metadata-only: new_meta = dict(meta) carries format-version
        # and next-row-id forward, so no lineage duty arises (r16)
        v3_write_ok=True,
    )
    merged = dict(meta.get("properties") or {})
    for k, v in props.items():
        if v is None:
            merged.pop(k, None)
        else:
            merged[k] = str(v)
    new_v = cur_v + 1
    new_meta = dict(meta)
    new_meta["properties"] = merged
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    _write_metadata_version(path, new_v, new_meta)
    return new_v


def _default_sort_order(meta: dict) -> tuple[int, list[dict]]:
    """(order-id, fields) of the table's default sort order — order 0
    with no fields = unsorted, the spec's default."""
    oid = int(meta.get("default-sort-order-id", 0))
    for o in meta.get("sort-orders") or []:
        if int(o.get("order-id", 0)) == oid:
            return oid, list(o.get("fields") or [])
    return 0, []


def _sort_order_exprs(meta: dict, ice_fields: list[dict]) -> list:
    """Spark sort Columns realizing the default sort order's
    identity-transform fields (direction + null-order honored);
    transforms other than identity are skipped conservatively (the
    sort is a clustering OPTIMIZATION — skipping a field can never
    corrupt data, it only loosens file bounds)."""
    from pyspark.sql import functions as F

    _oid, fields = _default_sort_order(meta)
    by_id = {f["id"]: f["name"] for f in ice_fields}
    out = []
    for f in fields:
        if f.get("transform", "identity") != "identity":
            continue
        name = by_id.get(int(f.get("source-id", -1)))
        if name is None:
            continue
        col = F.col(name)
        desc = str(f.get("direction", "asc")).lower() == "desc"
        nf = str(f.get("null-order", "nulls-first")).lower() in (
            "nulls-first",
            "nulls_first",
        )
        if desc:
            col = col.desc_nulls_first() if nf else col.desc_nulls_last()
        else:
            col = col.asc_nulls_first() if nf else col.asc_nulls_last()
        out.append(col)
    return out


def update_sort_order(path: str, order_by: list[str]) -> int:
    """``ALTER TABLE … WRITE ORDERED BY`` (table-spec §Sorting, r13):
    register ``order_by`` entries — ``"col"``, ``"col DESC"``,
    ``"col ASC NULLS LAST"`` … — as a NEW sort order and make it the
    default. Metadata-only; subsequent writes cluster rows with a
    zero-shuffle in-task sort (:func:`_sort_order_exprs`), which
    tightens every staged file's manifest bounds — the declared-order
    half of the clustering story ``rewrite_data_files(zorder_by=)``
    provides after the fact. ``[]`` resets to unsorted (order 0).
    Returns the new metadata version."""
    cur_v, meta = _current_metadata(path)
    _format_version_gate(
        meta, "WRITE ORDERED BY", write=True,
        # metadata-only: new_meta = dict(meta) carries format-version
        # and next-row-id forward, so no lineage duty arises (r16)
        v3_write_ok=True,
    )
    _schema, fields = _schema_of(meta)
    by_name = {f["name"]: f for f in fields}
    parsed: list[dict] = []
    for e in order_by:
        toks = e.split()
        name = toks[0].strip("`")
        if name not in by_name:
            raise ValueError(
                f"sort column {name!r} not in the table schema "
                f"(have {sorted(by_name)})"
            )
        rest = " ".join(toks[1:]).upper()
        direction = "desc" if "DESC" in rest.split() else "asc"
        if "NULLS LAST" in rest:
            null_order = "nulls-last"
        elif "NULLS FIRST" in rest:
            null_order = "nulls-first"
        else:
            # spec defaults: ASC sorts nulls first, DESC nulls last
            null_order = (
                "nulls-first" if direction == "asc" else "nulls-last"
            )
        parsed.append(
            {
                "transform": "identity",
                "source-id": by_name[name]["id"],
                "direction": direction,
                "null-order": null_order,
            }
        )
    orders = list(
        meta.get("sort-orders") or [{"order-id": 0, "fields": []}]
    )
    _oid, cur_fields = _default_sort_order(meta)
    if parsed == cur_fields:
        return cur_v  # no-op
    if not parsed:
        new_id = 0
    else:
        new_id = max(int(o.get("order-id", 0)) for o in orders) + 1
        orders.append({"order-id": new_id, "fields": parsed})
    new_meta = dict(meta)
    new_meta["sort-orders"] = orders
    new_meta["default-sort-order-id"] = new_id
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    new_v = cur_v + 1
    _write_metadata_version(path, new_v, new_meta)
    return new_v


def partition_by_entries(meta: dict) -> list[str]:
    """The DEFAULT spec's fields spelled back as ``partition_by``
    entry strings (``col`` / ``bucket(N, col)`` / ``truncate(W,
    col)`` / ``year(col)``…) — the inverse of
    :func:`_parse_partition_by`, so the ALTER … PARTITION FIELD DDL
    can compose incremental changes over the current spec."""
    _schema, fields = _schema_of(meta)
    by_id = {f["id"]: f for f in fields}
    specs = meta.get("partition-specs") or (
        [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
    )
    spec = next(
        s
        for s in specs
        if s.get("spec-id", 0) == meta.get("default-spec-id", 0)
    )
    out: list[str] = []
    for f in spec.get("fields", []):
        src = by_id[f["source-id"]]["name"]
        tr = f.get("transform", "identity")
        if tr == "identity":
            out.append(src)
        elif tr.startswith("bucket["):
            out.append(f"bucket({tr[7:-1]}, {src})")
        elif tr.startswith("truncate["):
            out.append(f"truncate({tr[9:-1]}, {src})")
        else:
            out.append(f"{tr}({src})")
    return out


def update_partition_spec(
    path: str, partition_by: list[str]
) -> int:
    """Partition-spec EVOLUTION (table-spec §Partition Evolution,
    r13): register ``partition_by`` (the writers' transform
    vocabulary — identity / bucket(N, col) / truncate(W, col) /
    year/month/day) as a NEW spec with a fresh spec-id and make it
    the default. Metadata-only — no snapshot, no data movement: files
    already written keep their original spec (the spec's whole
    point), later writes lay out under the new one, and readers
    handle both (partition_filter keeps pre-evolution files whose
    manifests never carried the field; bounds/stats skipping prunes
    them by SOURCE-column metrics instead). Partition field-ids
    continue from the table-wide maximum so ids never collide across
    specs. An identical field list is a no-op returning the current
    metadata version. Returns the new metadata version."""
    cur_v, meta = _current_metadata(path)
    _format_version_gate(
        meta, "partition spec update", write=True,
        # metadata-only: new_meta = dict(meta) carries format-version
        # and next-row-id forward, so no lineage duty arises (r16)
        v3_write_ok=True,
    )
    _schema, fields = _schema_of(meta)
    by_name = {f["name"]: f for f in fields}
    parsed = _parse_partition_by(list(partition_by))
    for pf in parsed:
        if pf["source"] not in by_name:
            raise ValueError(
                f"partition source column {pf['source']!r} not in the "
                f"table schema (have {sorted(by_name)})"
            )
    specs = list(
        meta.get("partition-specs")
        or [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
    )
    cur_spec = next(
        s
        for s in specs
        if s.get("spec-id", 0) == meta.get("default-spec-id", 0)
    )
    next_field_id = max(
        [999]
        + [
            int(f.get("field-id", 999))
            for s in specs
            for f in s.get("fields", [])
        ]
    )
    new_fields = []
    cur_by_key = {
        (f.get("transform", "identity"), f["source-id"]): f
        for f in cur_spec.get("fields", [])
    }
    for pf in parsed:
        src_id = by_name[pf["source"]]["id"]
        prev = cur_by_key.get((pf["transform"], src_id))
        if prev is not None:
            # the same (transform, source) keeps its field-id and
            # name across specs, per the spec's evolution rules
            new_fields.append(dict(prev))
            continue
        next_field_id += 1
        new_fields.append(
            {
                "name": pf["name"],
                "transform": pf["transform"],
                "source-id": src_id,
                "field-id": next_field_id,
            }
        )
    if [
        (f["transform"], f["source-id"]) for f in new_fields
    ] == [
        (f.get("transform", "identity"), f["source-id"])
        for f in cur_spec.get("fields", [])
    ]:
        return cur_v  # no-op: the default spec already matches
    new_spec_id = max(s.get("spec-id", 0) for s in specs) + 1
    specs.append({"spec-id": new_spec_id, "fields": new_fields})
    new_meta = dict(meta)
    new_meta["partition-specs"] = specs
    new_meta["default-spec-id"] = new_spec_id
    new_meta.pop("partition-spec", None)  # the legacy single-spec key
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    new_v = cur_v + 1
    _write_metadata_version(path, new_v, new_meta)
    return new_v


def _set_ref(path: str, name: str, entry: dict | None) -> int:
    """Commit a new metadata version whose ``refs[name]`` is
    ``entry`` (None = drop the ref). Metadata-only — no snapshot."""
    cur_v, meta = _current_metadata(path)
    _format_version_gate(
        meta, "ref update", write=True,
        # metadata-only: new_meta = dict(meta) carries format-version
        # and next-row-id forward, so no lineage duty arises (r16)
        v3_write_ok=True,
    )
    refs = dict(meta.get("refs") or {})
    if entry is None:
        if name not in refs:
            raise ValueError(f"unknown ref {name!r}")
        refs.pop(name)
    else:
        refs[name] = entry
    new_meta = dict(meta)
    new_meta["refs"] = refs
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    new_v = cur_v + 1
    _write_metadata_version(path, new_v, new_meta)
    return new_v


def _ref_entry(
    meta: dict, kind: str, snapshot_id: int | None, **retention
) -> dict:
    sid = snapshot_id
    if sid is None:
        sid = meta.get("current-snapshot-id")
        if sid in (None, -1):
            raise ValueError("table has no current snapshot to reference")
    known = {s["snapshot-id"] for s in meta.get("snapshots", [])}
    if int(sid) not in known:
        raise ValueError(f"snapshot {sid} not in table (have {sorted(known)})")
    entry = {"snapshot-id": int(sid), "type": kind}
    for k, v in retention.items():
        if v is not None:
            entry[k.replace("_", "-")] = int(v)
    return entry


def tag_snapshot(
    path: str,
    name: str,
    snapshot_id: int | None = None,
    max_ref_age_ms: int | None = None,
) -> int:
    """Create/replace a TAG ref (table-spec §refs; round-12 verdict
    #3): a named immutable pointer at ``snapshot_id`` (default: the
    current snapshot) committed as a new metadata version.
    ``max_ref_age_ms`` is the spec's per-ref retention —
    :func:`expire_snapshots` drops the tag (and then, if nothing else
    retains it, its snapshot) once the referenced snapshot is older.
    Read back with ``read_iceberg(..., ref=name)``."""
    _v, meta = _current_metadata(path)
    return _set_ref(
        path,
        name,
        _ref_entry(meta, "tag", snapshot_id, max_ref_age_ms=max_ref_age_ms),
    )


def create_branch(
    path: str,
    name: str,
    snapshot_id: int | None = None,
    min_snapshots_to_keep: int | None = None,
    max_snapshot_age_ms: int | None = None,
    max_ref_age_ms: int | None = None,
) -> int:
    """Create/replace a BRANCH ref (table-spec §refs): a named head
    at ``snapshot_id`` (default current) with the spec's branch
    retention knobs — ``min_snapshots_to_keep`` / ``max_snapshot_age_ms``
    make :func:`expire_snapshots` retain that much of the branch's
    history (ancestry approximated by commit timestamp order up to
    the head, exact for this engine's monotonic snapshots);
    ``max_ref_age_ms`` expires the branch itself. Branches are
    independent write heads (round-13 verdict #3): write with
    ``write_iceberg(..., branch=name)`` or MoR DML
    (``merge_into``/``update_where`` ``branch=``), audit with
    ``read_iceberg(..., ref=name)``, publish with
    :func:`fast_forward` — the write-audit-publish flow."""
    _v, meta = _current_metadata(path)
    return _set_ref(
        path,
        name,
        _ref_entry(
            meta,
            "branch",
            snapshot_id,
            min_snapshots_to_keep=min_snapshots_to_keep,
            max_snapshot_age_ms=max_snapshot_age_ms,
            max_ref_age_ms=max_ref_age_ms,
        ),
    )


def drop_ref(path: str, name: str) -> int:
    """Remove a tag/branch ref in a new metadata version."""
    return _set_ref(path, name, None)


def remove_orphan_files(
    path: str,
    older_than_ms: int = 3 * 24 * 3_600_000,
    spark: SparkSession | None = None,
) -> dict:
    """Iceberg's ``remove_orphan_files`` maintenance procedure (r14):
    physically delete files under the table location that NO metadata
    version on disk references — the debris a crashed writer leaves
    behind (staged data files whose snapshot never committed, torn
    manifest avros). Safety:

    - referenced = the union over EVERY ``v*.metadata.json`` still on
      disk of its metadata file, every snapshot's manifest-list +
      manifest avros, and every listed data/delete file (snapshots
      whose avros were already expired contribute nothing — they are
      unreadable either way);
    - only files with mtime STRICTLY older than ``now −
      older_than_ms`` are touched (Iceberg's default 3 days) — an
      in-flight writer's fresh staging never qualifies;
    - ``version-hint.text`` and the metadata jsons themselves are
      never candidates.

    ``spark`` distributes the per-snapshot manifest walks above the
    >64-manifest threshold. Returns {orphans_removed, bytes_removed,
    files_scanned}."""
    md = _meta_dir(path)
    if not os.path.isdir(md):
        raise FileNotFoundError(f"not an Iceberg table at {path!r}")
    cutoff = time.time() - older_than_ms / 1000.0
    referenced: set[str] = set()
    for fn in sorted(os.listdir(md)):
        if not (fn.startswith("v") and fn.endswith(".metadata.json")):
            continue
        fp = os.path.join(md, fn)
        referenced.add(os.path.abspath(fp))
        try:
            meta = json.load(open(fp))
        except (OSError, json.JSONDecodeError):
            continue
        for snap in meta.get("snapshots", []):
            try:
                if "manifest-list" in snap:
                    ml = os.path.abspath(_local(snap["manifest-list"]))
                    referenced.add(ml)
                    _s, manifests = read_container_generic(ml)
                    for m in manifests:
                        referenced.add(
                            os.path.abspath(
                                _local(m["manifest_path"])
                            )
                        )
                else:
                    referenced.update(
                        os.path.abspath(_local(p))
                        for p in snap.get("manifests", [])
                    )
                data_fs, delete_fs = _snapshot_files(
                    path, meta, snap["snapshot-id"], spark=spark
                )
                for df_ in data_fs + delete_fs:
                    referenced.add(
                        os.path.abspath(_local(df_["file_path"]))
                    )
            except (OSError, KeyError, ValueError, FileNotFoundError):
                # an expired/torn snapshot can't mark references —
                # it is unreadable either way; the mtime guard still
                # protects anything fresh
                continue
    removed = 0
    nbytes = 0
    scanned = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            fp = os.path.abspath(os.path.join(root, fn))
            in_meta = root.startswith(os.path.abspath(md))
            if in_meta and (
                fn == "version-hint.text"
                or fn.endswith(".metadata.json")
            ):
                continue
            scanned += 1
            if fp in referenced:
                continue
            try:
                if os.path.getmtime(fp) >= cutoff:
                    continue
                sz = os.path.getsize(fp)
                os.remove(fp)
            except OSError:
                continue
            removed += 1
            nbytes += sz
    return {
        "orphans_removed": removed,
        "bytes_removed": nbytes,
        "files_scanned": scanned,
    }


def fast_forward(path: str, target: str, source: str) -> int:
    """Publish: fast-forward ``target`` (``'main'`` or a branch ref)
    to ``source``'s head snapshot — the write-audit-publish closing
    step (Iceberg's ``fast_forward`` procedure; round-13 verdict #3).
    Refuses unless the target's current head IS an ancestor of the
    source head (walked over ``parent-snapshot-id``, which this
    engine stamps on every snapshot) — anything else is not a
    fast-forward and would silently discard commits. Fast-forwarding
    ``main`` moves ``current-snapshot-id`` and appends the published
    snapshot to ``snapshot-log`` (the main lineage readers and
    streams follow). Returns the new metadata version; the source
    branch ref keeps pointing at the (now-published) head — drop it
    with :func:`drop_ref` when the audit cycle is done."""
    cur_v, meta = _current_metadata(path)
    _format_version_gate(
        meta, "fast_forward", write=True,
        # metadata-only: new_meta = dict(meta) carries format-version
        # and next-row-id forward, so no lineage duty arises (r16)
        v3_write_ok=True,
    )
    refs = meta.get("refs") or {}
    if target == source:
        raise ValueError("fast_forward target and source are the same ref")
    src = refs.get(source)
    if src is None:
        raise ValueError(
            f"unknown source ref {source!r} (refs: {sorted(refs)})"
        )
    src_head = int(src["snapshot-id"])
    if target == "main":
        tgt_head = meta.get("current-snapshot-id")
        if tgt_head in (None, -1):
            tgt_head = None
    else:
        tref = refs.get(target)
        if tref is None:
            raise ValueError(
                f"unknown target ref {target!r} (refs: {sorted(refs)})"
            )
        if tref.get("type") != "branch":
            raise ValueError(
                f"target ref {target!r} is a {tref.get('type')!r} — "
                "tags are immutable"
            )
        tgt_head = int(tref["snapshot-id"])
    if tgt_head == src_head:
        return cur_v  # already published — no-op, no metadata churn
    snaps_by_id = {
        s["snapshot-id"]: s for s in meta.get("snapshots", [])
    }
    if src_head not in snaps_by_id:
        raise ValueError(f"source head snapshot {src_head} not in table")
    # walk the parent chain from the source head; the target head must
    # appear (or the target must have no head at all)
    if tgt_head is not None:
        seen: set[int] = set()
        node: int | None = src_head
        while node is not None and node not in seen:
            if node == tgt_head:
                break
            seen.add(node)
            node = snaps_by_id.get(node, {}).get("parent-snapshot-id")
        else:
            raise ValueError(
                f"{target!r} head {tgt_head} is not an ancestor of "
                f"{source!r} head {src_head} — not a fast-forward "
                "(the branch needs a rebase/cherry-pick, which this "
                "engine does not do)"
            )
    now_ms = int(time.time() * 1000)
    new_meta = dict(meta)
    if target == "main":
        new_meta["current-snapshot-id"] = src_head
        new_meta["snapshot-log"] = meta.get("snapshot-log", []) + [
            {"timestamp-ms": now_ms, "snapshot-id": src_head}
        ]
    else:
        new_refs = dict(refs)
        new_refs[target] = {**new_refs[target], "snapshot-id": src_head}
        new_meta["refs"] = new_refs
    new_meta["last-updated-ms"] = now_ms
    new_v = cur_v + 1
    _write_metadata_version(path, new_v, new_meta)
    return new_v


def iceberg_refs(path: str) -> dict[str, dict]:
    """The table's ``refs`` map (name → {snapshot-id, type,
    retention...}), foreign shapes included."""
    _v, meta = _current_metadata(path)
    return dict(meta.get("refs") or {})


def add_iceberg_columns(path: str, cols: str | T.StructType) -> int:
    """``ALTER TABLE ... ADD COLUMN(S)`` at spec level (round-12
    verdict #4): a NEW metadata version registering a NEW schema-id
    whose fields = the current schema plus the additions — old field
    ids name-stable, fresh ids for the new columns (from
    ``last-column-id``), ``required=false`` (pre-existing data files
    scan NULL). No snapshot is created — schema evolution is a
    metadata-only commit, the same shape
    :func:`merge._commit_iceberg_mor` writes when
    ``evolve_schema=True`` widens during a MERGE. ``cols`` is a Spark
    DDL string or StructType. Returns the new metadata version."""
    new = T.StructType.fromDDL(cols) if isinstance(cols, str) else cols
    if not new.fields:
        raise ValueError("ADD COLUMNS needs at least one column")
    cur_v, meta = _current_metadata(path)
    _spark_schema, fields = _schema_of(meta)
    existing = {f["name"] for f in fields}
    dup = [f.name for f in new.fields if f.name in existing]
    if dup:
        raise ValueError(f"column(s) {dup} already exist")
    next_id = max(
        [int(meta.get("last-column-id", 0))] + [f["id"] for f in fields]
    )
    additions = []
    for f in new.fields:
        t = _SPARK_TO_ICE.get(f.dataType.simpleString())
        if t is None:
            raise ValueError(
                "iceberg ADD COLUMNS supports flat primitives + "
                f"timestamp; {f.name!r} is "
                f"{f.dataType.simpleString()!r}"
            )
        next_id += 1
        additions.append(
            {"id": next_id, "name": f.name, "required": False, "type": t}
        )
    prev_schemas = meta.get("schemas") or (
        [dict(meta["schema"], **{"schema-id": 0})]
        if "schema" in meta
        else []
    )
    new_sid = (
        max((sc.get("schema-id", 0) for sc in prev_schemas), default=0) + 1
    )
    new_meta = dict(meta)
    new_meta["schemas"] = prev_schemas + [
        {
            "type": "struct",
            "schema-id": new_sid,
            "fields": list(fields) + additions,
        }
    ]
    new_meta["current-schema-id"] = new_sid
    new_meta["last-column-id"] = next_id
    new_meta.pop("schema", None)
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    new_v = cur_v + 1
    _write_metadata_version(path, new_v, new_meta)
    return new_v


def _new_schema_version(path: str, mutate) -> int:
    """Register a NEW schema-id whose fields = ``mutate(current
    fields)`` (field ids stable) in a new metadata version — the
    shared shape of ADD/RENAME/DROP COLUMNS. No snapshot."""
    cur_v, meta = _current_metadata(path)
    _format_version_gate(
        meta, "schema change", write=True,
        # metadata-only: new_meta = dict(meta) carries format-version
        # and next-row-id forward, so no lineage duty arises (r16)
        v3_write_ok=True,
    )
    _s, fields = _schema_of(meta, allow_renames=True)
    new_fields = mutate(meta, [dict(f) for f in fields])
    prev_schemas = meta.get("schemas") or (
        [dict(meta["schema"], **{"schema-id": 0})]
        if "schema" in meta
        else []
    )
    new_sid = (
        max((sc.get("schema-id", 0) for sc in prev_schemas), default=0) + 1
    )
    new_meta = dict(meta)
    new_meta["schemas"] = prev_schemas + [
        {"type": "struct", "schema-id": new_sid, "fields": new_fields}
    ]
    new_meta["current-schema-id"] = new_sid
    new_meta["last-column-id"] = max(
        [int(meta.get("last-column-id", 0))]
        + [f["id"] for f in new_fields]
    )
    new_meta.pop("schema", None)
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    new_v = cur_v + 1
    _write_metadata_version(path, new_v, new_meta)
    return new_v


def _partition_source_ids(meta: dict) -> set[int]:
    specs = meta.get("partition-specs") or (
        [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
    )
    return {
        f["source-id"] for s in specs for f in s.get("fields", [])
    }


def rename_iceberg_column(path: str, old: str, new: str) -> int:
    """``ALTER TABLE ... RENAME COLUMN`` (round-12): a new schema-id
    whose field keeps its ID under the new name — Iceberg's whole
    point of field-id resolution. Old data files keep serving the
    column: :func:`read_iceberg` resolves renamed histories through
    the parquet footers' field ids (``_read_by_field_id``); surfaces
    that resolve by name keep their existing loud rename gate.
    Returns the new metadata version."""

    def mutate(meta, fields):
        names = [f["name"] for f in fields]
        if old not in names:
            raise ValueError(f"no column {old!r} (have {names})")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        for f in fields:
            if f["name"] == old:
                f["name"] = new
        return fields

    return _new_schema_version(path, mutate)


def drop_iceberg_columns(path: str, cols: list[str]) -> int:
    """``ALTER TABLE ... DROP COLUMN(S)`` (round-12): a new schema-id
    without the fields (remaining ids stable). Data files keep the
    column bytes; scans project them away. Partition-spec source
    columns refuse. Returns the new metadata version."""

    def mutate(meta, fields):
        names = [f["name"] for f in fields]
        missing = [c for c in cols if c not in names]
        if missing:
            raise ValueError(f"no column(s) {missing} (have {names})")
        if len(set(cols)) >= len(fields):
            raise ValueError("cannot drop every column")
        src_ids = _partition_source_ids(meta)
        part = [
            f["name"]
            for f in fields
            if f["name"] in cols and f["id"] in src_ids
        ]
        if part:
            raise ValueError(
                f"cannot drop partition source column(s) {part}"
            )
        return [f for f in fields if f["name"] not in cols]

    return _new_schema_version(path, mutate)


def expire_snapshots(
    path: str,
    keep_snapshots: int = 2,
    older_than_ms: int | None = None,
    spark: SparkSession | None = None,
) -> dict:
    """Iceberg's ``expireSnapshots`` at spec level — the storage-
    reclaim twin of :func:`delta_io.vacuum_delta` (round-7 verdict
    elective #2): keep the last ``keep_snapshots`` snapshots fully
    AS-OF readable, drop the rest from a NEW metadata version, and
    physically delete everything only the expired snapshots
    referenced. ``older_than_ms`` (r14 — Iceberg's
    ``expireSnapshots(olderThan)``, the table-level twin of a
    branch's ``max-snapshot-age-ms``): snapshots whose timestamp is
    AT or after ``now - older_than_ms`` are retained instead of the
    keep-N window (the boundary snapshot exactly at the cutoff
    stays), plus always the current snapshot; ref retention still
    adds on top.

    Safety invariants (the vacuum_delta discipline):

    - the live set is the UNION of every RETAINED snapshot's data
      files plus their manifest / manifest-list avros — a file is
      deleted only when NO retained snapshot references it;
    - nothing with an mtime at/after the current metadata json is
      touched (a concurrent write_iceberg stages data files and avros
      BEFORE its hint flip — deleting them would corrupt its commit);
    - old ``v<N>.metadata.json`` versions below the new one are
      pruned (readers resolve hint-first; snapshot time travel goes
      through the retained snapshots in the NEW metadata, exactly as
      before).

    Ref retention (round-12 verdict #3, table-spec §refs): every
    snapshot a LIVE tag/branch points at is retained beyond the
    keep-N window; a branch additionally retains its last
    ``min-snapshots-to-keep`` history snapshots and everything within
    ``max-snapshot-age-ms`` of now (ancestry approximated by commit
    timestamp order up to the head — exact for this engine's
    monotonic snapshots); a ref whose referenced snapshot is older
    than its ``max-ref-age-ms`` is itself EXPIRED and dropped from
    the new metadata's refs (``main`` never expires, per spec).

    ``spark`` (r14, optional): with a session the retained
    snapshots' manifest walks distribute above the >64-manifest
    threshold like every read — a thousands-of-manifests table
    expires at executor parallelism instead of a driver Avro loop.
    Returns {data_files_removed, manifests_removed,
    metadata_files_removed, retained_snapshot_ids}.
    """
    cur_v, meta = _current_metadata(path)
    _format_version_gate(
        meta, "expire_snapshots", write=True,
        # metadata-only: new_meta = dict(meta) carries format-version
        # and next-row-id forward, so no lineage duty arises (r16)
        v3_write_ok=True,
    )
    cur_meta_file = os.path.join(
        _meta_dir(path), f"v{cur_v}.metadata.json"
    )
    cutoff = os.path.getmtime(cur_meta_file)
    now_ms = int(time.time() * 1000)
    snaps = sorted(
        meta.get("snapshots", []),
        key=lambda s: (s.get("timestamp-ms", 0), s["snapshot-id"]),
    )
    snaps_by_id = {s["snapshot-id"]: s for s in snaps}
    live_refs: dict[str, dict] = {}
    for rname, r in (meta.get("refs") or {}).items():
        target = snaps_by_id.get(r.get("snapshot-id"))
        if target is None:
            continue  # dangling ref: drop with its snapshot already gone
        cap = r.get("max-ref-age-ms")
        if (
            rname != "main"
            and cap is not None
            and now_ms - int(target.get("timestamp-ms", now_ms)) > int(cap)
        ):
            continue  # the ref itself expired
        live_refs[rname] = r
    if older_than_ms is not None:
        ts_cut = now_ms - int(older_than_ms)
        retained_ids = {
            s["snapshot-id"]
            for s in snaps
            if int(s.get("timestamp-ms", 0)) >= ts_cut
        }
        cur_id = meta.get("current-snapshot-id")
        if cur_id is not None and cur_id != -1:
            retained_ids.add(cur_id)
        elif snaps:
            retained_ids.add(snaps[-1]["snapshot-id"])
    else:
        retained_ids = {
            s["snapshot-id"]
            for s in (
                snaps[-keep_snapshots:] if keep_snapshots > 0 else []
            )
        }
    for r in live_refs.values():
        head = snaps_by_id[r["snapshot-id"]]
        retained_ids.add(head["snapshot-id"])
        if r.get("type") == "branch":
            hist = [
                s
                for s in snaps
                if (s.get("timestamp-ms", 0), s["snapshot-id"])
                <= (head.get("timestamp-ms", 0), head["snapshot-id"])
            ]
            k = r.get("min-snapshots-to-keep")
            if k:
                retained_ids |= {
                    s["snapshot-id"] for s in hist[-int(k):]
                }
            age = r.get("max-snapshot-age-ms")
            if age is not None:
                retained_ids |= {
                    s["snapshot-id"]
                    for s in hist
                    if now_ms - int(s.get("timestamp-ms", 0)) <= int(age)
                }
    retained = [s for s in snaps if s["snapshot-id"] in retained_ids]
    retained_ids = {s["snapshot-id"] for s in retained}

    keep_avros: set[str] = set()
    live_data: set[str] = set()
    for s in retained:
        if "manifest-list" in s:
            ml = os.path.abspath(_local(s["manifest-list"]))
            keep_avros.add(ml)
            _sch, manifests = read_container_generic(ml)
            for m in manifests:
                keep_avros.add(os.path.abspath(_local(m["manifest_path"])))
        else:  # v1 inline manifests
            keep_avros |= {
                os.path.abspath(_local(p)) for p in s.get("manifests", [])
            }
        data_fs, delete_fs = _snapshot_files(
            path, meta, s["snapshot-id"], spark=spark
        )
        for d in data_fs + delete_fs:  # delete files are live too
            live_data.add(os.path.abspath(_local(d["file_path"])))

    new_v = cur_v + 1
    new_meta = dict(meta)
    new_meta["snapshots"] = retained
    new_meta["snapshot-log"] = [
        e
        for e in meta.get("snapshot-log", [])
        if e.get("snapshot-id") in retained_ids
    ]
    if meta.get("statistics"):
        # the spec pairs snapshot expiry with RemoveStatistics: an
        # entry for an expired snapshot points at a Puffin file whose
        # snapshot no longer exists (r15)
        new_meta["statistics"] = [
            s
            for s in meta["statistics"]
            if int(s["snapshot-id"]) in retained_ids
        ]
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    if meta.get("refs") is not None or live_refs:
        new_meta["refs"] = live_refs  # expired refs drop with their snaps
    if retained and meta.get("current-snapshot-id") not in retained_ids:
        new_meta["current-snapshot-id"] = retained[-1]["snapshot-id"]
    # metadata files below new_v are pruned below — drop their
    # metadata-log entries so the log never points at deleted files
    # (_write_metadata_version re-appends the surviving current file)
    new_meta["metadata-log"] = []
    _write_metadata_version(path, new_v, new_meta)

    def _old(p: str) -> bool:
        try:
            return os.path.getmtime(p) < cutoff
        except OSError:
            return False

    manifests_removed = 0
    for f in os.listdir(_meta_dir(path)):
        full = os.path.abspath(os.path.join(_meta_dir(path), f))
        if (
            f.endswith(".avro")
            and full not in keep_avros
            and _old(full)
        ):
            os.remove(full)
            manifests_removed += 1
    metadata_removed = 0
    for n, p in _metadata_files(path):
        if n < new_v and _old(p):
            os.remove(p)
            metadata_removed += 1
    data_removed = 0
    data_dir = os.path.join(path, "data")
    for root, _dirs, fnames in os.walk(data_dir):
        for f in fnames:
            full = os.path.abspath(os.path.join(root, f))
            if not f.endswith(".parquet") or f.startswith("."):
                continue
            if full not in live_data and _old(full):
                os.remove(full)
                data_removed += 1
    for root, dirs, fnames in os.walk(data_dir, topdown=False):
        if root != data_dir and not dirs and not fnames:
            os.rmdir(root)
    return {
        "data_files_removed": data_removed,
        "manifests_removed": manifests_removed,
        "metadata_files_removed": metadata_removed,
        "retained_snapshot_ids": sorted(retained_ids),
    }


def read_iceberg_meta(
    spark: SparkSession, path: str, table: str
) -> DataFrame:
    """Iceberg's metadata tables (the ``db.table.snapshots`` /
    ``.files`` / ``.history`` / ``.refs`` / ``.manifests`` surface a
    catalog exposes) as DataFrames, straight off the metadata JSON +
    manifest avros — driver-side metadata scale, zero data-file reads
    except none at all (``files`` reads only manifests). Columns
    follow the Iceberg spec's metadata-table shapes (epoch-millis
    BIGINT timestamps — this engine's convention)."""
    _v, meta = _current_metadata(path)
    _format_version_gate(meta, "read_iceberg_meta", write=False)
    if table == "snapshots":
        rows = [
            (
                int(s.get("timestamp-ms", 0)),
                int(s["snapshot-id"]),
                int(s["sequence-number"])
                if s.get("sequence-number") is not None
                else None,
                (s.get("summary") or {}).get("operation"),
                s.get("manifest-list"),
                {
                    str(k): str(v)
                    for k, v in (s.get("summary") or {}).items()
                    if k != "operation"
                },
            )
            for s in sorted(
                meta.get("snapshots", []),
                key=lambda s: (s.get("timestamp-ms", 0), s["snapshot-id"]),
            )
        ]
        return spark.createDataFrame(
            rows,
            "committed_at_ms bigint, snapshot_id bigint, "
            "sequence_number bigint, operation string, "
            "manifest_list string, summary map<string,string>",
        )
    if table == "history":
        cur = meta.get("current-snapshot-id")
        rows = [
            (
                int(e.get("timestamp-ms", 0)),
                int(e["snapshot-id"]),
                e["snapshot-id"] == cur,
            )
            for e in meta.get("snapshot-log", [])
        ]
        return spark.createDataFrame(
            rows,
            "made_current_at_ms bigint, snapshot_id bigint, "
            "is_current boolean",
        )
    if table == "refs":
        rows = [
            (
                name,
                r.get("type"),
                int(r["snapshot-id"]),
                r.get("max-ref-age-ms"),
                r.get("min-snapshots-to-keep"),
                r.get("max-snapshot-age-ms"),
            )
            for name, r in sorted((meta.get("refs") or {}).items())
        ]
        return spark.createDataFrame(
            rows,
            "name string, type string, snapshot_id bigint, "
            "max_ref_age_ms bigint, min_snapshots_to_keep bigint, "
            "max_snapshot_age_ms bigint",
        )
    if table == "files":
        data, deletes = _snapshot_files(path, meta, None, spark=spark)
        rows = [
            (
                int(d.get("content", 0) or 0),
                d["file_path"],
                d.get("file_format", "PARQUET"),
                int(d.get("record_count", 0) or 0),
                int(d.get("file_size_in_bytes", 0) or 0),
                {
                    str(k): (None if v is None else str(v))
                    for k, v in (d.get("partition") or {}).items()
                },
            )
            for d in data + deletes
        ]
        return spark.createDataFrame(
            rows,
            "content int, file_path string, file_format string, "
            "record_count bigint, file_size_in_bytes bigint, "
            "partition map<string,string>",
        )
    if table == "manifests":
        cur = meta.get("current-snapshot-id")
        snap = next(
            (
                s
                for s in meta.get("snapshots", [])
                if s["snapshot-id"] == cur
            ),
            None,
        )
        rows = []
        if snap is not None and "manifest-list" in snap:
            _sch, manifests = read_container_generic(
                _local(snap["manifest-list"])
            )
            rows = [
                (
                    m["manifest_path"],
                    int(m.get("manifest_length", 0) or 0),
                    int(m.get("added_snapshot_id", 0) or 0),
                    int(m.get("content", 0) or 0),
                )
                for m in manifests
            ]
        return spark.createDataFrame(
            rows,
            "path string, length bigint, added_snapshot_id bigint, "
            "content int",
        )
    raise ValueError(
        f"unknown metadata table {table!r} "
        "(snapshots|history|refs|files|manifests)"
    )


def rewrite_data_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    zorder_by: list[str] | None = None,
) -> dict:
    """Iceberg's ``rewriteDataFiles`` bin-packing compaction — the
    :func:`delta_io.optimize_delta` twin (round-7 verdict elective
    #2): partitions whose live file count exceeds their byte-size-
    implied target are rewritten into ~``target_file_bytes`` files
    and swapped in ONE new snapshot whose manifest lists every
    post-compaction live file with status=0 (EXISTING) — the spec's
    no-logical-change marker, so :func:`read_iceberg_changes` (which
    attributes inserts by status=1 in the snapshot's own manifests)
    emits NOTHING for a rewrite, exactly like Delta's
    ``dataChange: false``. Prior snapshots stay byte-identical for
    AS-OF reads until :func:`expire_snapshots` reclaims them.

    A snapshot carrying row-level DELETE FILES triggers a MAJOR
    compaction (round-8 verdict #5 — the maintenance loop for a table
    taking merge-on-read deletes): every partition rewrites through
    :func:`_scan_with_deletes`, so deleted rows are physically
    dropped, and the new snapshot's manifest list carries NO delete
    manifests — the delete files are retired at the new sequence
    number and become reclaimable by :func:`expire_snapshots`.

    ``zorder_by`` (round-11, the Iceberg twin of
    ``optimize_delta(zorder_by=)`` / Iceberg's sort-strategy rewrite):
    EVERY partition rewrites clustered on the Morton interleave of the
    named numeric columns (``bucketing.zorder_cluster``), so the
    compaction also co-locates and parquet zone maps skip on all the
    named columns at once.

    Concurrency: computed optimistically from the current metadata
    version; aborts (ValueError) if another commit lands before the
    swap. Returns {partitions_compacted, files_before, files_after,
    snapshot_id} (snapshot_id None = nothing to do)."""
    cur_v, meta = _current_metadata(path)
    # v3 compaction is lineage-preserving since r16: rewritten rows
    # carry their coalesced _row_id / _last_updated_sequence_number
    # as MATERIALIZED columns (the spec's mandatory rewrite duty),
    # new files still take fresh first_row_id blocks, next-row-id
    # advances. Materialized lineage columns resolve by NAME on read.
    fv = _format_version_gate(
        meta, "rewrite_data_files", write=True, v3_write_ok=True
    )
    schema, fields = _schema_of(meta)
    specs = meta.get("partition-specs") or (
        [{"spec-id": 0, "fields": meta.get("partition-spec", [])}]
    )
    spec = next(
        s
        for s in specs
        if s.get("spec-id", 0) == meta.get("default-spec-id", 0)
    )
    for f in spec.get("fields", []):
        if f.get("transform", "identity") != "identity":
            raise NotImplementedError(
                f"rewrite over transform {f['transform']!r}; identity only"
            )
    by_id = {f["id"]: f for f in fields}
    pcol_ice = [
        (f["name"], by_id[f["source-id"]]["type"])
        for f in spec.get("fields", [])
    ]
    pcols = [n for n, _t in pcol_ice]
    if zorder_by:
        # every type with a Morton lane map since r16: numerics,
        # strings (LCP-stripped UTF-8 prefix), date/timestamp(tz),
        # boolean — mirrors delta's OPTIMIZE ZORDER gate
        lane_ice = (
            "int", "long", "float", "double",
            "string", "date", "timestamp", "timestamptz", "boolean",
        )
        f_by_name = {f["name"]: f for f in fields}
        for c in zorder_by:
            if c not in f_by_name:
                raise ValueError(
                    f"zorder_by column {c!r} is not a table column"
                )
            if f_by_name[c]["type"] not in lane_ice and not str(
                f_by_name[c]["type"]
            ).startswith("decimal"):
                raise NotImplementedError(
                    f"zorder_by over {f_by_name[c]['type']!r} is out of "
                    "scope (no order-preserving Morton lane map)"
                )
    live, delete_fs = _snapshot_files(path, meta, None, spark=spark)
    want_keys = set(pcols)
    for d in live:
        have = set((d.get("partition") or {}).keys())
        if have != want_keys:
            # a pre-evolution file: its partition record follows an
            # OLDER spec, so grouping it by the default spec's fields
            # would misfile its rows under a null partition. Rewriting
            # across specs needs transform re-evaluation this
            # compactor doesn't do — refuse loudly (r13 partition
            # evolution; reads handle mixed specs fine)
            raise NotImplementedError(
                "live files span partition specs (file "
                f"{os.path.basename(d['file_path'])!r} carries "
                f"{sorted(have)}, default spec is {sorted(want_keys)})"
                " — rewrite across partition evolution is out of scope"
            )
    groups: dict[tuple, list[dict]] = {}
    for d in live:
        pv = d.get("partition") or {}
        groups.setdefault(tuple(pv.get(c) for c in pcols), []).append(d)
    todo = {}
    for key, files in groups.items():
        total = sum(int(d.get("file_size_in_bytes", 0)) for d in files)
        want = max(1, -(-total // target_file_bytes))
        # with live delete files EVERY partition rewrites (major
        # compaction): retiring the delete manifests is only safe
        # once no surviving data file has pending deletes
        if zorder_by or len(files) > want or delete_fs:
            todo[key] = (files, want)
    if not todo:
        return {
            "partitions_compacted": 0,
            "files_before": len(live),
            "files_after": len(live),
            "snapshot_id": None,
        }
    compacted_paths = {
        os.path.abspath(_local(d["file_path"]))
        for files, _w in todo.values()
        for d in files
    }
    new_files: list[dict] = []
    for key, (files, want) in sorted(
        todo.items(), key=lambda kv: repr(kv[0])
    ):
        paths = [_local(d["file_path"]) for d in files]
        staging = os.path.join(
            path, "data", f".staging-{uuid.uuid4().hex}"
        )
        if fv >= 3:
            # carried rows keep their identity: the coalesced lineage
            # pair writes back as materialized columns (unchanged
            # rows, so BOTH values are the originals)
            src = _lineage_scan(spark, schema, fields, files, delete_fs)
        elif delete_fs:
            src = _scan_with_deletes(
                spark, schema, fields, files, delete_fs
            )
        else:
            src = spark.read.schema(schema).parquet(*paths)
        src = _with_field_ids(src, fields)
        if zorder_by:
            from census_asc5_data_pipeline_spark.sources.bucketing import (
                zorder_cluster,
            )

            (
                zorder_cluster(src, list(zorder_by), int(want))
                .write.mode("overwrite")
                .parquet(staging)
            )
        else:
            (
                src.coalesce(int(want))
                .write.mode("overwrite")
                .parquet(staging)
            )
        pv = dict(zip(pcols, key))
        subdir = "/".join(
            f"{c}={urllib.parse.quote(str(pv[c]))}"
            for c in pcols
            if pv[c] is not None
        )
        import pyarrow.parquet as pq

        try:
            for fn in sorted(os.listdir(staging)):
                if not fn.endswith(".parquet") or fn.startswith("."):
                    continue
                if not pq.ParquetFile(
                    os.path.join(staging, fn)
                ).metadata.num_rows:
                    continue  # range partitioner can emit empty parts
                rel = os.path.join(subdir, fn) if subdir else fn
                dst = os.path.join(path, "data", rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(os.path.join(staging, fn), dst)
                new_files.append(
                    {
                        "content": 0,
                        "file_path": os.path.abspath(dst),
                        "file_format": "PARQUET",
                        "partition": pv,
                        "record_count": int(
                            pq.ParquetFile(dst).metadata.num_rows
                        ),
                        "file_size_in_bytes": os.path.getsize(dst),
                        **iceberg_bounds.file_column_metrics(dst, fields),
                    }
                )
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    if _current_metadata(path)[0] != cur_v:
        raise ValueError(
            "concurrent commit landed during rewrite — aborting without "
            "committing (re-run to compact the new state)"
        )
    kept = [
        {
            "content": 0,
            "file_path": os.path.abspath(_local(d["file_path"])),
            "file_format": str(d.get("file_format", "PARQUET")).upper(),
            "partition": {
                c: (d.get("partition") or {}).get(c) for c in pcols
            },
            "record_count": int(d.get("record_count", 0)),
            "file_size_in_bytes": int(d.get("file_size_in_bytes", 0)),
            # carry the untouched files' column metrics forward — a
            # compaction must not silently lose bounds-based skipping
            **{
                k: d[k]
                for k in (
                    "value_counts",
                    "null_value_counts",
                    "lower_bounds",
                    "upper_bounds",
                    # untouched v3 files keep their lineage block
                    "first_row_id",
                )
                if d.get(k) is not None
            },
        }
        for d in live
        if os.path.abspath(_local(d["file_path"])) not in compacted_paths
    ]
    now_ms = int(time.time() * 1000)
    new_v = cur_v + 1
    snap_id = new_v
    seq = int(meta.get("last-sequence-number", cur_v)) + 1
    man_path = os.path.join(
        _meta_dir(path), f"manifest-{snap_id}-{uuid.uuid4().hex}.avro"
    )
    lineage_first: int | None = None
    lineage_next: int | None = None
    if fv >= 3:
        # fresh blocks per spec even though every rewritten row has a
        # materialized _row_id (the block covers only rows whose
        # materialized id is null — here none); next-row-id advances
        lineage_first = int(meta.get("next-row-id", 0) or 0)
        lineage_next = lineage_first
        for d in new_files:
            d["first_row_id"] = lineage_next
            lineage_next += int(d["record_count"])
    all_files = kept + new_files
    entry_schema = _entry_schema_for(pcol_ice)
    if fv >= 3:
        entry_schema["fields"][2]["type"]["fields"].append(
            {"name": "first_row_id", "type": ["null", "long"],
             "default": None}
        )
    with open(man_path, "wb") as fh:
        write_container_generic(
            fh,
            entry_schema,
            [
                # status=0 EXISTING: rearrangement, not new data
                {"status": 0, "snapshot_id": snap_id, "data_file": d}
                for d in all_files
            ],
        )
    manifest = {
        "manifest_path": os.path.abspath(man_path),
        "manifest_length": os.path.getsize(man_path),
        "partition_spec_id": spec.get("spec-id", 0),
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": 0,
        "existing_files_count": len(all_files),
        "deleted_files_count": 0,
        "added_rows_count": 0,
        "existing_rows_count": sum(
            d["record_count"] for d in all_files
        ),
        "deleted_rows_count": 0,
        "partitions": _partition_summaries(all_files, pcol_ice),
    }
    ml_path = os.path.join(
        _meta_dir(path), f"snap-{snap_id}-{uuid.uuid4().hex}.avro"
    )
    ml_rows = [_ml_row(manifest)]
    with open(ml_path, "wb") as fh:
        write_container_generic(fh, _MANIFEST_FILE_SCHEMA, ml_rows)
    replaced = [
        d
        for d in live
        if os.path.abspath(_local(d["file_path"])) in compacted_paths
    ]
    snapshot = {
        "snapshot-id": snap_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": os.path.abspath(ml_path),
        "summary": _snapshot_summary(
            "replace",
            ml_rows,
            _parent_summary(meta, meta.get("current-snapshot-id")),
            added_data_files=len(new_files),
            added_records=sum(
                int(d["record_count"]) for d in new_files
            ),
            added_files_size=sum(
                int(d.get("file_size_in_bytes", 0) or 0)
                for d in new_files
            ),
            deleted_data_files=len(replaced),
            deleted_records=sum(
                int(d["record_count"]) for d in replaced
            ),
            removed_files_size=sum(
                int(d.get("file_size_in_bytes", 0) or 0)
                for d in replaced
            ),
            # the post-compaction live set is fully in hand
            total_files_size=sum(
                int(d.get("file_size_in_bytes", 0) or 0)
                for d in all_files
            ),
        ),
        "schema-id": meta.get("current-schema-id", 0),
    }
    if lineage_first is not None:
        snapshot["first-row-id"] = int(lineage_first)
    new_meta = dict(meta)
    if lineage_next is not None:
        new_meta["next-row-id"] = int(lineage_next)
    new_meta["last-sequence-number"] = seq
    new_meta["last-updated-ms"] = now_ms
    new_meta["current-snapshot-id"] = snap_id
    new_meta["snapshots"] = meta.get("snapshots", []) + [snapshot]
    new_meta["snapshot-log"] = meta.get("snapshot-log", []) + [
        {"timestamp-ms": now_ms, "snapshot-id": snap_id}
    ]
    _write_metadata_version(path, new_v, new_meta)
    return {
        "partitions_compacted": len(todo),
        "files_before": len(live),
        "files_after": len(all_files),
        "snapshot_id": snap_id,
    }


def delete_iceberg_where(
    keys_df: DataFrame, path: str, branch: str | None = None
) -> int:
    """Row-level DELETE as a v2 EQUALITY-DELETE snapshot (the
    merge-on-read write half; :func:`_scan_with_deletes` is the read
    half): ``keys_df``'s columns name the equality fields and its
    rows the values to delete — ``DELETE FROM t WHERE (k1, k2) IN
    (...)`` at spec level. The commit stages the keys as a parquet
    delete file (content=2, ``equality_ids`` = the fields' ids in the
    CURRENT schema), lists it in a content=1 delete manifest at a NEW
    sequence number, and re-lists every prior manifest — so the spec's
    strict ordering gives exactly the right semantics for free: data
    at earlier sequence numbers is affected, data appended later is
    not, and prior snapshots stay byte-identical for AS-OF reads.

    No data file is rewritten (that's the point of merge-on-read at
    100 TB: a delete touching 0.1% of rows costs O(delete keys), not
    O(table)); :func:`expire_snapshots` retains delete files of
    retained snapshots. Returns the snapshot id."""
    spark = keys_df.sparkSession
    cur_v, meta = _current_metadata(path)
    # equality deletes stay FILES in v3 (DVs replace only position
    # deletes) and add no data files, so no lineage duty arises
    _format_version_gate(meta, "DELETE", write=True, v3_write_ok=True)
    _schema, fields = _schema_of(meta)  # rename gate applies
    by_name = {f["name"]: f for f in fields}
    eq_ids: list[int] = []
    for c in keys_df.columns:
        f = by_name.get(c)
        if f is None:
            raise ValueError(
                f"delete key column {c!r} not in the table schema "
                f"(have {sorted(by_name)})"
            )
        want = _SPARK_TO_ICE.get(
            keys_df.schema[c].dataType.simpleString()
        )
        if want != f["type"]:
            raise ValueError(
                f"delete key {c!r} is {want!r} but the table column "
                f"is {f['type']!r}"
            )
        eq_ids.append(f["id"])

    import pyarrow.parquet as pq

    staging = os.path.join(path, "data", f".staging-{uuid.uuid4().hex}")
    keys_df.coalesce(1).write.mode("overwrite").parquet(staging)
    now_ms = int(time.time() * 1000)
    delete_files: list[dict] = []
    try:
        for fn in sorted(os.listdir(staging)):
            if not fn.endswith(".parquet") or fn.startswith("."):
                continue
            dst = os.path.join(
                path, "data", f"delete-{uuid.uuid4().hex}.parquet"
            )
            shutil.move(os.path.join(staging, fn), dst)
            delete_files.append(
                {
                    "content": 2,
                    "file_path": os.path.abspath(dst),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": int(
                        pq.ParquetFile(dst).metadata.num_rows
                    ),
                    "file_size_in_bytes": os.path.getsize(dst),
                    "equality_ids": eq_ids,
                }
            )
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    entry_schema = _entry_schema_for([])
    entry_schema["fields"][2]["type"]["fields"].append(
        {
            "name": "equality_ids",
            "type": ["null", {"type": "array", "items": "int"}],
        }
    )
    return _commit_delete_snapshot(
        path, meta, cur_v, delete_files, entry_schema, branch=branch
    )


def _default_spec_pcol_ice(meta: dict) -> list[tuple[str, str]]:
    """(partition field name, result ice type) pairs of the table's
    default spec — the summary-computation shape. Empty on any
    metadata surprise (summaries are optional)."""
    try:
        _sch, fields = _schema_of(meta, allow_renames=True)
        by_id = {f["id"]: f for f in fields}
        specs = meta.get("partition-specs") or [
            {"spec-id": 0, "fields": meta.get("partition-spec", [])}
        ]
        sid = int(meta.get("default-spec-id", 0))
        spec = next(
            (s for s in specs if int(s.get("spec-id", 0)) == sid), None
        )
        if spec is None:
            return []
        out = []
        for pf in spec.get("fields", []):
            src = by_id.get(pf["source-id"])
            if src is None:
                return []
            out.append(
                (
                    pf["name"],
                    _transform_result_type(
                        pf.get("transform", "identity"),
                        str(src["type"]),
                    ),
                )
            )
        return out
    except Exception:
        return []


def _drop_superseded_dv_entries(
    path: str,
    prev_manifests: list[dict],
    superseded: list[tuple[str, int]],
) -> list[dict]:
    """Retire REPLACED deletion-vector entries from the re-listed
    prior manifests (spec §Deletion vectors: at most one DV per data
    file — a replacement commit must remove the entry it supersedes
    in the SAME snapshot). Prior delete manifests containing a
    superseded (puffin path, content_offset) entry are rewritten
    WITHOUT it into a fresh manifest file (historical snapshots keep
    pointing at the originals, so time travel is intact); the
    manifest-list row's counts are recomputed from the surviving
    entries, and a manifest left empty drops out of the list."""
    if not superseded:
        return prev_manifests
    keys = set(superseded)
    out: list[dict] = []
    for m in prev_manifests:
        if int(m.get("content", 0)) != 1:
            out.append(m)
            continue
        schema_json, entries = read_container_generic(
            _local(m["manifest_path"])
        )
        kept = [
            e
            for e in entries
            if (
                os.path.abspath(
                    _local(e["data_file"]["file_path"])
                ),
                int(e["data_file"].get("content_offset") or -1),
            )
            not in keys
        ]
        if len(kept) == len(entries):
            out.append(m)
            continue
        if not kept:
            continue  # every entry superseded — drop the manifest
        new_path = os.path.join(
            _meta_dir(path),
            f"manifest-dvsup-{uuid.uuid4().hex}.avro",
        )
        with open(new_path, "wb") as fh:
            write_container_generic(fh, schema_json, kept)
        added = [e for e in kept if int(e.get("status", 1)) == 1]
        out.append(
            {
                **m,
                "manifest_path": os.path.abspath(new_path),
                "manifest_length": os.path.getsize(new_path),
                "added_files_count": len(added),
                "existing_files_count": len(kept) - len(added),
                "deleted_files_count": 0,
                "added_rows_count": sum(
                    int(e["data_file"]["record_count"]) for e in added
                ),
                "existing_rows_count": sum(
                    int(e["data_file"]["record_count"])
                    for e in kept
                    if int(e.get("status", 1)) != 1
                ),
                "deleted_rows_count": 0,
            }
        )
    return out


def _commit_delete_snapshot(
    path: str,
    meta: dict,
    cur_v: int,
    delete_files: list[dict],
    entry_schema: dict,
    branch: str | None = None,
    superseded: list[tuple[str, int]] | None = None,
) -> int:
    """Shared commit tail of :func:`delete_iceberg_where` /
    :func:`delete_iceberg_positions`: list the staged delete files in
    a content=1 DELETE manifest at a NEW sequence number, re-list
    every prior manifest (the spec's strict ordering does the rest:
    earlier-sequence data is affected, later appends are not), append
    the snapshot, bump the metadata version. ``branch`` (r13 WAP):
    inherit from and advance the branch head instead of main.
    Returns the snapshot id."""
    branch_base: int | None = None
    if branch is not None:
        bref = (meta.get("refs") or {}).get(branch)
        if bref is None:
            raise ValueError(
                f"unknown branch {branch!r} — create_branch first "
                f"(refs: {sorted(meta.get('refs') or {})})"
            )
        if bref.get("type") != "branch":
            raise ValueError(
                f"ref {branch!r} is a {bref.get('type')!r}, not a "
                "branch — only branches accept writes"
            )
        branch_base = int(bref["snapshot-id"])
    now_ms = int(time.time() * 1000)
    new_v = cur_v + 1
    snap_id = new_v
    seq = int(meta.get("last-sequence-number", cur_v)) + 1
    man_path = os.path.join(
        _meta_dir(path), f"manifest-del-{snap_id}-{uuid.uuid4().hex}.avro"
    )
    with open(man_path, "wb") as fh:
        write_container_generic(
            fh,
            entry_schema,
            [
                {"status": 1, "snapshot_id": snap_id, "data_file": d}
                for d in delete_files
            ],
        )
    cur_snap_id = (
        branch_base if branch is not None
        else meta.get("current-snapshot-id")
    )
    prev_manifests: list[dict] = []
    snap = next(
        (
            s
            for s in meta.get("snapshots", [])
            if s["snapshot-id"] == cur_snap_id
        ),
        None,
    )
    if snap is not None and "manifest-list" in snap:
        _s, prev_manifests = read_container_generic(
            _local(snap["manifest-list"])
        )
    prev_manifests = _drop_superseded_dv_entries(
        path, prev_manifests, superseded or []
    )
    new_manifest = {
        "manifest_path": os.path.abspath(man_path),
        "manifest_length": os.path.getsize(man_path),
        "partition_spec_id": int(meta.get("default-spec-id", 0)),
        "content": 1,  # DELETE manifest
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(delete_files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(
            d["record_count"] for d in delete_files
        ),
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": _partition_summaries(
            delete_files, _default_spec_pcol_ice(meta)
        ),
    }
    ml_path = os.path.join(
        _meta_dir(path), f"snap-{snap_id}-{uuid.uuid4().hex}.avro"
    )
    ml_rows = [_ml_row(m) for m in prev_manifests] + [
        _ml_row(new_manifest)
    ]
    with open(ml_path, "wb") as fh:
        write_container_generic(fh, _MANIFEST_FILE_SCHEMA, ml_rows)
    snapshot = {
        "snapshot-id": snap_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": os.path.abspath(ml_path),
        "summary": _snapshot_summary(
            "delete",
            ml_rows,
            _parent_summary(meta, cur_snap_id),
            added_delete_files=len(delete_files),
            added_position_deletes=sum(
                int(d["record_count"]) for d in delete_files
            ),
            # NO deleted-records: the spec reserves that key for
            # records in removed DATA files; a MoR position delete
            # removes no data file, and stamping the logical count
            # here double-counts for consumers aggregating
            # deleted-records (r15 ADVICE — matches spark-iceberg's
            # SnapshotSummary, which reports only
            # added-delete-files / added-position-deletes)
            added_files_size=sum(
                int(d.get("file_size_in_bytes", 0) or 0)
                for d in delete_files
            ),
        ),
        "schema-id": meta.get("current-schema-id", 0),
    }
    if cur_snap_id is not None and cur_snap_id != -1:
        snapshot["parent-snapshot-id"] = int(cur_snap_id)
    new_meta = dict(meta)
    new_meta["last-sequence-number"] = seq
    new_meta["last-updated-ms"] = now_ms
    new_meta["snapshots"] = meta.get("snapshots", []) + [snapshot]
    if branch is not None:
        new_refs = dict(meta.get("refs") or {})
        new_refs[branch] = {**new_refs[branch], "snapshot-id": snap_id}
        new_meta["refs"] = new_refs
    else:
        new_meta["current-snapshot-id"] = snap_id
        new_meta["snapshot-log"] = meta.get("snapshot-log", []) + [
            {"timestamp-ms": now_ms, "snapshot-id": snap_id}
        ]
    _write_metadata_version(path, new_v, new_meta)
    return snap_id


def _stage_dv_files(
    path: str,
    meta: dict,
    cur_v: int,
    hits: list[tuple[str, list[int]]],
    existing_deletes: list[dict],
) -> tuple[list[dict], dict, list[tuple[str, int]]]:
    """v3 writers MUST express position deletes as DELETION VECTORS,
    not parquet delete files (table spec §Deletion vectors): one
    Puffin file, one deletion-vector-v1 blob per touched data file,
    the manifest entries carrying the DV reference fields. ``hits``
    is [(absolute data-file path, matched positions)] — positions
    pass through the driver to reach the blob writer (O(matched
    rows), the same documented trade as delta_io's DV-mode DELETE).
    A data file that already carries a DV gets a REPLACEMENT per the
    spec's at-most-one-DV rule: the new blob is the union of the old
    positions and the new ones, and the old entry is superseded —
    the commit must drop it from the re-listed prior manifests
    (:func:`_drop_superseded_dv_entries`) in the same snapshot.
    Returns (delete-file entries, their extended manifest-entry
    schema, superseded (puffin path, content_offset) keys). Shared by
    DELETE (:func:`delete_iceberg_positions`) and the v3 MoR
    UPDATE/MERGE commit (merge.py)."""
    from census_asc5_data_pipeline_spark.sources.deletion_vectors import (
        read_iceberg_dv,
        write_iceberg_dv_blob,
    )
    from census_asc5_data_pipeline_spark.sources.puffin import (
        write_puffin,
    )

    old_dv_by_base = {
        os.path.basename(_local(d["referenced_data_file"])): d
        for d in existing_deletes
        if _is_dv_entry(d)
    }
    superseded: list[tuple[str, int]] = []
    merged_hits: list[tuple[str, list[int]]] = []
    for abs_p, pos in hits:
        old = old_dv_by_base.get(os.path.basename(abs_p))
        if old is not None:
            old_pos = read_iceberg_dv(
                _local(old["file_path"]),
                int(old["content_offset"]),
                int(old["content_size_in_bytes"]),
            )
            pos = sorted(set(int(p_) for p_ in pos) | set(old_pos))
            superseded.append(
                (
                    os.path.abspath(_local(old["file_path"])),
                    int(old["content_offset"]),
                )
            )
        merged_hits.append((abs_p, list(pos)))
    hits = merged_hits
    new_snap = cur_v + 1
    new_seq = int(meta.get("last-sequence-number", cur_v)) + 1
    ordered = sorted(hits, key=lambda h: h[0])
    blobs = [
        (
            write_iceberg_dv_blob(sorted(int(p_) for p_ in pos)),
            {
                "type": "deletion-vector-v1",
                "fields": [],
                "snapshot-id": new_snap,
                "sequence-number": new_seq,
                "properties": {
                    "referenced-data-file": abs_p,
                    "cardinality": str(len(set(pos))),
                },
            },
        )
        for abs_p, pos in ordered
    ]
    pf = os.path.join(_meta_dir(path), f"dv-{uuid.uuid4().hex}.puffin")
    blob_metas = write_puffin(pf, blobs)
    dv_schema = _entry_schema_for([])
    dv_schema["fields"][2]["type"]["fields"] += [
        {"name": "referenced_data_file",
         "type": ["null", "string"], "default": None},
        {"name": "content_offset", "type": ["null", "long"],
         "default": None},
        {"name": "content_size_in_bytes",
         "type": ["null", "long"], "default": None},
    ]
    dv_files = [
        {
            "content": 1,
            "file_path": os.path.abspath(pf),
            "file_format": "PUFFIN",
            "partition": {},
            "record_count": len(set(pos)),
            "file_size_in_bytes": os.path.getsize(pf),
            "referenced_data_file": abs_p,
            "content_offset": int(bm["offset"]),
            "content_size_in_bytes": int(bm["length"]),
        }
        for (abs_p, pos), bm in zip(ordered, blob_metas)
    ]
    return dv_files, dv_schema, superseded


def delete_iceberg_positions(
    spark: SparkSession, path: str, where: str,
    branch: str | None = None,
) -> int | None:
    """Row-level DELETE as a v2 POSITION-DELETE snapshot — the other
    merge-on-read write mode (:func:`delete_iceberg_where` writes
    equality deletes; this writes content=1 files of (file_path, pos)
    pairs, the shape engines emit for ``DELETE FROM t WHERE <pred>``
    over arbitrary predicates). The matching rows' positions come from
    a ``_metadata.row_index`` scan of the LIVE rows — existing delete
    files are applied first via :func:`_scan_with_deletes`, so an
    already-deleted row is never re-listed — and are committed sorted
    by (file_path, pos) per spec. The read path
    (:func:`_scan_with_deletes`) and change feed
    (:func:`read_iceberg_changes`, which recovers the deleted rows'
    FULL images) already consume these.

    Costs one distributed predicate scan + an O(matched rows) delete
    file; no data file is rewritten (merge-on-read: a 0.1% delete on
    100 TB writes ~positions, not ~table). Returns the new snapshot
    id, or None if nothing matched (no empty snapshot is committed)."""
    from pyspark.sql import functions as F

    cur_v, meta = _current_metadata(path)
    fv = _format_version_gate(
        meta, "DELETE", write=True, v3_write_ok=True,
        # the predicate scan materializes defaults (r16) — a WHERE
        # over an initial-default column must match pre-schema rows
        defaults_ok=True,
    )
    branch_head = None
    if branch is not None:
        bref = (meta.get("refs") or {}).get(branch)
        if bref is None or bref.get("type") != "branch":
            raise ValueError(
                f"unknown or non-branch ref {branch!r} "
                f"(refs: {sorted(meta.get('refs') or {})})"
            )
        branch_head = int(bref["snapshot-id"])
    schema, fields = _schema_of(meta)
    # candidate pruning (r14, the _update_iceberg discipline):
    # partition atoms skip whole data manifests via the manifest-list
    # summaries, bounds skip files — already-matchless files are
    # never scanned or position-addressed; the full predicate still
    # applies row-wise so results are exact
    from census_asc5_data_pipeline_spark.sources import (
        delta_stats as _dsk,
    )

    atoms = _dsk.parse_skip_predicate(where)
    tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
    pruner = (
        _manifest_summary_pruner(meta, fields, atoms, session_tz=tz)
        if atoms is not None
        else None
    )
    data_files, delete_fs = _snapshot_files(
        path, meta, branch_head, spark=spark, manifest_pruner=pruner
    )
    if atoms is not None and data_files:
        data_files = _skip_by_bounds(
            data_files, atoms, fields, meta, session_tz=tz
        )
    if not data_files:
        return None
    abs_of_base: dict[str, str] = {}
    for d in data_files:
        ap = os.path.abspath(_local(d["file_path"]))
        base = os.path.basename(ap)
        if base in abs_of_base and abs_of_base[base] != ap:
            raise ValueError(
                f"duplicate data-file basename {base!r} — cannot "
                "address positions unambiguously"
            )
        abs_of_base[base] = ap
    defaulted = (
        [f for f in fields if f.get("initial-default") is not None]
        if fv >= 3
        else []
    )
    if defaulted:
        scan = _scan_with_defaults(
            spark, schema, fields, data_files, delete_fs, defaulted,
            keep_pos=True,
        )
    else:
        scan = _scan_with_deletes(
            spark, schema, fields, data_files, delete_fs, keep_pos=True
        )
    base_df = F.broadcast(
        spark.createDataFrame(
            sorted(abs_of_base.items()), "__base string, __abs string"
        )
    )
    if fv >= 3:
        hit_rows = (
            scan.where(where)
            .join(base_df, "__base")
            .groupBy("__abs")
            .agg(F.collect_list("__ri").alias("pos"))
            .collect()
        )
        if not hit_rows:
            return None
        dv_files, dv_schema, superseded = _stage_dv_files(
            path, meta, cur_v,
            [(r["__abs"], list(r["pos"])) for r in hit_rows],
            delete_fs,
        )
        if _current_metadata(path)[0] != cur_v:
            raise ValueError(
                "concurrent commit landed during DV planning — "
                "aborting without committing (positions may be stale)"
            )
        return _commit_delete_snapshot(
            path, meta, cur_v, dv_files, dv_schema, branch=branch,
            superseded=superseded,
        )
    pos_df = (
        scan.where(where)
        .join(base_df, "__base")
        .select(
            F.col("__abs").alias("file_path"),
            F.col("__ri").alias("pos"),
        )
        # range-partition + in-partition sort: each delete FILE stays
        # sorted by (file_path, pos) per spec, a 100 TB-scale delete
        # spreads over many files, and AQE coalesces a small delete
        # back to one
        .repartitionByRange("file_path", "pos")
        .sortWithinPartitions("file_path", "pos")
    )

    import pyarrow.parquet as pq

    staging = os.path.join(path, "data", f".staging-{uuid.uuid4().hex}")
    delete_files: list[dict] = []
    try:
        pos_df.write.mode("overwrite").parquet(staging)
        for fn in sorted(os.listdir(staging)):
            if not fn.endswith(".parquet") or fn.startswith("."):
                continue
            nrows = int(
                pq.ParquetFile(os.path.join(staging, fn)).metadata.num_rows
            )
            if nrows == 0:
                continue
            dst = os.path.join(
                path, "data", f"pos-delete-{uuid.uuid4().hex}.parquet"
            )
            shutil.move(os.path.join(staging, fn), dst)
            delete_files.append(
                {
                    "content": 1,
                    "file_path": os.path.abspath(dst),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": nrows,
                    "file_size_in_bytes": os.path.getsize(dst),
                }
            )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    if not delete_files:
        return None
    if _current_metadata(path)[0] != cur_v:
        raise ValueError(
            "concurrent commit landed during position-delete planning — "
            "aborting without committing (positions may be stale)"
        )
    return _commit_delete_snapshot(
        path, meta, cur_v, delete_files, _entry_schema_for([]),
        branch=branch
    )


def rollback_iceberg(path: str, snapshot_id: int) -> int:
    """Iceberg's ``rollback_to_snapshot``: a NEW metadata version
    whose current-snapshot-id points at the given (still-retained)
    snapshot — no data or manifest is touched, the rolled-back state
    is immediately current and every other snapshot stays AS-OF
    readable. The snapshot-log records the rollback (same snapshot
    id, new timestamp), so history shows it happened. Returns the new
    metadata version."""
    cur_v, meta = _current_metadata(path)
    snaps = meta.get("snapshots", [])
    if not any(s["snapshot-id"] == snapshot_id for s in snaps):
        raise ValueError(
            f"snapshot {snapshot_id} not in table {path!r} "
            f"(have {[s['snapshot-id'] for s in snaps]})"
        )
    new_v = cur_v + 1
    now_ms = int(time.time() * 1000)
    new_meta = dict(meta)
    new_meta["current-snapshot-id"] = snapshot_id
    new_meta["last-updated-ms"] = now_ms
    new_meta["snapshot-log"] = meta.get("snapshot-log", []) + [
        {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
    ]
    _write_metadata_version(path, new_v, new_meta)
    return new_v
