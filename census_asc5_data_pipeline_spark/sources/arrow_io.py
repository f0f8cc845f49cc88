"""Arrow IPC (Feather V2) source/sink — columnar interchange with
ZERO row-level Python anywhere: Spark already moves task data as Arrow
record batches under ``mapInArrow``, and the IPC file format IS those
batches on disk, so the write path streams each task's batches straight
into a ``RecordBatchFileWriter`` and the read path yields a file's
batches back verbatim. Contrast with ``avro_io``'s pure-python
fallback codec (per-row encode by necessity of the format): here the
container format is Arrow-native, so the interchange boundary runs at
Arrow memory bandwidth.

Same plumbing discipline as ``avro_io``: one ``.arrow`` file per task
(unique names + ``.inprogress`` rename — safe under task retry), a
driver-side manifest-FIRST atomic ``_manifest.json`` publish carrying
the Spark DDL (so an empty dataset reads back schema-stable), stale
parts from a prior manifest deleted only after the new one lands, and
file-parallel reads planned from the manifest (or a listing for
foreign directories). Files interchange with any Arrow/Feather reader
(pandas.read_feather, polars, DuckDB's read_arrow, ...).

Types: the engine's flat interchange set (bigint/int/double/float/
string/boolean/binary) plus timestamp (microsecond IPC encoding —
Spark's own Arrow wire unit). Nested types raise.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_PA_TO_DDL = {
    "int64": "bigint",
    "int32": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "binary": "binary",
    "large_binary": "binary",
}

_SUPPORTED_SPARK = {
    "bigint",
    "int",
    "double",
    "float",
    "string",
    "boolean",
    "binary",
    "timestamp",
}


def _spark_ddl_of_arrow(schema) -> str:
    import pyarrow as pa

    parts = []
    for f in schema:
        if pa.types.is_timestamp(f.type):
            ddl = "timestamp"
        else:
            ddl = _PA_TO_DDL.get(str(f.type))
        if ddl is None:
            raise TypeError(
                f"unsupported arrow type {f.type} for field {f.name!r} — "
                "the interchange surface is flat primitives + timestamp"
            )
        parts.append(f"`{f.name.replace('`', '``')}` {ddl}")
    return ", ".join(parts)


def _check_schema(df: DataFrame) -> None:
    for f in df.schema.fields:
        if f.dataType.simpleString() not in _SUPPORTED_SPARK:
            raise TypeError(
                f"unsupported column type {f.dataType.simpleString()!r} "
                f"for field {f.name!r} — flat primitives + timestamp only"
            )


def write_arrow(df: DataFrame, path: str, mode: str = "overwrite") -> int:
    """Write ``df`` as Arrow IPC files under ``path``; returns the row
    count (reconciled from the per-task manifest rows, no extra job)."""
    _check_schema(df)
    spark = df.sparkSession
    if mode not in ("overwrite", "error"):
        raise ValueError(f"unsupported mode {mode!r} (overwrite|error)")
    manifest_path = os.path.join(path, "_manifest.json")
    if mode == "error" and os.path.exists(manifest_path):
        raise FileExistsError(path)
    stale: list[str] = []
    if os.path.exists(manifest_path):
        stale = [p["path"] for p in json.load(open(manifest_path))["parts"]]
    # quoted-DDL back-compat string: backticks in a name are escaped by
    # doubling, per the Spark identifier grammar — otherwise the string
    # is unparseable by the real DDL parser
    ddl = ", ".join(
        f"`{f.name.replace('`', '``')}` {f.dataType.simpleString()}"
        for f in df.schema.fields
    )
    os.makedirs(path, exist_ok=True)

    # pyspark's mapInArrow resolves every input column BY NAME
    # (self[col]), which chokes on backtick-containing names — feed it
    # positional placeholders and restore the real names inside the
    # task so the IPC files carry the true schema
    names = [f.name for f in df.schema.fields]
    safe_df = df.toDF(*[f"c{i}" for i in range(len(names))])

    def _task(batches):
        import uuid

        import pyarrow as pa

        fname = f"part-{uuid.uuid4().hex}.arrow"
        full = os.path.join(path, fname)
        writer = None
        n = 0
        for b in batches:
            if not b.num_rows:
                continue
            b = pa.RecordBatch.from_arrays(list(b.columns), names)
            if writer is None:
                sink = pa.OSFile(full + ".inprogress", "wb")
                writer = pa.ipc.new_file(sink, b.schema)
            writer.write_batch(b)
            n += b.num_rows
        if writer is None:
            yield pa.RecordBatch.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                ["file", "n_rows"],
            )
            return
        writer.close()
        sink.close()
        os.replace(full + ".inprogress", full)
        yield pa.RecordBatch.from_arrays(
            [pa.array([fname]), pa.array([n], pa.int64())],
            ["file", "n_rows"],
        )

    parts = safe_df.mapInArrow(_task, "file string, n_rows bigint").collect()
    committed = [
        {"path": r["file"], "n_rows": r["n_rows"]} for r in parts if r["file"]
    ]
    total = sum(p["n_rows"] for p in committed)
    tmp = manifest_path + ".inprogress"
    with open(tmp, "w") as fh:
        # "fields" is the authoritative schema: structured (name, type)
        # pairs survive column names containing commas or backticks,
        # which the quoted-DDL string (kept for interchange
        # back-compat) cannot round-trip through a naive split
        # (advisor round-6 finding)
        json.dump(
            {
                "parts": committed,
                "spark_ddl": ddl,
                "fields": [
                    [f.name, f.dataType.simpleString()]
                    for f in df.schema.fields
                ],
                "n_rows": total,
            },
            fh,
        )
    os.replace(tmp, manifest_path)
    for p in stale:
        if p not in {c["path"] for c in committed}:
            try:
                os.remove(os.path.join(path, p))
            except FileNotFoundError:
                pass
    return total


def read_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Read Arrow IPC files under ``path``: schema from the manifest
    (or the first file's IPC footer — one tiny driver read), one decode
    task per file, each yielding the file's record batches VERBATIM.

    The decode task receives the target schema as STRUCTURED (name,
    type) pairs resolved on the driver — never by re-splitting the
    manifest's quoted-DDL string, which a column name containing a
    comma or backtick (legal in quoted DDL) would break (advisor
    round-6 finding). Resolution order: manifest ``fields`` (written
    by this sink) → manifest ``spark_ddl`` parsed with the real Spark
    DDL parser → the first file's IPC footer."""
    from pyspark.sql import types as T

    manifest = os.path.join(path, "_manifest.json")
    meta = None
    if os.path.exists(manifest):
        meta = json.load(open(manifest))
        files = [os.path.join(path, p["path"]) for p in meta["parts"]]
    else:
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".arrow")
        )

    def _pairs_from_meta():
        if meta is None:
            return None
        if "fields" in meta:
            return [(n, t) for n, t in meta["fields"]]
        if "spark_ddl" in meta:  # pre-r7 manifests: real parser, driver-side
            st = T.StructType.fromDDL(meta["spark_ddl"])
            return [(f.name, f.dataType.simpleString()) for f in st.fields]
        return None

    pairs = _pairs_from_meta()
    if not files:
        if pairs is not None:
            return spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField(n, T._parse_datatype_string(t))
                        for n, t in pairs
                    ]
                ),
            )
        raise FileNotFoundError(f"no .arrow files under {path!r}")
    if pairs is None:
        import pyarrow as pa

        with pa.ipc.open_file(files[0]) as rd:
            st = T.StructType.fromDDL(_spark_ddl_of_arrow(rd.schema))
        pairs = [(f.name, f.dataType.simpleString()) for f in st.fields]
    out_schema = T.StructType(
        [T.StructField(n, T._parse_datatype_string(t)) for n, t in pairs]
    )

    def _task(batches):
        import pyarrow as pa

        inv = {
            "bigint": pa.int64(),
            "int": pa.int32(),
            "double": pa.float64(),
            "float": pa.float32(),
            "string": pa.string(),
            "boolean": pa.bool_(),
            "binary": pa.binary(),
            "timestamp": pa.timestamp("us", tz="UTC"),
        }
        target = pa.schema([pa.field(n, inv[t]) for n, t in pairs])
        for b in batches:
            for f in b.column(0).to_pylist():
                with pa.ipc.open_file(f) as rd:
                    for i in range(rd.num_record_batches):
                        rb = rd.get_batch(i)
                        if rb.schema != target:
                            # foreign writers (polars large_string,
                            # naive timestamps, ...) — cast to the
                            # declared interchange schema
                            rb = (
                                pa.Table.from_batches([rb])
                                .cast(target)
                                .combine_chunks()
                                .to_batches()
                            )
                            for x in rb:
                                yield x
                        else:
                            yield rb

    flist = spark.createDataFrame(
        [(f,) for f in files], "f string"
    ).repartition(len(files))
    return flist.mapInArrow(_task, out_schema)
