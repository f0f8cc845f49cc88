"""Custom Python Data Source (the Spark 4 ``pyspark.sql.datasource``
API): a deterministic synthetic-corpus source, registered as a real
``spark.read.format(...)`` / ``spark.readStream.format(...)`` format.

Why this exists: the reference's extract phase is a bespoke driver-side
loop (extractCensusACS5.py:17-45 — fetch, concat, write). The Python
Data Source API is the Spark-native replacement for that whole
category: the source declares its schema and PARTITIONS, executors
pull rows in parallel (Arrow-batched under the hood), and the same
class serves batch and streaming. This implementation generates a
deterministic document corpus (salted-md5 content — reproducible
run-to-run, partition-parallel with no coordination), standing in for
any external system whose client library is pure Python: a paginated
HTTP API, a proprietary binary log, a message queue.

Scale shape: N output rows split across ``partitions`` independent
input partitions — each executor generates its slice from (start, end)
alone, so there is no driver bottleneck and no shuffle; the streaming
reader's offset is a single row counter (exactly-once via Spark's
offset log + deterministic regeneration on replay).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_WORDS = (
    "spark shuffle join filter scan merge sort window batch stream "
    "table row column vector hash key value data query agg part order"
).split()


def _doc_row(i: int) -> tuple:
    """Deterministic row i: salted-md5 drives length/content/source —
    identical on every executor, every run, every replay."""
    h = hashlib.md5(f"pyds-v1-{i}".encode()).hexdigest()
    n = 8 + int(h[:2], 16) % 25
    toks = [
        _WORDS[int(h[(2 + j) % 30] + h[(3 + j) % 30], 16) % len(_WORDS)]
        for j in range(n)
    ]
    return (i, " ".join(toks), f"src{int(h[4:6], 16) % 8}")


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))
        return [
            _Range(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _doc_row(i)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Unbounded variant: offset = plain row counter; each micro-batch
    emits up to ``rows_per_batch`` new rows. Replays regenerate the
    identical rows (deterministic generator), so the source composes
    with any at-least-once sink into exactly-once results."""

    def __init__(self, options):
        self.per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        lo = start["i"]
        hi = lo + self.per_batch
        return (iter([_doc_row(i) for i in range(lo, hi)]), {"i": hi})

    def readBetweenOffsets(self, start, end):
        return iter([_doc_row(i) for i in range(start["i"], end["i"])])


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return "doc_id bigint, text string, source string"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    # once per session (r17): see delta_stream_source.register
    if getattr(spark, "_graft_synth_docs_source", False):
        return
    spark.dataSource.register(SyntheticDocsDataSource)
    spark._graft_synth_docs_source = True


# ---------------------------------------------------------------- writer


class _PartFile(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path, self.n_rows = path, n_rows


class ManifestJsonlWriter(DataSourceWriter):
    """Transactional JSONL sink via the Python Data Source write
    protocol: each task writes its partition to a uniquely-named part
    file and returns a commit message; the DRIVER's ``commit`` then
    writes the ``_manifest.json`` listing exactly the committed parts.
    Readers that go through the manifest never see a torn write — a
    failed/speculative task's orphan file is simply absent from the
    manifest (and ``abort`` removes anything reported). This is the
    same two-phase discipline as the versioned snapshot store, now at
    the task level via Spark's own commit protocol. ``mode("append")``
    unions the new parts into the existing manifest;
    ``mode("overwrite")`` publishes a manifest of only the new parts,
    then deletes the replaced part files (manifest first, so a crash
    between the two leaves orphans, never a torn manifest).
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_jsonl requires .option('path', ...)")
        self.overwrite = overwrite
        self.lock_timeout = float(options.get("lock_timeout", "30"))

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(fname, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartFile(fname, n)

    def commit(self, messages):
        """Driver-side publish. Append mode is a read-modify-write of
        ``_manifest.json``, so the read→replace window is serialized
        under an exclusive lock file (O_CREAT|O_EXCL — atomic on POSIX
        and object-store-gateway filesystems alike): without it, two
        concurrent append jobs both read the prior manifest and the
        second ``os.replace`` silently drops the first job's parts
        (advisor round-5 finding). The prior manifest is re-read
        INSIDE the lock, the tmp-write + rename stays atomic for
        readers, and a stale lock (crashed committer) times out with a
        clear error rather than deadlocking."""
        import json
        import os
        import time

        manifest = os.path.join(self.path, "_manifest.json")
        lock = manifest + ".lock"
        deadline = time.time() + self.lock_timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                break
            except FileExistsError:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"manifest lock {lock!r} held for "
                        f">{self.lock_timeout}s — a crashed committer "
                        "leaves it behind; remove it manually after "
                        "verifying no writer is live"
                    )
                time.sleep(0.05)
        try:
            parts = [
                {"path": os.path.basename(m.path), "n_rows": m.n_rows}
                for m in messages
                if m is not None
            ]
            stale: list[str] = []
            if os.path.exists(manifest):
                prior = json.load(open(manifest, encoding="utf-8"))["parts"]
                if self.overwrite:
                    # replaced parts are deleted only AFTER the new
                    # manifest publishes — a crash in between leaves
                    # orphan files, never a torn manifest
                    stale = [p["path"] for p in prior]
                else:
                    parts = prior + parts  # append: union of commits
            tmp = manifest + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(
                    {"parts": parts,
                     "n_rows": sum(p["n_rows"] for p in parts)}, f
                )
            os.replace(tmp, manifest)  # atomic publish
            for name in stale:
                old = os.path.join(self.path, name)
                if os.path.exists(old):
                    os.remove(old)
        finally:
            os.remove(lock)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class ManifestJsonlDataSource(DataSource):
    @classmethod
    def name(cls):
        return "manifest_jsonl"

    def schema(self):
        return "doc_id bigint, text string, source string"

    def writer(self, schema, overwrite):
        return ManifestJsonlWriter(self.options, overwrite)


def register_writer(spark) -> None:
    spark.dataSource.register(ManifestJsonlDataSource)
