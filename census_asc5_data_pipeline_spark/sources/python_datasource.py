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
    InputPartition,
    SimpleDataSourceStreamReader,
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
    spark.dataSource.register(SyntheticDocsDataSource)
