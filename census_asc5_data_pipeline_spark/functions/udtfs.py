"""Python user-defined TABLE functions — the SQL-callable lateral
surface of the engine (Spark 4 ``@udtf``).

UDTFs are the Python-row path: per-row generator invocation, no Arrow
batching, no codegen — so every UDTF here has a pure-``F.*`` operator
twin that IS the hot path (``operators/text.chunk_documents`` for
:class:`TextChunks`), pinned equal in tests/test_udtf.py. The UDTF
exists for API-surface parity: a SQL user of the reference engine can
``SELECT c.* FROM docs, LATERAL text_chunks(text, 64, 32) c`` without
leaving SQL, and the registration round-trips through a plain
``spark.udtf.register`` that any session can replay.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.session import SparkSession


@udtf(returnType="chunk_id INT, n_tokens BIGINT, chunk_text STRING")
class TextChunks:
    """Sliding token-window chunking, semantics identical to
    ``operators/text.chunk_documents``: windows of ``width`` tokens
    every ``stride`` tokens, only FULL windows except that a document
    shorter than one window yields its single partial chunk;
    chunk_id = start // stride."""

    def eval(self, text: str, width: int, stride: int):
        toks = (text or "").lower().split()
        if not toks:
            return
        last_start = max(len(toks) - width, 0)
        for start in range(0, last_start + 1, stride):
            window = toks[start : start + width]
            yield start // stride, len(window), " ".join(window)


@udtf(returnType="pos INT, key STRING, value STRING, vtype STRING")
class JsonFields:
    """Explode a ragged JSON object payload into one row per
    TOP-LEVEL field — the lateral surface of Spark's
    ``variant_explode`` for string payloads, plus a ``vtype`` tag
    (object/array/string/number/boolean/null) SQL can route on.

    Stringification contract matches the pure-``F.*`` twin
    ``F.posexplode(F.map_entries(F.from_json(col,
    'map<string,string>')))`` on SCALAR fields (the hot path, pinned
    equal in tests/test_udtf.py): strings verbatim without quotes,
    numbers as their JSON literal, booleans ``true``/``false``, JSON
    null → SQL NULL. Nested objects/arrays re-serialize compactly
    (separators ``(',', ':')``); field order and ``pos`` follow the
    payload's own order, as ``variant_explode`` does. Malformed or
    non-object payloads yield no rows (the PERMISSIVE discipline — a
    lateral join drops them instead of failing the query)."""

    def eval(self, text: str):
        import json as _json

        if not text:
            return
        try:
            obj = _json.loads(text)
        except (ValueError, TypeError):
            return
        if not isinstance(obj, dict):
            return
        for pos, (k, v) in enumerate(obj.items()):
            if v is None:
                yield pos, k, None, "null"
            elif isinstance(v, bool):
                yield pos, k, "true" if v else "false", "boolean"
            elif isinstance(v, str):
                yield pos, k, v, "string"
            elif isinstance(v, (int, float)):
                yield pos, k, _json.dumps(v), "number"
            elif isinstance(v, list):
                yield pos, k, _json.dumps(
                    v, separators=(",", ":")
                ), "array"
            else:
                yield pos, k, _json.dumps(
                    v, separators=(",", ":")
                ), "object"


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the engine's UDTFs on a session."""
    spark.udtf.register("text_chunks", TextChunks)
    spark.udtf.register("json_fields", JsonFields)
