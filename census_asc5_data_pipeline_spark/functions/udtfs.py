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


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the engine's UDTFs on a session."""
    spark.udtf.register("text_chunks", TextChunks)
