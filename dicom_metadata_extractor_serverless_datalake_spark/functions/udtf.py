"""Python user-defined table functions (Spark 4 ``@udtf``): row ->
many-rows transforms registered as SQL table functions.

Completes the Python UDF surface alongside mapInPandas (ingest),
applyInPandas (q65), GROUPED_AGG pandas_udf (q66): a UDTF is the
LATERAL-join-able form — usable directly from SQL:

    register_udtfs(spark)
    spark.sql("SELECT doc_id, c.* FROM documents, "
              "LATERAL chunk_text(text, 256) AS c")

Scale notes: UDTFs run row-at-a-time in Python — fine for low-volume
lateral expansion, but the hot chunking path in this engine stays the
JVM-side sequence+posexplode of q73 (queries/training.py). The UDTF
exists for API completeness and for transforms with genuinely
imperative per-row logic (the ``terminate`` summary row pattern).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.types import Row


@udtf(returnType="chunk_id: bigint, chunk: string, chunk_len: bigint")
class ChunkText:
    """Fixed-width character chunks of one text value."""

    def eval(self, text: str, width: int = 256):
        if not text or width <= 0:
            return
        for i in range(0, len(text), width):
            piece = text[i : i + width]
            yield Row(chunk_id=i // width, chunk=piece, chunk_len=len(piece))


@udtf(returnType="token: string, pos: bigint")
class WhitespaceTokens:
    """Tokens with positions, plus a terminate() summary row pattern:
    emits a final (token='<EOS>', pos=n_tokens) marker row."""

    def __init__(self):
        self._n = 0

    def eval(self, text: str):
        for pos, tok in enumerate((text or "").split()):
            self._n += 1
            yield Row(token=tok, pos=pos)

    def terminate(self):
        yield Row(token="<EOS>", pos=self._n)


def register_udtfs(spark) -> None:
    spark.udtf.register("chunk_text", ChunkText)
    spark.udtf.register("ws_tokens", WhitespaceTokens)
