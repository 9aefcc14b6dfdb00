"""Python UDTFs (user-defined table functions, PySpark 4 API) — the
row-expanding escape hatch for logic that genuinely cannot be expressed as
Column algebra or a built-in generator.

The engine's own chunker (queries/llmdata.py::q_chunk_documents) is pure
Column algebra (sequence + transform + explode) and is the hot path; the
UDTF twin here exists to cover the API surface and as the template for
genuinely imperative expansions (e.g. a real BPE tokenizer or a stateful
parser), with a test pinning it row-for-row to the Column version. UDTFs
run Python per input row — Arrow-batched transport but interpreted eval —
so at 100 TB reach for them only when the built-ins truly cannot express
the semantics.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id: int, chunk_text: string, n_tokens: int")
class ChunkDocument:
    """Split a whitespace-tokenized document into fixed-budget chunks.

    Yields one row per chunk: (chunk_id, chunk text, token count). The
    final partial chunk is kept (same semantics as q_chunk_documents).
    """

    def eval(self, text: str, chunk_tokens: int = 50):  # noqa: D102
        if text is None:
            return
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return
        for i in range(0, len(toks), chunk_tokens):
            window = toks[i:i + chunk_tokens]
            yield i // chunk_tokens, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL use (LATERAL-style invocation:
    ``SELECT d.doc_id, c.* FROM docs d, chunk_document(d.text, 50) c``)."""
    spark.udtf.register("chunk_document", ChunkDocument)
