"""Spark 4 Python UDTF surface — the table-function side of the UDF
extensibility contract (SURVEY §2.11).

The reference's extensibility story is scalar ``transform_<name>``
functions; Spark 4 adds user-defined TABLE functions (one input row →
N output rows with their own schema), registrable for SQL lateral use.
These tests pin the API shape the engine relies on: programmatic
``F.udtf``, SQL registration via ``spark.udtf.register``, LATERAL
correlation against a table, and the analyze-free fixed-schema path.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class TokenChunks:
    """Split text into fixed-size token chunks with a stride — the UDTF
    twin of operators/textanalysis.token_chunks (which stays the scale
    path: pure column expressions beat Python row fan-out; this exists
    to exercise the TABLE-function contract)."""

    def eval(self, text: str, size: int, stride: int):
        if text is None:
            return
        toks = text.split()
        idx = 0
        for start in range(0, max(len(toks) - size + 1, 1), stride):
            chunk = toks[start:start + size]
            yield idx, " ".join(chunk), len(chunk)
            idx += 1


def test_udtf_programmatic_call(spark):
    df = TokenChunks(lit("a b c d e"), lit(3), lit(2))
    rows = [(r.chunk_idx, r.chunk, r.n_tokens) for r in df.collect()]
    assert rows == [(0, "a b c", 3), (1, "c d e", 3)]


def test_udtf_sql_lateral_join(spark):
    spark.udtf.register("token_chunks", TokenChunks)
    docs = spark.createDataFrame(
        [(1, "w x y z"), (2, "p q"), (3, None)], ["doc_id", "text"]
    )
    docs.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM udtf_docs d,
        LATERAL token_chunks(d.text, 2, 2) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    ).collect()
    got = [(r.doc_id, r.chunk_idx, r.chunk) for r in out]
    # doc 3 (NULL text) yields no rows — lateral drops it
    assert got == [
        (1, 0, "w x"), (1, 1, "y z"),
        (2, 0, "p q"),
    ]


def test_udtf_terminate_emits_summary_rows(spark):
    """The terminate() hook emits per-partition trailer rows — the
    pattern for per-batch summaries/footers."""

    @udtf(returnType="kind string, value bigint")
    class CountingEcho:
        def __init__(self):
            self.seen = 0

        def eval(self, x: int):
            self.seen += 1
            yield "row", x

        def terminate(self):
            yield "count", self.seen

    out = CountingEcho(lit(7)).collect()
    assert [(r.kind, r.value) for r in out] == [("row", 7), ("count", 1)]
