"""Reconstruction property for context-window chunking: taking the
first STRIDE tokens of every chunk except the last, then the last chunk
whole, and concatenating must rebuild each document's normalized text
EXACTLY — i.e. the windows tile the token sequence with the declared
overlap and lose nothing. Checked over every document at sf0.001."""

from __future__ import annotations

from bigdatafinalproject_spark.operators.text import norm_text
from bigdatafinalproject_spark.queries.corpus_mix import _STRIDE
from bigdatafinalproject_spark.registry import QUERIES
from tests.conftest import SF_DIR


def test_chunks_reconstruct_every_document(spark):
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.catalog import load_table

    chunks = QUERIES["doc_chunk_overlap"](spark, SF_DIR)
    per_doc = {
        r.doc_id: [c for _, c in sorted(r.cs)]
        for r in chunks.groupBy("doc_id")
        .agg(F.collect_list(F.struct("chunk_idx", "chunk_text")).alias("cs"))
        .collect()
    }
    want = {
        r.doc_id: r.norm
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", norm_text(F.col("text")).alias("norm"))
        .collect()
    }
    assert set(per_doc) == set(want)
    for doc_id, cs in per_doc.items():
        rebuilt_toks: list[str] = []
        for c in cs[:-1]:
            rebuilt_toks.extend(c.split(" ")[:_STRIDE])
        rebuilt_toks.extend(cs[-1].split(" "))
        assert " ".join(rebuilt_toks) == want[doc_id], doc_id
