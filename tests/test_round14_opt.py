"""Round-14 OPTIMIZATION regressions: every operator-internal change of
the optimization round is pinned as a pure plan transform — identical
rows to the default path, only the physical shape differs.

- ``shingle_table(partition_by_id=True)`` must be row-identical in BOTH
  distinct modes (the optimization relies on min-over-multiset ==
  min-over-set for the distinct=False MinHash path, and on hash
  partitioning never changing a distinct's result set);
- the new caller-owned ``storage=`` seams (``resolve_entities``,
  ``semantic_dedup_decisions``) must not change a single output row —
  persist is an evaluation-count optimization, never a semantic one.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.dedup import (
    minhash_signatures,
    shingle_table,
)
from clickhouse_mysql_data_reader_spark.operators.linkage import (
    resolve_entities,
)
from clickhouse_mysql_data_reader_spark.operators.similarity import (
    centroids_by_cell,
    semantic_dedup_decisions,
)
from clickhouse_mysql_data_reader_spark.sources.parquet import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_shingle_partition_by_id_row_identical_distinct(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = shingle_table(docs, "text", "doc_id", k=3)
    opt = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True)
    assert _rows(base) == _rows(opt)


def test_shingle_partition_by_id_minhash_identical_nondistinct(spark, sf_dir):
    # distinct=False feeds MinHash: the multiset may legitimately carry
    # different per-partition orders, but the signatures (min per hash)
    # must be bit-identical — min over a multiset == min over its set.
    docs = load_table(spark, sf_dir, "documents")
    base = minhash_signatures(
        shingle_table(docs, "text", "doc_id", k=3, distinct=False), 16
    )
    opt = minhash_signatures(
        shingle_table(
            docs, "text", "doc_id", k=3, distinct=False, partition_by_id=True
        ),
        16,
    )
    assert _rows(base) == _rows(opt)


def test_resolve_entities_storage_row_identical(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    blk = lambda c: F.split(c, " ").getItem(1)  # noqa: E731
    base = _rows(resolve_entities(part, "p_name", block_fn=blk, max_dist=2))
    opt = _rows(
        resolve_entities(
            part, "p_name", block_fn=blk, max_dist=2,
            storage=StorageLevel.MEMORY_AND_DISK,
        )
    )
    spark.catalog.clearCache()
    assert base == opt


def test_semantic_dedup_storage_row_identical(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroids_by_cell(emb)
    base = _rows(semantic_dedup_decisions(emb, 0.995, centroids=cents))
    opt = _rows(
        semantic_dedup_decisions(
            emb, 0.995, centroids=cents,
            storage=StorageLevel.MEMORY_AND_DISK,
        )
    )
    spark.catalog.clearCache()
    assert base == opt
