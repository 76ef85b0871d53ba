"""Round-15 optimization pins.

- ``ivfpq_topk`` now computes probe assignments and residual ADC LUTs
  on the DRIVER (bounded broadcast metadata) instead of through a
  Catalyst literal expression tree; the Python arithmetic replicates
  the JVM fold order (strict left-to-right (x-y)^2 accumulation), so
  results must be bit-identical to the former expression path — pinned
  here against an inline replica of the old plan.
- ``curate_increment``'s per-batch materializations now run through
  ``util.overlap_jobs`` (concurrent driver threads); the kept set must
  be identical under serial and overlapped execution.
- ``overlap_jobs`` itself: single-job shortcut, result mapping, and
  exception propagation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.util import overlap_jobs


def test_overlap_jobs_results_and_errors():
    assert overlap_jobs({}) == {}
    assert overlap_jobs({"a": lambda: 1}) == {"a": 1}
    assert overlap_jobs({"a": lambda: 1, "b": lambda: "x"}) == {"a": 1, "b": "x"}

    def _boom():
        raise RuntimeError("probe failed")

    with pytest.raises(RuntimeError, match="probe failed"):
        overlap_jobs({"ok": lambda: 1, "bad": _boom})


def _old_expression_ivfpq_topk(
    corpus_codes, coarse_centroids, codebooks, queries, dim,
    n_subspaces=4, n_probe=2, k=3,
):
    """The pre-round-15 plan: probe assignment as a Spark window over
    the broadcast centroid cross-join, LUT as a Catalyst literal
    expression — kept here as the equivalence reference."""
    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        _adc_fold,
        _adc_lut,
        _collect_codebooks,
        _subspace_bounds,
        as_double_array,
        assign_cells_probes,
    )

    cbs = _collect_codebooks(codebooks)
    bounds = _subspace_bounds(dim, n_subspaces)
    probes = assign_cells_probes(
        queries, coarse_centroids, n_probe, id_col="qid", vec_col="embedding"
    ).select(F.col("vec_id").alias("qid"), "cell")
    cent = coarse_centroids.select("cell", as_double_array("centroid").alias("_cent"))
    qv = queries.select(F.col("qid").alias("qid"), as_double_array("embedding").alias("_qv"))
    q_res = F.zip_with(F.col("_qv"), F.col("_cent"), lambda x, y: x - y)
    probe_lut = F.broadcast(
        probes.join(qv, "qid")
        .join(cent, "cell")
        .select("qid", "cell", _adc_lut(q_res, cbs, bounds).alias("_lut"))
    )
    scored = corpus_codes.join(probe_lut, "cell").select(
        "qid",
        "vec_id",
        F.round(_adc_fold(F.col("_lut"), F.col("codes")), 6).alias("adc_dist"),
    )
    w = W.partitionBy("qid").orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def test_ivfpq_driver_lut_matches_expression_path(spark):
    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_topk,
    )

    corpus = spark.createDataFrame(
        [
            (i, [float((i * 7) % 13), float((i * 3) % 11),
                 float((i * 5) % 9), float(i % 4)])
            for i in range(80)
        ],
        "vec_id long, embedding array<double>",
    )
    cents, cbs, codes = ivfpq_index(corpus, dim=4, n_cells=3, n_subspaces=2, k_codes=4)
    queries = spark.createDataFrame(
        [(0, [0.3, 1.7, 2.2, 1.1]), (1, [6.0, 5.5, 0.4, 2.9])],
        "qid long, embedding array<double>",
    )
    new = ivfpq_topk(codes, cents, cbs, queries, dim=4, n_subspaces=2, n_probe=2, k=3)
    old = _old_expression_ivfpq_topk(
        codes, cents, cbs, queries, dim=4, n_subspaces=2, n_probe=2, k=3
    )
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))


@pytest.mark.slow
def test_increment_kept_set_identical_serial_vs_overlapped(spark, sf_dir, tmp_path):
    import clickhouse_mysql_data_reader_spark.curation as cur
    from clickhouse_mysql_data_reader_spark.curation import (
        CurationConfig,
        CurationState,
        curate_increment,
    )
    from clickhouse_mysql_data_reader_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    geo = dict(embed_dim=dim, embed_bits=16, embed_srp_bands=2)
    cfg = CurationConfig(embed_near_cos=0.99, **geo)
    state = CurationState(str(tmp_path / "state"), **geo)
    docs = load_table(spark, sf_dir, "documents")
    n_vecs = emb.count()
    docs_vec = docs.join(
        F.broadcast(emb.select(F.col("vec_id").alias("_vid"), "embedding")),
        F.pmod(F.col("doc_id"), F.lit(n_vecs)) == F.col("_vid"),
    ).drop("_vid")
    curate_increment(
        docs_vec.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0), state, cfg
    )
    batch2 = docs_vec.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)

    par = cur.overlap_jobs
    try:
        kept_par = sorted(
            r["doc_id"]
            for r in curate_increment(
                batch2, state, cfg, update_state=False
            ).collect()
        )
        cur.overlap_jobs = lambda jobs, max_workers=4: {
            k: fn() for k, fn in jobs.items()
        }
        kept_ser = sorted(
            r["doc_id"]
            for r in curate_increment(
                batch2, state, cfg, update_state=False
            ).collect()
        )
    finally:
        cur.overlap_jobs = par
    assert kept_par == kept_ser and kept_par
