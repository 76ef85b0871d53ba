"""End-to-end training-data curation pipeline: the product-level API
that composes the operator surface into the standard pretraining prep
flow. Each stage is one of the individually oracle-checked operators;
this module only wires them together, so the composition inherits their
verified semantics and their 100 TB plan shapes.

Stage order follows the usual cost/selectivity logic — cheap per-row
gates first (quality, repetition: scan-stage expression work), then the
keyed stages (exact dedup: one fingerprint-keyed window; near-dup:
LSH-bucketed, never all-pairs; decontamination: broadcast semi-join,
corpus never shuffled), then mixture shaping and sequence packing on
the survivors. Every
decision is a pure function of document content/ids: re-running the
pipeline — or retrying any stage — reproduces byte-identical output.

No reference counterpart (reference delegates analytics to ClickHouse);
this is the BASELINE.json north-star surface composed end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.dedup import (
    contamination_check,
    content_fingerprint,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_table,
)
from clickhouse_mysql_data_reader_spark.operators.graph import (
    component_summary,
    connected_components,
)
from clickhouse_mysql_data_reader_spark.operators.sampling import (
    hash_bucket,
    hex_threshold_expr,
    mixture_sample,
    pack_sequences,
)
from clickhouse_mysql_data_reader_spark.operators.text import (
    gate_columns,
    token_count,
)


@dataclass(frozen=True)
class CurationConfig:
    """Knobs for the end-to-end pipeline; defaults follow the published
    heuristics (Gopher repetition flags, 0.8-Jaccard near-dup merges)."""

    min_quality_score: float = 0.2
    drop_repetitive: bool = True
    redact_pii: bool = True
    near_dup_jaccard: float = 0.8
    contamination_threshold: float = 0.5
    # mixture shaping is optional: None keeps every surviving source whole
    mixture_weights: dict[str, float] | None = None
    mixture_token_budget: int = 0
    mixture_default_weight: float = 0.0
    pack_budget: int = 128
    pack_shards: int = 8
    minhash_k: int = 16
    lsh_bands: int = 4


@dataclass
class CurationResult:
    """Lazy handles on every stage — nothing is executed until the
    caller acts on a frame, so computing only ``packed`` runs one job."""

    quality_gated: DataFrame
    after_exact_dedup: DataFrame
    near_dup_components: DataFrame
    after_near_dedup: DataFrame
    after_decontamination: DataFrame
    after_mixture: DataFrame
    packed: DataFrame
    stage_frames: dict[str, DataFrame] = field(default_factory=dict)

    def stage_counts(self) -> dict[str, int]:
        """Materialize per-stage survivor counts (one job per stage —
        diagnostic use, not the hot path)."""
        return {name: df.count() for name, df in self.stage_frames.items()}


def _row_stages(
    docs: DataFrame, cfg: CurationConfig, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Stages 1-3 (shared by full and incremental curation):

    1. per-row quality + repetition gates — gate_columns attaches both
       inline (shared expression helpers with the oracle-checked
       queries): one scan, zero shuffles, not a join of the frame-level
       operators back on id (which would shuffle the corpus per gate);
    2. PII scrub, inline on the text column;
    3. exact dedup via a fingerprint-keyed window (keeper = min id):
       ONE shuffle, vs groupBy-then-join-back's two.
    """
    gate = gate_columns(docs, text_col)
    gated = gate.filter(F.col("quality_score") >= cfg.min_quality_score)
    if cfg.drop_repetitive:
        gated = gated.filter(~F.col("flag_repetitive"))
    gated = gated.select(*docs.columns)

    if cfg.redact_pii:
        from clickhouse_mysql_data_reader_spark.operators.text import (
            EMAIL_RE,
            PHONE_RE,
        )

        scrubbed = F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        )
        gated = gated.withColumn(text_col, scrubbed)

    from pyspark.sql import Window as W

    w_fp = W.partitionBy("_fp").orderBy(F.col(id_col).asc())
    exact = (
        gated.withColumn("_fp", content_fingerprint(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w_fp))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )
    return gated, exact


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    cfg: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> CurationResult:
    """Run the full curation flow over a corpus of (id, source, text).

    ``benchmark`` (optional) is the held-out eval set to decontaminate
    against: corpus documents whose shingles cover >= threshold of any
    overlap are NOT dropped (contamination drops eval items, not corpus
    docs) — instead the corpus is checked the other direction: any
    corpus doc that is a near-verbatim copy of a benchmark doc is
    removed so eval answers don't leak into training.
    """
    gated, exact = _row_stages(docs, cfg, text_col, id_col)

    # --- stage 4: near-dup merge (LSH -> Jaccard -> components) ------
    sh = shingle_table(exact, text_col, id_col)
    sigs = minhash_signatures(sh, num_hashes=cfg.minhash_k)
    cands = lsh_candidate_pairs(sigs, num_hashes=cfg.minhash_k, bands=cfg.lsh_bands)
    near_pairs = jaccard_pairs(sh, candidates=cands, min_jaccard=cfg.near_dup_jaccard)
    comps = connected_components(near_pairs.select("doc_a", "doc_b"))
    drop_ids = (
        comps.join(component_summary(comps), "component")
        .filter(F.col("doc_id") != F.col("keeper_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    deduped = exact.join(drop_ids, id_col, "left_anti")

    # --- stage 5: decontamination vs the benchmark --------------------
    if benchmark is not None:
        # direction: corpus docs contaminated BY benchmark content leave
        contam = contamination_check(
            corpus=benchmark,
            benchmark=deduped,
            text_col=text_col,
            id_col=id_col,
            flag_threshold=cfg.contamination_threshold,
        )
        leaky = contam.filter(F.col("flag_contaminated")).select(
            F.col("doc_id").alias(id_col)
        )
        clean = deduped.join(leaky, id_col, "left_anti")
    else:
        clean = deduped

    # --- stage 6: mixture shaping (optional) --------------------------
    if cfg.mixture_weights is not None:
        rates = (
            mixture_sample(
                clean,
                token_count(F.col(text_col)),
                id_col,
                source_col,
                cfg.mixture_weights,
                cfg.mixture_token_budget,
                default_weight=cfg.mixture_default_weight,
            )
            .select(F.col("source").alias(source_col), "rate")
        )
        # the exact keep condition mixture_sample's report counts
        mixed = (
            clean.join(F.broadcast(rates), source_col)
            .filter(
                (F.col("rate") >= 1.0)
                | (
                    hash_bucket(F.col(id_col), "mixture")
                    < hex_threshold_expr(F.col("rate"))
                )
            )
            .drop("rate")
        )
    else:
        mixed = clean

    # --- stage 7: sequence packing ------------------------------------
    packed = pack_sequences(
        mixed,
        token_count(F.col(text_col)),
        id_col,
        budget=cfg.pack_budget,
        n_shards=cfg.pack_shards,
    )

    return CurationResult(
        quality_gated=gated,
        after_exact_dedup=exact,
        near_dup_components=comps,
        after_near_dedup=deduped,
        after_decontamination=clean,
        after_mixture=mixed,
        packed=packed,
        stage_frames={
            "input": docs,
            "quality_gated": gated,
            "after_exact_dedup": exact,
            "after_near_dedup": deduped,
            "after_decontamination": clean,
            "after_mixture": mixed,
            "packed": packed,
        },
    )


class CurationState:
    """Landed dedup state of the already-curated corpus — the sidecar
    tables an incremental (daily-batch) pipeline needs to dedup NEW
    documents against everything kept so far WITHOUT recomputing the
    historical corpus:

    - ``fingerprints``: (doc_id, fp) md5 content fingerprints (exact dedup)
    - ``bands``:        (doc_id, band_id, band_hash) LSH buckets (near-dup
      candidate generation)
    - ``shingles``:     (doc_id, sh_h) shingle hashes (Jaccard verify)

    All three are plain parquet — partition/bucket them by their join
    key at real scale. ``append`` adds a new batch's rows; state grows
    with the KEPT corpus only (dropped docs contribute nothing).
    """

    def __init__(self, state_dir: str, minhash_k: int = 16, lsh_bands: int = 4):
        self.state_dir = str(state_dir)
        self.minhash_k = minhash_k
        self.lsh_bands = lsh_bands

    def _path(self, name: str) -> str:
        return f"{self.state_dir}/{name}"

    def exists(self, spark) -> bool:
        """True once a first batch has landed — checked through the
        Hadoop FileSystem API so any Spark-supported store works."""
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(self._path("fingerprints"))
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(path))

    def _derive(self, kept: DataFrame, text_col: str, id_col: str):
        from clickhouse_mysql_data_reader_spark.operators.dedup import band_table

        fp = kept.select(
            F.col(id_col).alias("doc_id"),
            content_fingerprint(F.col(text_col)).alias("fp"),
        )
        sh = shingle_table(kept, text_col, id_col)
        bands = band_table(
            minhash_signatures(sh, num_hashes=self.minhash_k),
            num_hashes=self.minhash_k,
            bands=self.lsh_bands,
        )
        return fp, sh, bands

    def write(self, kept: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              mode: str = "append") -> None:
        fp, sh, bands = self._derive(kept, text_col, id_col)
        fp.write.mode(mode).parquet(self._path("fingerprints"))
        sh.write.mode(mode).parquet(self._path("shingles"))
        bands.write.mode(mode).parquet(self._path("bands"))

    def fingerprints(self, spark) -> DataFrame:
        return spark.read.parquet(self._path("fingerprints"))

    def shingles(self, spark) -> DataFrame:
        return spark.read.parquet(self._path("shingles"))

    def bands(self, spark) -> DataFrame:
        return spark.read.parquet(self._path("bands"))


def curate_increment(
    new_docs: DataFrame,
    state: CurationState,
    cfg: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    update_state: bool = True,
) -> DataFrame:
    """Curate a NEW batch against the landed state of everything kept so
    far — the production shape of the pipeline (daily increments over a
    growing 100 TB corpus; re-curating from scratch each day is not an
    option).

    Within-batch: the same gates + exact dedup + LSH near-dup merge as
    ``curate``. Against history: exact dups leave via an anti-join on
    the fingerprint; near-dups leave via LSH bucket collisions with the
    state's band table, Jaccard-verified against the state's shingles —
    history always wins (the kept corpus is immutable), so cross dups
    drop the NEW doc. The state tables are joined on their keys only —
    the historical corpus text is never re-read, and the per-batch cost
    scales with |batch| + |state rows touched by its join keys|, not
    with |corpus|.

    Returns the kept new documents; with ``update_state`` their derived
    rows are appended to the state first (new ids must not collide with
    state ids — enforce upstream).
    """
    spark = new_docs.sparkSession
    _, exact = _row_stages(new_docs, cfg, text_col, id_col)

    if not state.exists(spark):
        # bootstrap: no history yet — within-batch curation only
        sh0 = shingle_table(exact, text_col, id_col)
        sigs0 = minhash_signatures(sh0, num_hashes=cfg.minhash_k)
        cands0 = lsh_candidate_pairs(
            sigs0, num_hashes=cfg.minhash_k, bands=cfg.lsh_bands
        )
        pairs0 = jaccard_pairs(
            sh0, candidates=cands0, min_jaccard=cfg.near_dup_jaccard
        )
        comps0 = connected_components(pairs0.select("doc_a", "doc_b"))
        drop0 = (
            comps0.join(component_summary(comps0), "component")
            .filter(F.col("doc_id") != F.col("keeper_id"))
            .select(F.col("doc_id").alias(id_col))
        )
        kept = exact.join(drop0, id_col, "left_anti")
        if update_state:
            state.write(kept, text_col=text_col, id_col=id_col, mode="append")
        return kept

    # --- exact dedup vs history (anti-join on fingerprint) ------------
    with_fp = exact.withColumn("_fp", content_fingerprint(F.col(text_col)))
    vs_hist = with_fp.join(
        state.fingerprints(spark).select(F.col("fp").alias("_fp")),
        "_fp",
        "left_anti",
    ).drop("_fp")

    # --- near-dup within batch AND vs history -------------------------
    from clickhouse_mysql_data_reader_spark.operators.dedup import band_table

    sh_new = shingle_table(vs_hist, text_col, id_col)
    sigs_new = minhash_signatures(sh_new, num_hashes=cfg.minhash_k)
    bands_new = band_table(sigs_new, num_hashes=cfg.minhash_k, bands=cfg.lsh_bands)

    # within batch: standard LSH self-join -> Jaccard -> components
    cands_in = lsh_candidate_pairs(sigs_new, num_hashes=cfg.minhash_k, bands=cfg.lsh_bands)
    pairs_in = jaccard_pairs(sh_new, candidates=cands_in, min_jaccard=cfg.near_dup_jaccard)
    comps = connected_components(pairs_in.select("doc_a", "doc_b"))
    drop_in = (
        comps.join(component_summary(comps), "component")
        .filter(F.col("doc_id") != F.col("keeper_id"))
        .select(F.col("doc_id").alias(id_col))
    )

    # vs history: bucket-join new bands against state bands (keyed on
    # (band_id, band_hash) — only colliding buckets move), then verify
    # with Jaccard over new + state shingles of the candidate docs only
    cands_hist = (
        bands_new.alias("n")
        .join(
            state.bands(spark).alias("h"),
            (F.col("n.band_id") == F.col("h.band_id"))
            & (F.col("n.band_hash") == F.col("h.band_hash")),
        )
        .select(F.col("n.doc_id").alias("doc_a"), F.col("h.doc_id").alias("doc_b"))
        .distinct()
    )
    sh_hist = state.shingles(spark).join(
        cands_hist.select(F.col("doc_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_semi",
    )
    pairs_hist = jaccard_pairs(
        sh_new.unionByName(sh_hist),
        candidates=cands_hist,
        min_jaccard=cfg.near_dup_jaccard,
    )
    drop_hist = pairs_hist.select(F.col("doc_a").alias(id_col)).distinct()

    kept = (
        vs_hist.join(drop_in, id_col, "left_anti")
        .join(drop_hist, id_col, "left_anti")
    )
    if update_state:
        state.write(kept, text_col=text_col, id_col=id_col, mode="append")
    return kept


def curate_stream(
    stream_docs: DataFrame,
    state: CurationState,
    out_dir: str,
    cfg: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Continuous curation: each micro-batch of a streaming document
    source is curated incrementally against the landed state (gates,
    exact + near dedup within the batch AND vs everything kept so far),
    the survivors land under ``out_dir/epoch=<id>``, and the state grows
    by exactly the kept docs — the streaming twin of daily-batch
    ``curate_increment``, built on foreachBatch like the CDC pump
    (streaming/pump.py).

    Failure semantics: survivors are written per-epoch with overwrite
    (a replayed epoch overwrites its own output — idempotent), and
    duplicate state rows from a replayed append are harmless by
    construction (the state is only ever consumed through anti-/semi-
    joins on its keys, which are multiplicity-insensitive).

    Returns the DataStreamWriter — caller picks trigger, checkpoint
    location, and calls start().
    """

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        kept = curate_increment(
            batch_df,
            state,
            cfg=cfg,
            text_col=text_col,
            id_col=id_col,
            update_state=True,
        )
        kept.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return stream_docs.writeStream.foreachBatch(_apply)
