"""End-to-end training-data curation pipeline: the product-level API
that composes the operator surface into the standard pretraining prep
flow. Each stage is one of the individually oracle-checked operators;
this module only wires them together, so the composition inherits their
verified semantics and their 100 TB plan shapes.

Stage order follows the usual cost/selectivity logic — cheap per-row
gates first (quality, repetition: scan-stage expression work), then the
keyed stages (exact dedup: one groupBy; near-dup: LSH-bucketed, never
all-pairs; decontamination: broadcast semi-join, corpus never shuffled),
then mixture shaping and sequence packing on the survivors. Every
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
    # --- stage 1: per-row quality + repetition gates (scan-stage) -----
    # gate_columns attaches both gates inline (shared expression
    # helpers with the oracle-checked operators): one scan, zero
    # shuffles — not a join of the frame-level operators back on id,
    # which would shuffle the full corpus once per gate
    gate = gate_columns(docs, text_col)
    gated = gate.filter(F.col("quality_score") >= cfg.min_quality_score)
    if cfg.drop_repetitive:
        gated = gated.filter(~F.col("flag_repetitive"))
    gated = gated.select(*docs.columns)

    # --- stage 2: PII scrub (replaces the text column, inline) --------
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

    # --- stage 3: exact dedup (keeper = min id per fingerprint) -------
    # windowed keeper election: ONE shuffle on the fingerprint, vs the
    # groupBy-then-join-back formulation that shuffles the corpus twice
    from pyspark.sql import Window as W

    w_fp = W.partitionBy("_fp").orderBy(F.col(id_col).asc())
    exact = (
        gated.withColumn("_fp", content_fingerprint(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w_fp))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )

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
