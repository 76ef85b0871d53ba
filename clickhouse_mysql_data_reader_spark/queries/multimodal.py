"""Multimodal column queries: binary media columns processed through
the Arrow-batched ``mapInPandas`` plumbing (operators/multimodal.py).

The decode step is a deterministic stand-in (no media libs in this
container), which makes the ENTIRE distributed path oracle-checkable:
the fake features derive from md5/sha256 of the bytes, which DuckDB
can recompute — so schema, batching, UDF signature, and row routing
are all verified, not just smoke-tested.

Features are quantized back to their source byte (``round(x*255)``)
for the compare: float32 storage noise (~6e-8) is far below the 1/255
quantum, so the recovered integers are exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.multimodal import (
    audio_window_plan,
    documents_as_media,
    extract_features,
    frame_sample_plan,
    image_near_dup_pairs,
    resize_plan,
)
from clickhouse_mysql_data_reader_spark.queries.registry import register
from clickhouse_mysql_data_reader_spark.sources.parquet import load_table


@register(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           sha256(text) AS content_sha,
           octet_length(encode(text)) AS n_bytes,
           array_to_string(list_transform([1, 2, 3, 4, 5, 6, 7, 8],
                           i -> ('0x' || substr(md5(text), 2*i - 1, 2))::INT
           ), ',') AS feature_q
    FROM documents
    """,
    doc="Feature extraction over binary media columns via mapInPandas "
    "(Arrow batches; decode_fn injectable, stubbed deterministically). "
    "The binary column never crosses a shuffle — features are computed "
    "in the scan stage and the wide bytes dropped immediately after.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "content_sha",
        "n_bytes",
        # joined to a flat string: array columns reach pandas as numpy
        # arrays on one side and lists on the other — a delimiter-joined
        # VARCHAR is representation-stable in the driver's value hash
        F.array_join(
            F.transform("feature", lambda x: F.round(x * 255).cast("int")), ","
        ).alias("feature_q"),
    )


@register(
    "dedup_image_phash",
    """
    WITH img AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 0
    ),
    px AS (
      SELECT media_id, k,
             ('0x' || substr(md5(substr(text, CAST(k//16*64 + 1 AS INT), 64)
                                 || ':' || CAST(k//16 AS VARCHAR)),
                             CAST(2*(k%16)+1 AS INT), 2))::BIGINT AS p
      FROM img, UNNEST(range(56)) AS t(k)
    ),
    bits AS (
      SELECT a.media_id,
             CAST((a.k // 7) * 6 + (a.k % 7) AS INT) AS bit_i,
             CASE WHEN a.p < b.p THEN 1 ELSE 0 END AS bit
      FROM px a JOIN px b ON a.media_id = b.media_id AND b.k = a.k + 1
      WHERE a.k % 7 < 6
    ),
    fp AS (
      SELECT media_id, CAST(sum(bit * (1::BIGINT << bit_i)) AS BIGINT) AS dhash
      FROM bits GROUP BY media_id
    )
    SELECT a.media_id AS doc_a, b.media_id AS doc_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
    """,
    doc="Image perceptual-hash near-duplicate pairs (operators/"
    "multimodal.py image_dhash + image_near_dup_pairs): decode each "
    "image to a tiny 7x8 grayscale thumbnail (the INJECTABLE seam — "
    "Pillow in production; here the deterministic md5-BLOCKED fake "
    "whose pixels depend only on local content slices, so local edits "
    "perturb local pixels like a real thumbnail), pack the 48 "
    "darker-than-right-neighbor dHash bits into one BIGINT, and pair "
    "via the Manku pigeonhole banding the text side already uses "
    "(dedup.simhash_near_pairs: 8 chunks of 6 bits for Hamming<=7 — "
    "an equi-join on narrow (chunk_i, chunk_val) keys, NEVER "
    "all-pairs; the oracle brute-forces the same pairs). The image "
    "analogue of simhash: survives re-encode/resize/metadata-strip "
    "transforms that break byte-exact dedup. The media bytes are "
    "touched once at the scan (mapInPandas dHash); everything "
    "downstream is (id, chunk, fingerprint) longs.",
)
def dedup_image_phash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        image_dhash,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    # caller-owned fingerprint persist (released by bench.py
    # clearCache): the banding self-join consumes the frame on both
    # sides and Spark plans a lazy Python decode subtree per side —
    # the sigs= seam makes the decode run once (operator docstring)
    sigs = image_dhash(media).persist(StorageLevel.MEMORY_AND_DISK)
    return image_near_dup_pairs(media, hamming_max=7, sigs=sigs).withColumn(
        "hamming", F.col("hamming").cast("long")
    )


@register(
    "dedup_image_cluster_keep",
    """
    WITH RECURSIVE img AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 0
    ),
    px AS (
      SELECT media_id, k,
             ('0x' || substr(md5(substr(text, CAST(k//16*64 + 1 AS INT), 64)
                                 || ':' || CAST(k//16 AS VARCHAR)),
                             CAST(2*(k%16)+1 AS INT), 2))::BIGINT AS p
      FROM img, UNNEST(range(56)) AS t(k)
    ),
    bits AS (
      SELECT a.media_id,
             CAST((a.k // 7) * 6 + (a.k % 7) AS INT) AS bit_i,
             CASE WHEN a.p < b.p THEN 1 ELSE 0 END AS bit
      FROM px a JOIN px b ON a.media_id = b.media_id AND b.k = a.k + 1
      WHERE a.k % 7 < 6
    ),
    fp AS (
      SELECT media_id, CAST(sum(bit * (1::BIGINT << bit_i)) AS BIGINT) AS dhash
      FROM bits GROUP BY media_id
    ),
    prs AS (
      SELECT a.media_id AS doc_a, b.media_id AS doc_b
      FROM fp a JOIN fp b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
    ),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM prs
              UNION SELECT doc_b, doc_a FROM prs),
    reach(u, lbl) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
      UNION SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v
    ),
    comp AS (SELECT u AS media_id, min(lbl) AS component FROM reach GROUP BY u),
    attrs AS (
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents WHERE doc_id % 3 = 0
    ),
    scored AS (
      SELECT c.media_id, c.component, a.n_bytes
      FROM comp c JOIN attrs a USING (media_id)
    ),
    best AS (SELECT component, max(n_bytes) AS mx FROM scored GROUP BY component),
    keeper AS (
      SELECT s.component, min(s.media_id) AS keeper_id
      FROM scored s JOIN best b
        ON s.component = b.component AND s.n_bytes = b.mx
      GROUP BY s.component
    )
    SELECT s.media_id, s.component, k.keeper_id,
           s.media_id = k.keeper_id AS is_keeper
    FROM scored s JOIN keeper k ON s.component = k.component
    """,
    doc="Image near-dup clusters turned into an APPLICABLE drop set — "
    "the dedup_cluster_best_keeper pattern on the image modality: "
    "dHash pigeonhole pairs (dedup_image_phash's machinery) -> "
    "connected components (transitive: a re-encode chain merges even "
    "when the endpoints' Hamming distance exceeds the gate) -> "
    "quality-aware keeper election per cluster, keeping the LARGEST "
    "original (n_bytes — the keep-the-highest-resolution-copy rule; "
    "a real deployment scores width*height from the metadata struct) "
    "with min-id ties. Spark side composes image_near_dup_pairs + "
    "connected_components + component_keepers (map-side max(struct), "
    "no window — a giant boilerplate-image cluster still partial-"
    "aggregates); the oracle replays the closure as a recursive CTE "
    "(the match_entity_resolve idiom). Output rows cover the "
    "CLUSTERED images; drop = rows with is_keeper false.",
)
def dedup_image_cluster_keep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.graph import (
        component_keepers,
        connected_components,
    )

    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        image_dhash,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    # decode-once fingerprint persist through the sigs= seam (see
    # dedup_image_phash); caller-owned, released by bench.py clearCache
    sigs = image_dhash(media).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = image_near_dup_pairs(media, hamming_max=7, sigs=sigs)
    comps = connected_components(pairs).select(
        F.col("doc_id").alias("media_id"), "component"
    )
    attrs = media.filter(F.col("kind") == "image").select(
        "media_id",
        F.coalesce(F.length("content"), F.lit(0)).cast("long").alias("n_bytes"),
    )
    return component_keepers(comps, attrs, "n_bytes", id_col="media_id")


@register(
    "dedup_audio_fp",
    """
    WITH aud AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1
    ),
    e AS (
      SELECT media_id, k,
             ('0x' || substr(md5(substr(text, CAST(k//16*64 + 1 AS INT), 64)
                                 || ':' || CAST(k//16 AS VARCHAR)),
                             CAST(2*(k%16)+1 AS INT), 2))::BIGINT AS v
      FROM aud, UNNEST(range(49)) AS t(k)
    ),
    bits AS (
      SELECT a.media_id, a.k AS bit_i,
             CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
      FROM e a JOIN e b ON a.media_id = b.media_id AND b.k = a.k + 1
    ),
    fp AS (
      SELECT media_id, CAST(sum(bit * (1::BIGINT << bit_i)) AS BIGINT) AS ahash
      FROM bits GROUP BY media_id
    )
    SELECT a.media_id AS doc_a, b.media_id AS doc_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.ahash, b.ahash)) <= 7
    """,
    doc="Audio energy-contour near-duplicate pairs (operators/"
    "multimodal.py audio_energy_hash + audio_near_dup_pairs): decode "
    "each clip to 49 per-window energies (the INJECTABLE seam — "
    "windowed RMS over torchaudio in production; here the "
    "deterministic md5-BLOCKED fake whose windows depend only on "
    "local content slices, so local edits perturb local windows like "
    "a real contour), pack the 48 quieter-than-next difference bits "
    "into one BIGINT, and pair via the same Manku pigeonhole banding "
    "as text simhash and image dHash (8 chunks of 6 bits for "
    "Hamming<=7 — an equi-join on narrow (chunk_i, chunk_val) keys, "
    "NEVER all-pairs; the oracle brute-forces the same pairs). "
    "Closes the modality matrix: text (simhash/minhash/exactsubstr), "
    "image (dHash), and now audio each have a banded near-dup member. "
    "The media bytes are touched once at the scan (mapInPandas); "
    "everything downstream is (id, chunk, fingerprint) longs.",
)
def dedup_audio_fp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        audio_energy_hash,
        audio_near_dup_pairs,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    # decode-once fingerprint persist through the sigs= seam (the
    # image discipline); caller-owned, released by bench.py clearCache
    sigs = audio_energy_hash(media).persist(StorageLevel.MEMORY_AND_DISK)
    return audio_near_dup_pairs(media, hamming_max=7, sigs=sigs).withColumn(
        "hamming", F.col("hamming").cast("long")
    )


@register(
    "dedup_video_frames",
    """
    WITH vid AS (
      SELECT doc_id AS media_id, text,
             CAST((n_chars * 10 - 1) // 1000 AS INT) + 1 AS n_frames
      FROM documents WHERE doc_id % 3 = 2 AND n_chars * 10 > 0
    ),
    px AS (
      SELECT media_id, j, k,
             ('0x' || substr(md5(substr(text, CAST(j*64 + 1 AS INT), 64)
                                 || ':' || CAST(j AS VARCHAR)
                                 || ':' || CAST(k//16 AS VARCHAR)),
                             CAST(2*(k%16)+1 AS INT), 2))::BIGINT AS p
      FROM vid, UNNEST(range(n_frames)) AS f(j), UNNEST(range(56)) AS t(k)
    ),
    bits AS (
      SELECT a.media_id, a.j,
             CAST((a.k // 7) * 6 + (a.k % 7) AS INT) AS bit_i,
             CASE WHEN a.p < b.p THEN 1 ELSE 0 END AS bit
      FROM px a JOIN px b
        ON a.media_id = b.media_id AND a.j = b.j AND b.k = a.k + 1
      WHERE a.k % 7 < 6
    ),
    fh AS (
      SELECT media_id, j,
             CAST(sum(bit * (1::BIGINT << bit_i)) AS BIGINT) AS fhash
      FROM bits GROUP BY media_id, j
    ),
    fset AS (SELECT DISTINCT media_id, fhash FROM fh),
    counts AS (
      SELECT media_id, CAST(count(*) AS BIGINT) AS nf
      FROM fset GROUP BY media_id
    ),
    m AS (
      SELECT a.media_id AS doc_a, b.media_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_matching
      FROM fset a JOIN fset b
        ON a.fhash = b.fhash AND a.media_id < b.media_id
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT m.doc_a, m.doc_b, m.n_matching,
           ca.nf AS n_frames_a, cb.nf AS n_frames_b
    FROM m JOIN counts ca ON m.doc_a = ca.media_id
           JOIN counts cb ON m.doc_b = cb.media_id
    """,
    doc="Video near-duplicate pairs by sampled-frame matching "
    "(operators/multimodal.py video_frame_hashes + "
    "video_near_dup_pairs): one frame per second of clip duration, "
    "each reduced to the image side's 48-bit dHash through the "
    "INJECTABLE frame-decoder seam (pyav in production; here the "
    "md5-BLOCKED fake where frame i depends only on the i-th content "
    "slice, so shared content means shared frames — the re-encoded-"
    "clip miniature), then clips pair when >= 2 distinct frame hashes "
    "agree EXACTLY. Candidates are an equi-join on the frame hash — "
    "never all-pairs, no banding needed (robustness comes from "
    "needing only a few of many frames); ubiquitous frames (black/"
    "logo stop-frames) are droppable via max_frame_df before the "
    "join. One mapInPandas call per CLIP (bytes cross Arrow once; "
    "exploding timestamps first would copy the clip per frame). "
    "Completes the modality matrix: text, image, audio, and video "
    "near-dup members all banded/bucketed, never quadratic.",
)
def dedup_video_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        video_near_dup_pairs,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    # deliberately NO sigs= persist here, unlike the image/audio twins:
    # measured r14 A/B (interleaved, min-of-3) read 0.79s lazy vs
    # 1.18s persisting sigs and 2.28s persisting the distinct frame
    # set — the per-frame row count makes the cache round-trip cost
    # more than re-running the cheap fake decode per consumer. A real
    # decoder deployment lands the fingerprints instead (the
    # CurationState image/audio/video_fps discipline), which the
    # operator docstring already prescribes.
    return video_near_dup_pairs(media, min_matching_frames=2)


@register(
    "multimodal_frame_plan",
    """
    SELECT doc_id AS media_id, i AS frame_ts_ms
    FROM documents,
         UNNEST(range(0, greatest(n_chars * 10 - 1, 0) + 1, 1000)) AS t(i)
    WHERE doc_id % 3 = 2
    """,
    doc="Video frame-sampling plan: one row per frame timestamp via "
    "sequence+explode (JVM-side row explosion; the binary payload is "
    "referenced, not copied per frame, until the decode UDF runs).",
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return frame_sample_plan(media, every_ms=1000).select("media_id", "frame_ts_ms")


@register(
    "multimodal_resize_plan",
    """
    WITH img AS (
      SELECT doc_id AS media_id,
             CAST(32 + doc_id % 97 AS BIGINT) AS width,
             CAST(32 + doc_id % 53 AS BIGINT) AS height
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT media_id, width, height,
           greatest(CASE WHEN width <= 96 AND height <= 72 THEN width
                WHEN width * 72 >= height * 96 THEN 96
                ELSE width * 72 // height END, 1) AS target_w,
           greatest(CASE WHEN width <= 96 AND height <= 72 THEN height
                WHEN width * 72 >= height * 96 THEN height * 96 // width
                ELSE 72 END, 1) AS target_h,
           NOT (width <= 96 AND height <= 72) AS needs_resize
    FROM img
    """,
    doc="Aspect-preserving resize plan into a 96x72 box, computed "
    "ENTIRELY from metadata with cross-multiplied integers and floor "
    "division (no float ratio, so the plan is engine-exact and the "
    "oracle checks the actual geometry). The pixel work is the "
    "injectable seam, like the decode stub; at scale the audit reads "
    "ONLY the meta columns — column pruning keeps the media bytes out "
    "of the scan.",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return resize_plan(media, max_w=96, max_h=72)


@register(
    "multimodal_audio_windows",
    """
    SELECT doc_id AS media_id,
           i AS start_ms,
           least(i + 2000, n_chars * 10) AS end_ms
    FROM documents,
         UNNEST(range(0, greatest(n_chars * 10 - 1, 0) + 1, 1000)) AS t(i)
    WHERE doc_id % 3 = 1 AND n_chars * 10 > 0
    """,
    doc="Audio windowing plan: sliding (start, end) analysis windows "
    "per clip via sequence+explode — frame_sample_plan's shape for the "
    "audio modality, with overlapping windows (2s window, 1s hop) and "
    "the final window clamped to the clip duration. JVM-side row "
    "explosion; the binary payload is carried by reference until the "
    "injectable feature UDF.",
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return audio_window_plan(media, win_ms=2000, hop_ms=1000).select(
        "media_id", "start_ms", "end_ms"
    )


@register(
    "monitor_dup_rate_image",
    """
    WITH img AS (
      SELECT doc_id AS media_id, source, text
      FROM documents WHERE doc_id % 3 = 0
    ),
    px AS (
      SELECT media_id, k,
             ('0x' || substr(md5(substr(text, CAST(k//16*64 + 1 AS INT), 64)
                                 || ':' || CAST(k//16 AS VARCHAR)),
                             CAST(2*(k%16)+1 AS INT), 2))::BIGINT AS p
      FROM img, UNNEST(range(56)) AS t(k)
    ),
    bits AS (
      SELECT a.media_id,
             CAST((a.k // 7) * 6 + (a.k % 7) AS INT) AS bit_i,
             CASE WHEN a.p < b.p THEN 1 ELSE 0 END AS bit
      FROM px a JOIN px b ON a.media_id = b.media_id AND b.k = a.k + 1
      WHERE a.k % 7 < 6
    ),
    fp AS (
      SELECT media_id, CAST(sum(bit * (1::BIGINT << bit_i)) AS BIGINT) AS dhash
      FROM bits GROUP BY media_id
    )
    SELECT i.source,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(count(DISTINCT f.dhash) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT f.dhash) AS BIGINT) AS n_dup_docs,
           round(1.0 - count(DISTINCT f.dhash) / count(*), 6) AS dup_rate
    FROM fp f JOIN img i ON f.media_id = i.media_id
    GROUP BY i.source
    """,
    doc="Per-source IMAGE duplication rate on the dHash perceptual "
    "fingerprint — monitor_dup_rate_by_source's shape on the image "
    "modality: what an ops loop reads BEFORE paying for an image "
    "dedup pass (a source whose perceptual-dup rate jumps is "
    "re-hosting the same thumbnails). Per source: image count, "
    "distinct 48-bit dHash longs, duplicated-image count and rate. "
    "Scale shape: the media bytes are touched once at the scan "
    "(mapInPandas dHash — in an incremental pipeline the landed "
    "image_fps state table replaces even that, see "
    "curation.media_dup_rate_report); downstream is one id-equi join "
    "for the source label plus a map-side-combinable count-distinct "
    "over 8-byte longs per source. No window, no pair join.",
)
def monitor_dup_rate_image_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        image_dhash,
    )

    docs = load_table(spark, sf_dir, "documents")
    dh = image_dhash(documents_as_media(docs))
    return (
        dh.join(
            docs.select(F.col("doc_id").alias("media_id"), "source"),
            "media_id",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.countDistinct("dhash").cast("long").alias("n_distinct"),
        )
        .select(
            "source",
            "n_media",
            "n_distinct",
            (F.col("n_media") - F.col("n_distinct")).alias("n_dup_docs"),
            F.round(1.0 - F.col("n_distinct") / F.col("n_media"), 6).alias(
                "dup_rate"
            ),
        )
    )


@register(
    "monitor_dup_rate_audio",
    """
    WITH aud AS (
      SELECT doc_id AS media_id, source, text
      FROM documents WHERE doc_id % 3 = 1
    ),
    e AS (
      SELECT media_id, k,
             ('0x' || substr(md5(substr(text, CAST(k//16*64 + 1 AS INT), 64)
                                 || ':' || CAST(k//16 AS VARCHAR)),
                             CAST(2*(k%16)+1 AS INT), 2))::BIGINT AS v
      FROM aud, UNNEST(range(49)) AS t(k)
    ),
    bits AS (
      SELECT a.media_id, a.k AS bit_i,
             CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
      FROM e a JOIN e b ON a.media_id = b.media_id AND b.k = a.k + 1
    ),
    fp AS (
      SELECT media_id, CAST(sum(bit * (1::BIGINT << bit_i)) AS BIGINT) AS ahash
      FROM bits GROUP BY media_id
    )
    SELECT u.source,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(count(DISTINCT f.ahash) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT f.ahash) AS BIGINT) AS n_dup_docs,
           round(1.0 - count(DISTINCT f.ahash) / count(*), 6) AS dup_rate
    FROM fp f JOIN aud u ON f.media_id = u.media_id
    GROUP BY u.source
    """,
    doc="Per-source AUDIO duplication rate on the energy-contour "
    "fingerprint — the image monitor's mirror on the audio modality "
    "(a source whose contour-dup rate jumps is mirroring another "
    "feed's clips). Same scale shape: one mapInPandas fingerprint "
    "pass (or the landed audio_fps table in an incremental pipeline), "
    "one id-equi join for the source label, one count-distinct over "
    "longs per source.",
)
def monitor_dup_rate_audio_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        audio_energy_hash,
    )

    docs = load_table(spark, sf_dir, "documents")
    ah = audio_energy_hash(documents_as_media(docs))
    return (
        ah.join(
            docs.select(F.col("doc_id").alias("media_id"), "source"),
            "media_id",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.countDistinct("ahash").cast("long").alias("n_distinct"),
        )
        .select(
            "source",
            "n_media",
            "n_distinct",
            (F.col("n_media") - F.col("n_distinct")).alias("n_dup_docs"),
            F.round(1.0 - F.col("n_distinct") / F.col("n_media"), 6).alias(
                "dup_rate"
            ),
        )
    )


@register(
    "monitor_dup_rate_video",
    """
    WITH vid AS (
      SELECT doc_id AS media_id, source, text,
             CAST((n_chars * 10 - 1) // 1000 AS INT) + 1 AS n_frames
      FROM documents WHERE doc_id % 3 = 2 AND n_chars * 10 > 0
    ),
    px AS (
      SELECT media_id, j, k,
             ('0x' || substr(md5(substr(text, CAST(j*64 + 1 AS INT), 64)
                                 || ':' || CAST(j AS VARCHAR)
                                 || ':' || CAST(k//16 AS VARCHAR)),
                             CAST(2*(k%16)+1 AS INT), 2))::BIGINT AS p
      FROM vid, UNNEST(range(n_frames)) AS f(j), UNNEST(range(56)) AS t(k)
    ),
    bits AS (
      SELECT a.media_id, a.j,
             CAST((a.k // 7) * 6 + (a.k % 7) AS INT) AS bit_i,
             CASE WHEN a.p < b.p THEN 1 ELSE 0 END AS bit
      FROM px a JOIN px b
        ON a.media_id = b.media_id AND a.j = b.j AND b.k = a.k + 1
      WHERE a.k % 7 < 6
    ),
    fh AS (
      SELECT media_id, j,
             CAST(sum(bit * (1::BIGINT << bit_i)) AS BIGINT) AS fhash
      FROM bits GROUP BY media_id, j
    ),
    fset AS (SELECT DISTINCT media_id, fhash FROM fh),
    clipfp AS (
      SELECT media_id,
             md5(string_agg(CAST(fhash AS VARCHAR), ',' ORDER BY fhash)) AS vfp
      FROM fset GROUP BY media_id
    )
    SELECT v.source,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(count(DISTINCT c.vfp) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT c.vfp) AS BIGINT) AS n_dup_docs,
           round(1.0 - count(DISTINCT c.vfp) / count(*), 6) AS dup_rate
    FROM clipfp c JOIN vid v ON c.media_id = v.media_id
    GROUP BY v.source
    """,
    doc="Per-source VIDEO duplication rate on the frame-SET "
    "fingerprint — the set-valued variant the video modality needs: a "
    "clip's identity is the md5 of its numerically-sorted distinct "
    "sampled-frame dHashes (two clips whose every sampled frame "
    "matches are byte-transcode duplicates). Per source: clip count, "
    "distinct frame-set identities, duplicated-clip count and rate. "
    "Scale shape: one mapInPandas pass per clip (bytes cross Arrow "
    "once; the landed video_fps table replaces it incrementally), a "
    "bounded per-clip sort+concat (frames per clip, not corpus-"
    "sized), one id-equi join for the source label, one count-"
    "distinct per source. Exact-duplicate detection only — NEAR-dup "
    "clips (subset frame overlap) are dedup_video_frames' pair join.",
)
def monitor_dup_rate_video_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        video_frame_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    fset = (
        video_frame_hashes(documents_as_media(docs))
        .select("media_id", "fhash")
        .distinct()
    )
    clipfp = fset.groupBy("media_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("fhash")),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("vfp")
    )
    return (
        clipfp.join(
            docs.select(F.col("doc_id").alias("media_id"), "source"),
            "media_id",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.countDistinct("vfp").cast("long").alias("n_distinct"),
        )
        .select(
            "source",
            "n_media",
            "n_distinct",
            (F.col("n_media") - F.col("n_distinct")).alias("n_dup_docs"),
            F.round(1.0 - F.col("n_distinct") / F.col("n_media"), 6).alias(
                "dup_rate"
            ),
        )
    )
