"""Round-13 hardening: regression tests for the round-12 advice items
(NULL-count bucketing, RRF rank-contract enforcement, the entity-
resolution dictionary seam, fk_orphan_report's lost-grouping warning,
image_dhash geometry checking) plus the new round-13 operators."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.multimodal import (
    documents_as_media,
    image_dhash,
)
from clickhouse_mysql_data_reader_spark.operators.sampling import (
    length_bucket_stats,
)
from clickhouse_mysql_data_reader_spark.operators.similarity import rrf_fuse

SCALE = 10**12


# --- advice item: NULL token counts land in bucket 0 -----------------


def test_length_buckets_null_counts_land_in_bucket_zero(spark):
    """A NULL token count is a degenerate doc like n <= 0: it must show
    up in bucket 0 (NOT bucket 1 via greatest(NULL, 1) = 1), with NULL
    excluded from the token sums Spark-side like any null aggregate."""
    df = spark.createDataFrame(
        [(1, None), (2, 0), (3, 1), (4, 5)], "doc_id long, n long"
    )
    rows = {
        r["bucket"]: r
        for r in length_bucket_stats(df, F.col("n")).collect()
    }
    assert set(rows) == {0, 1, 3}
    b0 = rows[0]
    assert b0["n_docs"] == 2  # the NULL doc AND the 0 doc
    assert b0["total_tokens"] == 0  # sum skips NULL, counts the 0
    assert b0["min_tokens"] == 0 and b0["max_tokens"] == 0
    assert rows[1]["n_docs"] == 1 and rows[3]["n_docs"] == 1


# --- advice item: rrf_fuse enforces the rank >= 1 contract ------------


def test_rrf_rank_zero_rows_are_excluded_even_at_k_zero(spark):
    """rank-0 rows are out-of-contract; at k=0 they would hit
    div(scale, 0) — NULL on Spark (silently dropped from the sum) but
    an ERROR on DuckDB. The in-plan filter excludes them consistently."""
    r = spark.createDataFrame([(1, 0), (2, 1)], "doc_id long, rank int")
    got = {x["doc_id"]: x for x in rrf_fuse([r], k=0, top_k=10).collect()}
    assert set(got) == {2}  # the rank-0 doc contributes nothing
    assert got[2]["score_u"] == SCALE // 1


def test_rrf_duplicate_ids_within_one_frame_collapse_to_best_rank(spark):
    """A sloppy retriever emitting the same id twice must neither
    double-contribute nor inflate n_rankers: the per-frame min-rank
    collapse keeps exactly one contribution at the best rank."""
    r = spark.createDataFrame(
        [(1, 3), (1, 7), (2, 1)], "doc_id long, rank int"
    )
    got = {x["doc_id"]: x for x in rrf_fuse([r], k=60, top_k=10).collect()}
    assert got[1]["score_u"] == SCALE // 63  # min rank only
    assert got[1]["n_rankers"] == 1
    assert got[2]["n_rankers"] == 1


# --- advice item: resolve_entities builds the dictionary once ---------


def test_fuzzy_match_pairs_dictionary_seam_matches_inline(spark):
    from clickhouse_mysql_data_reader_spark.operators.linkage import (
        _dictionary,
        fuzzy_match_pairs,
    )

    df = spark.createDataFrame(
        [("acme corp",), ("acme corp",), ("acme cor",), ("zenith",)],
        "name string",
    )
    blk = lambda c: F.substring(c, 1, 3)
    base = fuzzy_match_pairs(df, "name", blk).collect()
    via_seam = fuzzy_match_pairs(
        df, "name", blk, dictionary=_dictionary(df, "name", blk)
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, via_seam))
    assert len(base) == 1  # acme corp ~ acme cor


def test_resolve_entities_plans_corpus_aggregate_once(spark):
    """The dictionary= seam means the corpus groupBy subtree appears
    ONCE per consumer chain in the optimized plan of the pair stage —
    regression for the double-_dictionary shape the r12 advice flagged.
    The label join and the pair join both reuse the same `dic` object,
    so the optimized plan of resolve_entities' pairs path carries one
    Aggregate over the corpus relation per side of the self-join (the
    self-join necessarily evaluates the dictionary per side), not an
    EXTRA independent aggregate for the label frame."""
    from clickhouse_mysql_data_reader_spark.operators.linkage import (
        resolve_entities,
    )

    df = spark.createDataFrame(
        [("acme corp",), ("acme corp",), ("acme cor",), ("zenith",)],
        "name string",
    )
    out = resolve_entities(
        df, "name", lambda c: F.substring(c, 1, 3), small_graph_pairs=10_000
    )
    rows = {r["name"]: r for r in out.collect()}
    # acme corp (n=2) beats acme cor (n=1); zenith is its own canonical
    assert rows["acme corp"]["canonical"] == "acme corp"
    assert rows["acme cor"]["canonical"] == "acme corp"
    assert rows["acme cor"]["is_canonical"] == 0
    assert rows["zenith"]["canonical"] == "zenith"
    assert rows["acme corp"]["n_names"] == 2
    assert rows["acme corp"]["n_rows"] == 3


def test_apply_entity_mapping_rewrites_corpus_end_to_end(spark):
    """The report-to-rewrite completion (round-12 verdict item #5):
    resolve_entities' mapping applied back to the row stream rewrites
    every variant spelling to its component's canonical, preserves row
    count, passes unmapped values (and NULLs) through verbatim, and
    the rewritten corpus groups to exactly the canonical set."""
    from clickhouse_mysql_data_reader_spark.operators.linkage import (
        apply_entity_mapping,
        resolve_entities,
    )

    df = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corp"), (3, "acme cor"),
         (4, "zenith"), (5, None), (6, "unblocked-nomatch")],
        "row_id long, name string",
    )
    mapping = resolve_entities(
        df, "name", lambda c: F.substring(c, 1, 3), small_graph_pairs=10_000
    )
    out = apply_entity_mapping(df, mapping, "name")
    rows = {r["row_id"]: r["name"] for r in out.collect()}
    assert len(rows) == 6  # row-preserving
    assert rows[1] == rows[2] == rows[3] == "acme corp"  # variant rewritten
    assert rows[4] == "zenith"
    assert rows[5] is None  # NULL passes through
    assert rows[6] == "unblocked-nomatch"
    # canonical coverage: every non-null rewritten value IS a canonical
    canon = {
        r["canonical"] for r in mapping.select("canonical").distinct().collect()
    }
    assert {v for v in rows.values() if v is not None} <= canon
    # the broadcast hint reached the plan (the mapping is the small side)
    assert "Broadcast" in out._jdf.queryExecution().executedPlan().toString()


# --- advice item: fk_orphan_report flags lost one-scan grouping -------


def test_fk_orphan_report_warns_on_semantically_equal_split_children(
    spark, sf_dir
):
    """The real lost-grouping scenario: the SAME parquet table loaded
    into two DataFrame objects (sameSemantics unifies identical scans;
    independently-built local relations legitimately stay distinct)."""
    from clickhouse_mysql_data_reader_spark.operators.profile import (
        fk_orphan_report,
    )

    child_a = spark.read.parquet(f"{sf_dir}/nation.parquet")
    child_b = spark.read.parquet(f"{sf_dir}/nation.parquet")
    parent = spark.read.parquet(f"{sf_dir}/region.parquet")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = fk_orphan_report(
            [
                ("rel_a", child_a, "n_regionkey", parent, "r_regionkey"),
                ("rel_b", child_b, "n_regionkey", parent, "r_regionkey"),
            ]
        ).collect()
    assert any("scanned once PER GROUP" in str(x.message) for x in w)
    assert {r["relation"]: r["n_orphans"] for r in out} == {
        "rel_a": 0,
        "rel_b": 0,
    }


def test_fk_orphan_report_same_object_does_not_warn(spark):
    from clickhouse_mysql_data_reader_spark.operators.profile import (
        fk_orphan_report,
    )

    child = spark.createDataFrame([(1, 10), (2, 11)], "id long, fk long")
    p1 = spark.createDataFrame([(10,)], "pk long")
    p2 = spark.createDataFrame([(11,)], "pk long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = fk_orphan_report(
            [
                ("rel_a", child, "fk", p1, "pk"),
                ("rel_b", child, "fk", p2, "pk"),
            ]
        ).collect()
    assert not [x for x in w if "PER GROUP" in str(x.message)]
    assert all(r["n_orphans"] == 1 for r in out)


# --- round-13 operator: audio energy-contour near-dup -----------------


def test_audio_energy_hash_known_contour(spark):
    """Hand-checkable fingerprint: an injected extractor returning a
    strictly rising contour sets every difference bit; a strictly
    falling one sets none; the near-pair banding then pairs two clips
    whose contours differ in a few windows."""
    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        audio_energy_hash,
        audio_near_dup_pairs,
    )

    media = spark.createDataFrame(
        [
            (1, "audio", b"rise"),
            (2, "audio", b"fall"),
            (3, "audio", b"risx"),  # rising except the last window
            (4, "image", b"rise"),  # wrong modality: filtered out
        ],
        "media_id long, kind string, content binary",
    )

    def contour(content, kind):
        n = 9
        base = list(range(n)) if content[:3] == b"ris" else list(range(n, 0, -1))
        if content == b"risx":
            base[-1] = 0  # one local edit: flips only the last bit
        return base

    sigs = {
        r["media_id"]: r["ahash"]
        for r in audio_energy_hash(media, decode_fn=contour, n_windows=9).collect()
    }
    assert set(sigs) == {1, 2, 3}  # the image row is filtered
    assert sigs[1] == (1 << 8) - 1  # all 8 difference bits set
    assert sigs[2] == 0
    assert bin(sigs[1] ^ sigs[3]).count("1") == 1
    pairs = audio_near_dup_pairs(
        media, hamming_max=1, decode_fn=contour, n_windows=9
    ).collect()
    assert {(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs} == {(1, 3, 1)}


def test_audio_energy_hash_rejects_wrong_window_count(spark):
    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        audio_energy_hash,
    )

    media = spark.createDataFrame(
        [(1, "audio", b"clip")], "media_id long, kind string, content binary"
    )
    bad = lambda content, kind: [0] * 5
    with pytest.raises(Exception, match="exactly 49"):
        audio_energy_hash(media, decode_fn=bad).collect()


def test_audio_near_dup_pairs_sigs_seam(spark):
    """The landed-fingerprint seam: feeding precomputed (media_id,
    ahash) longs yields the identical pair set with no decode in the
    plan — the production path for real decoders."""
    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        audio_energy_hash,
        audio_near_dup_pairs,
        documents_as_media,
    )

    docs = spark.createDataFrame(
        [(i, "w", f"clip number {i} " * 30, len(f"clip {i}")) for i in range(1, 31)],
        "doc_id long, source string, text string, n_chars int",
    )
    media = documents_as_media(docs)
    direct = audio_near_dup_pairs(media, hamming_max=15).collect()
    landed = audio_energy_hash(media).localCheckpoint()
    via_seam = audio_near_dup_pairs(media, hamming_max=15, sigs=landed).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_seam))


# --- round-13 operator: video sampled-frame near-dup ------------------


def _vmedia(spark, rows):
    """(media_id, kind, content, meta) video rows with an explicit
    duration driving the frame count (1 frame/sec)."""
    return spark.createDataFrame(
        [
            (i, kind, c, ("x", None, None, dur))
            for i, kind, c, dur in rows
        ],
        "media_id long, kind string, content binary, "
        "meta struct<mime string, width int, height int, duration_ms long>",
    )


def test_video_frame_hashes_injected_decoder_and_matching(spark):
    """Injected frame decoder with hand-built thumbnails: clips
    sharing >= min_matching frame hashes pair, others don't, counts
    are exact, and the wrong-frame-count / wrong-pixel-count contracts
    fail loudly."""
    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        video_frame_hashes,
        video_near_dup_pairs,
    )

    # 4 pixel patterns -> 4 distinct hashes (2x2 grid, 2 bits)
    P = {
        "w": [0, 1, 0, 1],  # rising rows -> bits 11
        "x": [1, 0, 1, 0],  # falling -> bits 00
        "y": [0, 1, 1, 0],  # mixed -> 01
        "z": [1, 0, 0, 1],  # mixed -> 10
    }

    def frames(content, n_frames):
        pattern = content.decode()
        return [P[pattern[j]] for j in range(n_frames)]

    media = _vmedia(
        spark,
        [
            (1, "video", b"wxy", 3000),   # frames w, x, y
            (2, "video", b"wxz", 3000),   # shares w, x with 1
            (3, "video", b"zzz", 3000),   # distinct-set {z}: 1 shared with 2
            (4, "video", b"wy", 2000),    # shares w, y with 1
            (5, "audio", b"wxy", 3000),   # wrong modality: filtered
            (6, "video", b"", 0),         # zero duration: no frames
        ],
    )
    fh = video_frame_hashes(media, decode_fn=frames, grid_w=2, grid_h=2)
    rows = fh.collect()
    assert {r["media_id"] for r in rows} == {1, 2, 3, 4}
    assert sum(1 for r in rows if r["media_id"] == 1) == 3
    pairs = {
        (r["doc_a"], r["doc_b"]): (
            r["n_matching"], r["n_frames_a"], r["n_frames_b"]
        )
        for r in video_near_dup_pairs(
            media, min_matching_frames=2, decode_fn=frames, grid_w=2, grid_h=2
        ).collect()
    }
    assert pairs == {(1, 2): (2, 3, 3), (1, 4): (2, 3, 2)}

    bad_count = lambda content, n: [[0, 1, 0, 1]] * (n + 1)
    with pytest.raises(Exception, match="frames"):
        video_frame_hashes(media, decode_fn=bad_count, grid_w=2, grid_h=2).collect()
    bad_px = lambda content, n: [[0, 1]] * n
    with pytest.raises(Exception, match="pixels"):
        video_frame_hashes(media, decode_fn=bad_px, grid_w=2, grid_h=2).collect()


def test_video_near_dup_stop_frame_guard_and_sigs_seam(spark):
    """max_frame_df drops ubiquitous frames (the black-frame/logo
    hazard) BEFORE the join; the sigs= seam reproduces the pair set
    from a landed fingerprint table with no decode in the plan."""
    from clickhouse_mysql_data_reader_spark.operators.multimodal import (
        video_frame_hashes,
        video_near_dup_pairs,
    )

    P = {"w": [0, 1, 0, 1], "x": [1, 0, 1, 0], "y": [0, 1, 1, 0]}

    def frames(content, n_frames):
        return [P[content.decode()[j]] for j in range(n_frames)]

    # 'w' appears in ALL four clips (the studio logo); real overlap
    # only between 1 and 2 (x, y)
    media = _vmedia(
        spark,
        [
            (1, "video", b"wxy", 3000),
            (2, "video", b"wxy", 3000),
            (3, "video", b"w", 1000),
            (4, "video", b"w", 1000),
        ],
    )
    kw = dict(decode_fn=frames, grid_w=2, grid_h=2)
    no_guard = {
        (r["doc_a"], r["doc_b"]): r["n_matching"]
        for r in video_near_dup_pairs(media, min_matching_frames=1, **kw).collect()
    }
    assert no_guard[(3, 4)] == 1  # logo-only pair: the false positive
    guarded = {
        (r["doc_a"], r["doc_b"]): r["n_matching"]
        for r in video_near_dup_pairs(
            media, min_matching_frames=1, max_frame_df=3, **kw
        ).collect()
    }
    assert (3, 4) not in guarded
    assert guarded[(1, 2)] == 2  # x, y survive; w dropped everywhere

    landed = video_frame_hashes(media, **kw).localCheckpoint()
    via_seam = {
        (r["doc_a"], r["doc_b"]): r["n_matching"]
        for r in video_near_dup_pairs(
            media, min_matching_frames=1, sigs=landed
        ).collect()
    }
    assert via_seam == no_guard


# --- advice item: image_dhash rejects geometry mismatches -------------


def test_image_dhash_rejects_excess_pixels(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(9)
    )
    media = documents_as_media(docs)
    too_many = lambda content, kind: [0] * 64  # 8x8 fed to the 7x8 default
    with pytest.raises(Exception, match="exactly grid_w\\*grid_h"):
        image_dhash(media, decode_fn=too_many).collect()
