"""Multimodal binary-column plumbing: schema, Arrow batching, stub
decode injection, frame-sample explosion."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    deterministic_fake_decoder,
    documents_as_media,
    extract_features,
    frame_sample_plan,
    real_decoder,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return documents_as_media(docs)


def test_media_schema_and_kinds(media):
    assert dict(media.dtypes)["content"] == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_deterministic(media, spark):
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.orderBy("media_id").limit(3).collect()
    # recompute expectations driver-side from the same bytes
    src = media.orderBy("media_id").limit(3).collect()
    for r, s in zip(rows, src):
        assert r["content_sha"] == hashlib.sha256(bytes(s["content"])).hexdigest()
        assert r["n_bytes"] == len(bytes(s["content"]))
        assert r["feature"] == pytest.approx(
            deterministic_fake_decoder(bytes(s["content"]), s["kind"])
        )


def test_extract_features_runs_distributed(media):
    feats = extract_features(media.repartition(4))
    assert feats.count() == media.count()


def test_real_decoder_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        real_decoder(b"bytes", "image")
    with pytest.raises(Exception):
        extract_features(media, decode_fn=real_decoder).collect()


def test_frame_sample_plan_explosion(media):
    frames = frame_sample_plan(media, every_ms=1000)
    one = (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.col("meta.duration_ms").alias("d"))
        .orderBy("media_id")
        .first()
    )
    n = frames.filter(F.col("media_id") == one["media_id"]).count()
    expected = max((one["d"] - 1), 0) // 1000 + 1
    assert n == expected
