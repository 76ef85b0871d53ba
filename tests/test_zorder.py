"""Z-order clustered landing: Morton-key interleaving correctness and
the multi-column data-skipping property (every file's min/max rectangle
is tight on BOTH dimensions, where a single-key range sort is tight on
one and spans the world on the other)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.sinks.batch import (
    write_range_sorted,
    write_zorder,
    zorder_key,
)
from clickhouse_mysql_data_reader_spark.sources.parquet import load_table


def test_zorder_key_interleaves_bits(spark):
    """bits=2, envelope [0,3] on both dims: bucket == value, and the
    Morton key interleaves x into even and y into odd bit positions."""
    rows = [(0, 0), (3, 0), (0, 3), (3, 3), (2, 1)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(["x", "y"], [0, 0], [3, 3], bits=2).alias("z")
        ).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(2):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), f"({x},{y})"


def test_zorder_key_guards(spark):
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key(["x"], [0], [1])
    with pytest.raises(ValueError, match="exceeds a signed LONG"):
        zorder_key(["x", "y", "w"], [0] * 3, [1] * 3, bits=21)


def _file_spans(path: str, col_name: str):
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col_name
            )
            assert col.statistics is not None
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    return spans


def _mean_frac_span(spans):
    glo = min(s[0] for s in spans)
    ghi = max(s[1] for s in spans)
    width = ghi - glo
    return sum((hi - lo) / width for lo, hi in spans) / len(spans)


def test_write_zorder_prunes_on_both_dimensions(spark, sf_correct, tmp_path):
    orders = load_table(spark, sf_correct, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    zpath = str(tmp_path / "orders_z")
    write_zorder(orders, zpath, ["o_orderkey", "o_custkey"], num_files=16)
    rpath = str(tmp_path / "orders_r")
    write_range_sorted(orders, rpath, ["o_orderkey"], num_files=16)

    # single-key range sort: tight on the sort key, blind on the other
    r_key = _mean_frac_span(_file_spans(rpath, "o_orderkey"))
    r_other = _mean_frac_span(_file_spans(rpath, "o_custkey"))
    assert r_key < 0.15
    assert r_other > 0.8, "control: 2nd dim of a 1-key sort spans ~everything"

    # z-order: BOTH dims materially tighter than the blind dimension
    z_a = _mean_frac_span(_file_spans(zpath, "o_orderkey"))
    z_b = _mean_frac_span(_file_spans(zpath, "o_custkey"))
    assert z_a < 0.6 and z_b < 0.6, f"z spans not tight: {z_a:.2f}, {z_b:.2f}"

    # round-trip: layout changes bytes, not rows
    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
    assert set(back.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}

    # and a conjunctive rectangle predicate reaches the parquet reader
    plan = (
        back.filter((F.col("o_orderkey") < 100) & (F.col("o_custkey") < 50))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "PushedFilters" in plan and "LessThan(o_orderkey,100)" in plan


def test_write_training_shards_jsonl_in_shuffle_order(spark, tmp_path):
    """Sharded JSONL export: every doc lands exactly once as a JSON
    line under its shuffle shard, file content reads back in shuffle
    rank order, newlines in text stay escaped (line == doc)."""
    import glob
    import json

    from clickhouse_mysql_data_reader_spark.operators.sampling import (
        training_shuffle,
    )
    from clickhouse_mysql_data_reader_spark.sinks.batch import (
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"line a of {i}\nline b of {i}") for i in range(40)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, ["doc_id", "text"], n_shards=4)

    order = {}
    for r in training_shuffle(docs, n_shards=4).collect():
        order.setdefault(r["shard"], []).append((r["pos"], r["doc_id"]))
    seen = []
    for shard, expected in order.items():
        files = sorted(glob.glob(f"{out}/shard={shard}/part-*"))
        lines = [l for f in files for l in open(f).read().splitlines() if l]
        objs = [json.loads(l) for l in lines]
        assert [o["doc_id"] for o in objs] == [d for _, d in sorted(expected)]
        for o in objs:
            assert o["text"] == f"line a of {o['doc_id']}\nline b of {o['doc_id']}"
        seen.extend(o["doc_id"] for o in objs)
    assert sorted(seen) == list(range(40))


def test_zorder_all_null_column_raises_named_error(spark, tmp_path):
    """An all-null z-column has no quantile envelope; the writer must
    name it in a ValueError instead of raising IndexError mid-write."""
    df = spark.createDataFrame(
        [(i, None) for i in range(10)], "x long, y double"
    )
    with pytest.raises(ValueError, match="y"):
        write_zorder(df, str(tmp_path / "z"), ["x", "y"], bits=4)
