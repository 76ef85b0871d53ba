"""CSV file source — S3 (reader/csvreader.py:12-58 in the reference).

The reference opens one file, sniffs dialect + header with
``csv.Sniffer``, and emits per-row dict events. Here the sniff stays a
driver-side peek at one file head (bytes, not rows), and the *read* is
Spark's distributed CSV scan: splittable, schema-inferred or explicit,
with `nullValue` handling replacing the T6 empty-string→NULL converter
(csvreadconverter.py:10-22).
"""

from __future__ import annotations

import csv
import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def sniff_dialect(path: str, sample_bytes: int = 4096) -> tuple[str, bool]:
    """(delimiter, has_header) from the first file's head — the same
    csv.Sniffer call the reference makes, kept off the executors."""
    if os.path.isdir(path):
        # prefer *.csv, else any regular data file (e.g. part-* without
        # extension); hidden/_SUCCESS markers excluded
        names = sorted(glob.glob(os.path.join(path, "*.csv"))) or sorted(
            p
            for p in glob.glob(os.path.join(path, "*"))
            if os.path.isfile(p) and not os.path.basename(p).startswith((".", "_"))
        )
        if not names:
            raise ValueError(f"sniff_dialect: no data files found under {path!r}")
        first = names[0]
    else:
        first = path
    with open(first, newline="") as f:
        sample = f.read(sample_bytes)
    sniffer = csv.Sniffer()
    try:
        delimiter = sniffer.sniff(sample).delimiter
    except csv.Error:
        delimiter = ","
    try:
        has_header = sniffer.has_header(sample)
    except csv.Error:
        has_header = True
    return delimiter, has_header


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    empty_as_null: bool = True,
    infer_schema: bool = True,
    sampling_ratio: float = 0.01,
) -> DataFrame:
    """Distributed CSV read with sniffed dialect.

    ``empty_as_null`` reproduces T6 (empty-string→NULL on ingest) via
    the native ``nullValue`` option — per-cell Python conversion becomes
    a scan-time rule.

    Schema policy at scale: an explicit ``schema`` is the zero-extra-
    pass path (no inference job at all — asserted in
    tests/test_sources.py). When inferring, ``sampling_ratio`` bounds
    the inference pass (Spark samples that fraction of rows) instead of
    re-reading the full dataset — at 100 TB an unbounded inference
    pass doubles the scan cost before the first real job runs.
    """
    delimiter, has_header = sniff_dialect(path)
    reader = (
        spark.read.option("header", has_header)
        .option("sep", delimiter)
        .option("emptyValue", None if empty_as_null else "")
    )
    if empty_as_null:
        reader = reader.option("nullValue", "")
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True).option(
            "samplingRatio", sampling_ratio
        )
    return reader.csv(path)
