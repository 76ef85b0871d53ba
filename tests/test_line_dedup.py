"""Corpus-level line dedup: keeper election, short-line exemption,
order-preserving reassembly, empty-doc survival, and the skew-proof
plan shape (no window over partitionBy(line))."""

from __future__ import annotations

from clickhouse_mysql_data_reader_spark.operators.text import line_dedup

BANNER = "accept all cookies to continue"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_keeps_first_occurrence_and_reassembles(spark):
    docs = _mk(
        spark,
        [
            (1, f"intro one\n{BANNER}\nunique body a"),
            (2, f"{BANNER}\nunique body b\n\nafter blank"),
            (3, BANNER),
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, min_line_chars=2).collect()}
    assert out[1]["text"] == f"intro one\n{BANNER}\nunique body a"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    # doc 2 loses the banner but keeps its blank separator line
    assert out[2]["text"] == "unique body b\n\nafter blank"
    assert out[2]["n_lines"] == 4 and out[2]["n_kept"] == 3
    # doc 3's only line was a non-keeper duplicate: survives, empty
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0 and out[3]["n_lines"] == 1


def test_line_dedup_short_lines_exempt(spark):
    docs = _mk(spark, [(1, "x\nunique body c"), (2, "x")])
    out = {r["doc_id"]: r for r in line_dedup(docs, min_line_chars=2).collect()}
    assert out[1]["text"] == "x\nunique body c"
    assert out[2]["text"] == "x", "short duplicated lines are structure, every doc keeps its own"


def test_line_dedup_regex_special_separator_is_literal(spark):
    """A regex-special separator ('|') must split on the LITERAL pipe,
    not on the empty-alternation regex (which would split per character
    and corrupt the corpus); empty separators raise."""
    docs = _mk(
        spark,
        [
            (1, "first unique field|duplicated field body|tail field one"),
            (2, "duplicated field body|second unique field"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(docs, min_line_chars=2, sep="|").collect()
    }
    assert out[1]["text"] == "first unique field|duplicated field body|tail field one"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    assert out[2]["text"] == "second unique field"
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        line_dedup(docs, sep="")


def test_line_dedup_keeper_is_position_aware_within_doc(spark):
    """A line duplicated WITHIN one doc keeps only its first position."""
    docs = _mk(spark, [(7, "same long line here\nmiddle text\nsame long line here")])
    r = line_dedup(docs, min_line_chars=2).collect()[0]
    assert r["text"] == "same long line here\nmiddle text"
    assert r["n_lines"] == 3 and r["n_kept"] == 2


def test_paragraph_dedup_unit_is_blank_line_separated(spark):
    """paragraph_dedup (line_dedup at sep='\\n\\n'): a shared footer
    PARAGRAPH (itself containing a newline) keeps only its first
    occurrence; single-newline structure inside a paragraph is not a
    dedup boundary; reassembly rejoins with one blank line."""
    from clickhouse_mysql_data_reader_spark.operators.text import paragraph_dedup

    footer = "copyright the site\nall rights reserved"
    docs = _mk(
        spark,
        [
            (1, f"first article body\n\n{footer}"),
            (2, f"second article body\n\n{footer}\n\nextra closing note"),
            (3, footer),
        ],
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[1]["text"] == f"first article body\n\n{footer}"
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["text"] == "second article body\n\nextra closing note"
    assert out[2]["n_lines"] == 3 and out[2]["n_kept"] == 2
    # doc 3 was ONLY the footer paragraph: survives, gutted
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0


def test_line_dedup_plan_has_no_line_partitioned_window(spark):
    """Scale guard: keeper election must be an aggregate (map-side
    combinable; hot boilerplate lines collapse per map task), never a
    window over partitionBy(line) (unsplittable hot partition)."""
    docs = _mk(spark, [(1, "a line\nb line"), (2, "a line")])
    plan = line_dedup(docs)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


# --- ExactSubstr span dedup -------------------------------------------------

LIC = "this software is provided as is without warranty of any kind express or implied"


def test_exact_substring_dedup_excises_shared_spans(spark):
    from clickhouse_mysql_data_reader_spark.operators.text import (
        exact_substring_dedup,
    )

    docs = _mk(
        spark,
        [
            (1, f"doc one body starts here {LIC} and then unique tail alpha"),
            (2, f"{LIC} second doc unique middle content beta"),
            (3, f"unique head gamma {LIC}"),
            (4, "totally unique document with no duplicated spans at all in it"),
            (5, "short doc"),
        ],
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(docs, window=8).collect()}
    lic_n = len(LIC.split())  # 14 tokens, covered by overlapping 8-windows
    assert out[1]["n_dropped"] == 0 and LIC in out[1]["text"], "keeper intact"
    for d in (2, 3):
        assert out[d]["n_dropped"] == lic_n, f"doc {d}"
        assert LIC not in out[d]["text"]
    assert out[2]["text"] == "second doc unique middle content beta"
    assert out[3]["text"] == "unique head gamma"
    assert out[4]["n_dropped"] == 0
    assert out[5]["n_tokens"] == 2 and out[5]["n_dropped"] == 0, "below-window doc untouched"


def test_span_decontaminate_removes_all_benchmark_spans(spark):
    """span_decontaminate is KEEPER-LESS: every corpus occurrence of a
    benchmark span leaves (the benchmark owns it), unlike
    exact_substring_dedup's first-occurrence keeper; docs with no
    collision or shorter than the window are untouched."""
    from clickhouse_mysql_data_reader_spark.operators.text import span_decontaminate

    corpus = _mk(
        spark,
        [
            (1, f"doc one body starts here {LIC} and then unique tail alpha"),
            (2, f"{LIC} second doc unique middle content beta"),
            (3, "totally unique document with no duplicated spans at all in it"),
            (4, "short doc"),
        ],
    )
    bench = _mk(spark, [(100, f"benchmark item quoting {LIC} verbatim")])
    out = {
        r["doc_id"]: r
        for r in span_decontaminate(corpus, bench, window=8).collect()
    }
    lic_n = len(LIC.split())
    # BOTH occurrences excised — no keeper survives
    for d in (1, 2):
        assert out[d]["n_dropped"] == lic_n, f"doc {d}"
        assert LIC not in out[d]["text"]
    assert out[1]["text"] == "doc one body starts here and then unique tail alpha"
    assert out[3]["n_dropped"] == 0
    assert out[4]["n_tokens"] == 2 and out[4]["n_dropped"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window"):
        span_decontaminate(corpus, bench, window=1)


def test_exact_substring_dedup_handles_within_doc_repeats(spark):
    """A span repeated INSIDE one doc keeps only its first occurrence —
    the paper dedups within documents too."""
    from clickhouse_mysql_data_reader_spark.operators.text import (
        exact_substring_dedup,
    )

    span = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _mk(spark, [(1, f"{span} filler words in between {span}")])
    r = exact_substring_dedup(docs, window=8).collect()[0]
    assert r["n_dropped"] == 8
    assert r["text"] == f"{span} filler words in between"


def test_exact_substring_dedup_guards_and_plan(spark):
    from clickhouse_mysql_data_reader_spark.operators.text import (
        exact_substring_dedup,
    )
    import pytest as _pytest

    docs = _mk(spark, [(1, "a b c")])
    with _pytest.raises(ValueError, match="window"):
        exact_substring_dedup(docs, window=1)
    with _pytest.raises(ValueError, match="min_count"):
        exact_substring_dedup(docs, min_count=1)

    # keeper election is an aggregate, not a window over partitionBy(fp)
    plan = exact_substring_dedup(docs, window=2)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Window" not in plan

    # empty/whitespace docs survive as empty rows (no ANSI element_at
    # trap from the descending sequence(0, -1))
    empty = _mk(spark, [(9, ""), (10, "   ")])
    out = {r["doc_id"]: r for r in exact_substring_dedup(empty, window=2).collect()}
    assert out[9]["n_tokens"] == 0 and out[9]["text"] == ""
    assert out[10]["n_tokens"] == 0 and out[10]["text"] == ""


# --- incremental line dedup -------------------------------------------------


def test_line_dedup_increment_matches_batch_equivalence(spark):
    """Running two batches incrementally (state = kept-line fingerprints)
    produces exactly what one batch line_dedup over the concatenated
    corpus would, when doc ids are assigned in batch order."""
    from clickhouse_mysql_data_reader_spark.operators.text import (
        line_dedup,
        line_dedup_increment,
    )

    b1 = _mk(
        spark,
        [
            (1, f"intro one\n{BANNER}\nunique body a"),
            (2, f"{BANNER}\nunique body b"),
        ],
    )
    b2 = _mk(
        spark,
        [
            (4, f"{BANNER}\nfresh body c\nrepeated in batch two"),
            (5, "repeated in batch two\nfresh body d"),
            (6, BANNER),
        ],
    )
    c1, fps1 = line_dedup_increment(b1, None, min_line_chars=2)
    c2, fps2 = line_dedup_increment(b2, fps1, min_line_chars=2)

    inc = {r["doc_id"]: r for r in c1.collect()} | {
        r["doc_id"]: r for r in c2.collect()
    }
    full = {
        r["doc_id"]: r
        for r in line_dedup(b1.unionByName(b2), min_line_chars=2).collect()
    }
    assert set(inc) == set(full)
    for d in full:
        assert inc[d]["text"] == full[d]["text"], f"doc {d}"
        assert inc[d]["n_kept"] == full[d]["n_kept"], f"doc {d}"

    # state semantics: batch-2 state holds only NEW lines (banner already
    # landed in batch 1's fps)
    f1 = {r["line_fp"] for r in fps1.collect()}
    f2 = {r["line_fp"] for r in fps2.collect()}
    assert len(f1) == 4  # intro, banner, body a, body b
    # batch-2 survivors exclude history lines, so fps are disjoint
    assert not (f1 & f2)
    assert len(f2) == 3  # fresh c, repeated-in-batch-two, fresh d

    # doc 6 lost its only line to history -> present with n_kept 0
    assert inc[6]["n_kept"] == 0 and inc[6]["text"] == ""


def test_paragraph_dedup_increment_matches_batch_equivalence(spark):
    """The incremental form at sep='\\n\\n': two batches with a shared
    footer PARAGRAPH compose to exactly one batch paragraph_dedup over
    the concatenation (ids batch-ordered), and the landed fingerprints
    are paragraph-domain (disjoint across batches)."""
    from clickhouse_mysql_data_reader_spark.operators.text import (
        line_dedup_increment,
        paragraph_dedup,
    )

    footer = "copyright the site\nall rights reserved to the owners"
    b1 = _mk(spark, [(1, f"first article body\n\n{footer}")])
    b2 = _mk(
        spark,
        [
            (4, f"second article body\n\n{footer}"),
            (5, footer),
        ],
    )
    c1, fps1 = line_dedup_increment(b1, None, min_line_chars=2, sep="\n\n")
    c2, fps2 = line_dedup_increment(b2, fps1, min_line_chars=2, sep="\n\n")
    inc = {r["doc_id"]: r for r in c1.collect()} | {
        r["doc_id"]: r for r in c2.collect()
    }
    full = {
        r["doc_id"]: r
        for r in paragraph_dedup(b1.unionByName(b2), min_chars=2).collect()
    }
    assert set(inc) == set(full)
    for d in full:
        assert inc[d]["text"] == full[d]["text"], f"doc {d}"
    assert footer in inc[1]["text"] and footer not in inc[4]["text"]
    assert inc[5]["n_kept"] == 0 and inc[5]["text"] == ""
    f1 = {r["line_fp"] for r in fps1.collect()}
    f2 = {r["line_fp"] for r in fps2.collect()}
    assert len(f1) == 2 and len(f2) == 1 and not (f1 & f2)


def test_collapse_repeated_lines_in_row(spark):
    from pyspark.sql import functions as F

    from clickhouse_mysql_data_reader_spark.operators.text import (
        collapse_repeated_lines,
    )

    rows = [
        (1, "nav bar\nnav bar\nbody text\nbody text\nbody text\ntail"),
        (2, "a\n\n\nb"),      # blank separators never collapse (short)
        (3, "only line"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", collapse_repeated_lines(F.col("text"), min_line_chars=1).alias("c")
        ).collect()
    }
    assert got[1] == "nav bar\nbody text\ntail"
    assert got[2] == "a\n\n\nb"
    assert got[3] == "only line"
    assert got[4] is None
    assert got[5] == ""

    plan = df.select(collapse_repeated_lines(F.col("text")).alias("c"))._jdf \
        .queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    assert "Exchange" not in plan
