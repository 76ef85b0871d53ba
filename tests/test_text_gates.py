"""Gopher rule filter and n-gram boilerplate coverage — unit tests with
crafted adversarial rows (bullets, ellipses, symbol soup, planted
boilerplate fragments) that the synthetic word-soup corpus can't
exercise. The oracle parity of both registered queries is covered by
test_oracle_queries.py; these tests pin per-RULE behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.text import (
    gopher_rules,
    ngram_boilerplate,
)

# A fluent sentence long enough to pass the (test-sized) word floor.
_GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs off "
    "to the river with a happy bark that echoes through the valley"
)


def _rules(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = gopher_rules(df, "text", "doc_id", **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_gopher_good_doc_passes(spark):
    got = _rules(spark, [(1, _GOOD)], min_words=10)
    r = got[1]
    assert r["pass_gopher"] is True
    assert r["n_stop_types"] >= 2  # the, to, and, with
    assert r["symbol_ratio"] == 0.0
    assert r["alpha_frac"] == 1.0


def test_gopher_word_count_bounds(spark):
    got = _rules(spark, [(1, "too short"), (2, _GOOD)], min_words=10)
    assert got[1]["pass_gopher"] is False  # 2 words < floor
    assert got[2]["pass_gopher"] is True


def test_gopher_symbol_ratio(spark):
    # 24 words but every fourth token is a '#' burst: ratio > 0.1
    noisy = _GOOD + " ### ## #"
    got = _rules(spark, [(1, noisy)], min_words=10)
    assert got[1]["symbol_ratio"] > 0.1
    assert got[1]["pass_gopher"] is False


def test_gopher_bullet_lines(spark):
    bullets = "\n".join(f"- item {i} is listed here" for i in range(10))
    text = _GOOD + "\n" + bullets
    got = _rules(spark, [(1, text)], min_words=10, max_bullet_frac=0.5)
    r = got[1]
    assert r["bullet_frac"] == 10 / 11
    assert r["pass_gopher"] is False


def test_gopher_ellipsis_lines(spark):
    lines = [_GOOD, "this line trails off...", "and so does this one…", _GOOD]
    got = _rules(spark, [(1, "\n".join(lines))], min_words=10)
    r = got[1]
    assert r["ellipsis_frac"] == 0.5
    assert r["pass_gopher"] is False  # 0.5 > 0.3 default


def test_gopher_alpha_fraction(spark):
    digits = " ".join(str(i) for i in range(40))
    got = _rules(spark, [(1, _GOOD + " " + digits)], min_words=10)
    r = got[1]
    assert r["alpha_frac"] < 0.8
    assert r["pass_gopher"] is False


def test_gopher_mean_word_length(spark):
    # single-char tokens: mean word length 1 < 3 floor
    short = " ".join("a" for _ in range(60)) + " the of"
    got = _rules(spark, [(1, short)], min_words=10)
    r = got[1]
    assert r["mean_word_len"] < 3
    assert r["pass_gopher"] is False


def test_gopher_stopword_floor(spark):
    # long and alphabetic but zero Gopher stopwords
    soup = " ".join(f"zorp{i % 7}blatt" for i in range(60))
    got = _rules(spark, [(1, soup)], min_words=10)
    assert got[1]["n_stop_types"] == 0
    assert got[1]["pass_gopher"] is False


# --- n-gram boilerplate ----------------------------------------------------


def test_boilerplate_coverage_planted(spark):
    footer = "all rights reserved by the example corporation of earth"
    uniques = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "red orange yellow green blue indigo violet shade",
    ]
    rows = [(i, f"{u} {footer}") for i, u in enumerate(uniques)]
    rows.append((99, "totally unrelated words appear in this document only"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in ngram_boilerplate(df, "text", "doc_id", min_docs=3).collect()
    }
    # the planted footer contributes 7 shared 3-grams to docs 0-2;
    # the seam shingles (unique-tail + footer-head) differ per doc
    for i in range(3):
        assert out[i]["boiler_hits"] == 7
        assert 0 < out[i]["boiler_frac"] < 1
    assert out[99]["boiler_hits"] == 0
    assert out[99]["boiler_frac"] == 0.0


def test_boilerplate_own_repeats_dont_count(spark):
    # a doc repeating ITS OWN fragment stays clean: shingle_table is
    # distinct per doc, so corpus frequency stays 1
    frag = "spam spam spam spam spam spam"
    rows = [(1, f"{frag} {frag} {frag}"), (2, "other words live here today")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in ngram_boilerplate(df, "text", "doc_id", min_docs=2).collect()
    }
    assert out[1]["boiler_hits"] == 0
    assert out[2]["boiler_hits"] == 0


def test_boilerplate_respects_prebuilt_shingles(spark):
    from clickhouse_mysql_data_reader_spark.operators.dedup import shingle_table

    rows = [(i, f"shared prefix words here tail{i} tail{i} tail{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = shingle_table(df, "text", "doc_id", k=3)
    a = ngram_boilerplate(df, "text", "doc_id", min_docs=4).collect()
    b = ngram_boilerplate(df, "text", "doc_id", min_docs=4, shingles=sh).collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_corpus_stats_global_row_and_empties(spark):
    """source_col=None reports one '_all' row; empty/whitespace docs
    count in n_empty; totals are exact; the histogram is bucket-sorted."""
    from pyspark.sql import functions as F

    from clickhouse_mysql_data_reader_spark.operators.text import corpus_stats

    docs = spark.createDataFrame(
        [
            (1, "w", "a b c"),
            (2, "w", " ".join(f"t{i}" for i in range(70))),
            (3, "x", ""),
            (4, "x", "   "),
        ],
        "doc_id long, source string, text string",
    )
    g = corpus_stats(docs, source_col=None, hist_bucket_tokens=64).collect()
    assert len(g) == 1 and g[0]["source"] == "_all"
    r = g[0]
    assert r["n_docs"] == 4 and r["n_empty"] == 2
    # token_count of "" is 1 (split of empty normalized text) — exact:
    # 3 + 70 + 1 + 1
    assert r["n_tokens"] == 75 and r["max_tokens"] == 70 and r["min_tokens"] == 1
    assert r["token_hist"] == "000000000:3,000000001:1"

    per = {r["source"]: r for r in corpus_stats(docs).collect()}
    assert per["w"]["n_docs"] == 2 and per["x"]["n_empty"] == 2


def test_gate_columns_rejects_internal_name_collision(spark):
    """gopher_gate_columns keeps every caller column, so a caller
    column named like a _gopher_base internal (n_words, n_stop_types,
    _gtk, ...) would make downstream references ambiguous or silently
    gate on the wrong column — the guard raises up front instead."""
    import pytest

    from clickhouse_mysql_data_reader_spark.operators.text import (
        gopher_gate_columns,
    )

    df = spark.createDataFrame(
        [(1, _GOOD, 7)], "doc_id bigint, text string, n_words int"
    )
    with pytest.raises(ValueError, match="n_words"):
        gopher_gate_columns(df, "text", min_words=10)
    # non-colliding frames still work and keep all caller columns
    ok = spark.createDataFrame([(1, _GOOD, 7)], "doc_id bigint, text string, extra int")
    out = gopher_gate_columns(ok, "text", min_words=10)
    assert set(out.columns) == {"doc_id", "text", "extra", "pass_gopher"}
    assert out.collect()[0]["pass_gopher"] is True


def test_containment_catches_truncated_copy_jaccard_misses(spark):
    """The sub-document-duplicate case: doc 2 is a truncated copy of
    long doc 1. Its containment is 1.0 (every shingle of the short doc
    appears in the long one) while its Jaccard sits well below a 0.8
    dedup threshold — exactly the pair a Jaccard-only pass keeps."""
    from clickhouse_mysql_data_reader_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        shingle_table,
    )

    head = (
        "the survey team walked the north ridge at dawn and marked the "
        "line where the old fence had fallen in the storm last winter"
    )
    tail = (
        "and later that week the clerk copied the notes into the ledger "
        "and filed the map with the county office for the record books"
    )
    docs = spark.createDataFrame(
        [
            (1, head + " " + tail),  # long original
            (2, head),               # truncated copy (first half only)
            (3, "a completely different account of the harvest feast "
                "held in the village square when the rains finally came"),
        ],
        "doc_id long, text string",
    )
    sh = shingle_table(docs, "text", "doc_id", k=3)
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(sh, min_inter=3).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, min_inter=3).collect()
    }
    assert cont[(1, 2)] == 1.0, "every shingle of the truncated copy is contained"
    assert jac[(1, 2)] < 0.8, "symmetric Jaccard misses the same pair"
    assert (1, 3) not in cont and (2, 3) not in cont
    # threshold filter keeps only the contained pair
    kept = containment_pairs(sh, min_inter=3, min_containment=0.9).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in kept} == {(1, 2)}


def _containment_corpus(spark):
    """Corpus with the shapes prefix filtering must not lose: a
    truncated copy (high containment, low Jaccard), a mid-document
    excerpt, heavy shared boilerplate across otherwise-unrelated docs
    (the hot-shingle case the frequency ordering exists to dodge), and
    a fully unrelated doc."""
    head = (
        "the survey team walked the north ridge at dawn and marked the "
        "line where the old fence had fallen in the storm last winter"
    )
    mid = (
        "and later that week the clerk copied the notes into the ledger "
        "and filed the map with the county office for the record books"
    )
    boiler = "click here to subscribe to our newsletter for more stories"
    return spark.createDataFrame(
        [
            (1, head + " " + mid + " " + boiler),
            (2, head),                       # truncated copy of 1
            (3, mid + " " + boiler),         # mid+tail excerpt of 1
            (4, boiler + " fresh harvest recipes from the valley farms"),
            (5, boiler + " weekly weather outlook for the coastal towns"),
            (6, "a completely different account of the harvest feast "
                "held in the village square when the rains finally came"),
        ],
        "doc_id long, text string",
    )


@pytest.mark.slow
def test_containment_prefix_candidates_exact_vs_all_pairs(spark):
    """Prefix filtering (Bayardo et al., WWW'07) is an EXACT candidate
    generator for containment >= t: verified pairs through the prefix
    candidates must equal the all-co-shingled-pairs baseline at every
    threshold — including the truncated-copy pair whose Jaccard is low
    (the case LSH banding systematically under-recalls)."""
    from clickhouse_mysql_data_reader_spark.operators.dedup import (
        containment_pairs,
        containment_prefix_candidates,
        shingle_table,
    )

    sh = shingle_table(_containment_corpus(spark), "text", "doc_id", k=3)
    # 0.3 and 0.7 are FP-adversarial: double(1 - t) rounds DOWN for
    # them, the case the prefix slice's margin shingle exists for
    for t in (0.3, 0.5, 0.7, 0.9, 1.0):
        base = {
            (r["doc_a"], r["doc_b"]): (r["n_inter"], r["containment"])
            for r in containment_pairs(
                sh, min_inter=1, min_containment=t
            ).collect()
        }
        cands = containment_prefix_candidates(sh, min_containment=t)
        got = {
            (r["doc_a"], r["doc_b"]): (r["n_inter"], r["containment"])
            for r in containment_pairs(
                sh, candidates=cands, min_inter=1, min_containment=t
            ).collect()
        }
        assert got == base, f"prefix filter lost/invented pairs at t={t}"
    # the hard pair survives the tightest threshold
    assert (1, 2) in got, "truncated copy must reach containment 1.0"


def test_containment_prefix_candidates_validation_and_plan(spark):
    from clickhouse_mysql_data_reader_spark.operators.dedup import (
        containment_prefix_candidates,
        shingle_table,
    )

    sh = shingle_table(_containment_corpus(spark), "text", "doc_id", k=3)
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="min_containment"):
            containment_prefix_candidates(sh, min_containment=bad)
    # prefix build is a map-side-combinable aggregate + equi-join:
    # no Window (per-doc slice rides groupBy/sort_array), no cartesian
    plan = containment_prefix_candidates(
        sh, min_containment=0.9
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_bm25_topk_ranking_validation_and_plan(spark):
    """BM25 semantics the oracle can't pin alone: saturation (20x one
    term does NOT swamp a doc matching all terms), absence filtering,
    deterministic ties, validation, and the scale plan shape (term
    filter BEFORE the tf aggregate, top-k as TakeOrderedAndProject,
    no Window)."""
    from clickhouse_mysql_data_reader_spark.operators.text import bm25_topk

    filler = "the quick brown fox jumps over the lazy dog near the river "
    docs = spark.createDataFrame(
        [
            # matches all 3 query terms once each
            (1, filler * 2 + "alpha beta gamma"),
            # 20x one term, same length scale: saturation must keep
            # this BELOW the all-terms doc (idf sums beat tf stuffing)
            (2, filler * 2 + "alpha " * 20),
            # no query terms at all -> must not appear
            (3, filler * 3),
            # short doc with two terms: length normalization boosts it
            (4, "alpha beta " + filler),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, "text", "doc_id", ["alpha", "beta", "gamma"], top_k=10)
    rows = out.collect()
    ids = [r["doc_id"] for r in rows]
    assert 3 not in ids, "doc without any query term must be absent"
    assert ids[0] == 1, "doc matching ALL terms outranks the term-stuffed one"
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["n_terms"] == 3 and by_id[2]["n_terms"] == 1
    assert by_id[4]["n_terms"] == 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="query_terms"):
        bm25_topk(docs, "text", "doc_id", [])
    with _pytest.raises(ValueError, match="top_k"):
        bm25_topk(docs, "text", "doc_id", ["alpha"], top_k=0)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "top-k must not be a global sort"
    assert "Window" not in plan
    # the only nested-loop allowed is the BROADCAST of the 1-row
    # (n_docs, total_tok) totals frame (the tfidf idiom); an
    # unbroadcast cartesian would be a scale killer
    assert "CartesianProduct" not in plan
    assert plan.count("NestedLoopJoin") == plan.count("BroadcastNestedLoopJoin")


@pytest.mark.slow
def test_bm25_frozen_stats(spark):
    """bm25_topk(stats=...) — the frozen-stats deployment shape (the
    lm_surprisal(counts=)/DSIR move):

    1. stats built FROM the scored corpus => results identical to the
       derived form (the equality the registry's text_bm25_frozen
       driver query rides);
    2. batch-composition independence — scoring a SUBSET against the
       full-corpus stats reproduces the full-corpus scores for the
       surviving docs, where the derived form recounts df/avgdl from
       the subset and shifts them;
    3. a query term outside the frozen vocabulary takes df=0 (maximal
       idf) instead of dropping the doc;
    4. an empty stats table raises in-plan, not silent NULL scores.
    """
    from clickhouse_mysql_data_reader_spark.operators.text import (
        bm25_stats,
        bm25_topk,
    )

    filler = "the quick brown fox jumps over the lazy dog near the river "
    docs = spark.createDataFrame(
        [
            (1, filler * 2 + "alpha beta gamma"),
            (2, filler * 2 + "alpha " * 20),
            (3, filler * 3),
            (4, "alpha beta " + filler),
        ],
        "doc_id long, text string",
    )
    q = ["alpha", "beta", "gamma"]
    stats = bm25_stats(docs, "text", "doc_id")
    derived = bm25_topk(docs, "text", "doc_id", q, top_k=10).collect()
    frozen = bm25_topk(docs, "text", "doc_id", q, top_k=10, stats=stats).collect()
    assert [tuple(r) for r in derived] == [tuple(r) for r in frozen]

    # (2) freeze full-corpus stats, score only docs {2, 4}: their
    # scores must equal the full-corpus run's — the derived form would
    # recompute df(beta)=1, df(gamma)=0 and a different avgdl
    full_by_id = {r["doc_id"]: r["score"] for r in frozen}
    sub = docs.filter("doc_id in (2, 4)")
    sub_frozen = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(sub, "text", "doc_id", q, top_k=10, stats=stats).collect()
    }
    assert sub_frozen == {k: v for k, v in full_by_id.items() if k in (2, 4)}
    sub_derived = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(sub, "text", "doc_id", q, top_k=10).collect()
    }
    assert sub_derived != sub_frozen, "derived stats shift with the batch"

    # (3) unseen-in-frozen-vocab query term: df=0 keeps the doc, with
    # maximal idf — build stats WITHOUT doc 1 (the only 'gamma' doc)
    stats_no1 = bm25_stats(docs.filter("doc_id != 1"), "text", "doc_id")
    out = bm25_topk(docs, "text", "doc_id", ["gamma"], top_k=10, stats=stats_no1)
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1] and rows[0]["score"] > 0

    # (4) empty stats table raises in-plan
    import pytest as _pytest

    empty = stats.filter("1 = 0")
    with _pytest.raises(Exception, match="frozen stats"):
        bm25_topk(docs, "text", "doc_id", q, stats=empty).collect()


@pytest.mark.slow
def test_jaccard_prefix_candidates_exact_vs_all_pairs(spark):
    """The Jaccard form of the AllPairs prefix filter is exact at its
    TIGHTER bound (prefix ~ (1-t)/(1+t) of each doc): verified pairs
    through the candidates equal the all-co-shingled baseline at every
    threshold — the deterministic alternative to MinHash-LSH, whose
    recall is probabilistic."""
    from clickhouse_mysql_data_reader_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_prefix_candidates,
        shingle_table,
    )

    sh = shingle_table(_containment_corpus(spark), "text", "doc_id", k=3)
    for t in (0.3, 0.5, 0.7, 0.9):
        base = {
            (r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
            for r in jaccard_pairs(sh, min_inter=1, min_jaccard=t).collect()
        }
        cands = jaccard_prefix_candidates(sh, min_jaccard=t)
        got = {
            (r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
            for r in jaccard_pairs(
                sh, candidates=cands, min_inter=1, min_jaccard=t
            ).collect()
        }
        assert got == base, f"jaccard prefix filter lost/invented pairs at t={t}"
    with pytest.raises(ValueError, match="min_jaccard"):
        jaccard_prefix_candidates(sh, min_jaccard=0.0)


@pytest.mark.slow
def test_prefix_filter_exactness_randomized(spark):
    """Adversarial randomized guard for the AllPairs prefix-filter
    math: random shingle-set corpora (skewed doc sizes, a planted hot
    shingle, subset/superset docs) x random thresholds, with the
    QUALIFYING PAIR SET computed exactly in Python from the same
    definitions. The Spark candidates must be a superset of every
    qualifying pair for BOTH metric forms — the no-false-negatives
    property everything downstream relies on. Fixed seed: failures
    reproduce."""
    import numpy as np

    from clickhouse_mysql_data_reader_spark.operators.dedup import (
        containment_prefix_candidates,
        jaccard_prefix_candidates,
    )

    rng = np.random.default_rng(1337)
    for trial in range(6):
        n_docs = int(rng.integers(4, 12))
        docs = {}
        for d in range(n_docs):
            size = int(rng.integers(1, 30))
            # small shingle universe -> dense overlaps; shingle 7 is hot
            s = set(int(x) for x in rng.integers(0, 40, size)) | {7}
            docs[d] = s
        # plant a subset doc (containment 1.0) of a random host
        host = int(rng.integers(0, n_docs))
        if len(docs[host]) > 2:
            docs[n_docs] = set(list(docs[host])[: len(docs[host]) // 2])
        rows = [(d, h) for d, ss in docs.items() for h in ss]
        sh = spark.createDataFrame(rows, "doc_id long, sh_h long")
        t = float(rng.uniform(0.05, 1.0))

        def exact_pairs(metric):
            out = set()
            ids = sorted(docs)
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    inter = len(docs[a] & docs[b])
                    if inter == 0:
                        continue
                    if metric == "containment":
                        v = inter / min(len(docs[a]), len(docs[b]))
                    else:
                        v = inter / len(docs[a] | docs[b])
                    if v >= t:
                        out.add((a, b))
            return out

        got_c = {
            (r["doc_a"], r["doc_b"])
            for r in containment_prefix_candidates(sh, t).collect()
        }
        missing_c = exact_pairs("containment") - got_c
        assert not missing_c, f"trial {trial} t={t}: containment lost {missing_c}"
        got_j = {
            (r["doc_a"], r["doc_b"])
            for r in jaccard_prefix_candidates(sh, t).collect()
        }
        missing_j = exact_pairs("jaccard") - got_j
        assert not missing_j, f"trial {trial} t={t}: jaccard lost {missing_j}"


# ---------------------------------------------------------------------------
# C4-style blocklist gate
# ---------------------------------------------------------------------------


def test_blocklist_gate_token_boundaries(spark):
    from clickhouse_mysql_data_reader_spark.operators.text import blocklist_gate

    docs = spark.createDataFrame(
        [
            (1, "the casino opened a lottery stand"),   # two hits
            (2, "classic cassino-free text"),            # substring must NOT trip
            (3, "PILLS Pills pills"),                    # case-normalized, 3 hits 1 term
            (4, "perfectly clean text"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in blocklist_gate(docs, "text", "doc_id").collect()}
    assert out[1]["block_hits"] == 2 and out[1]["hit_terms"] == "casino,lottery"
    assert out[2]["passed"] and out[2]["block_hits"] == 0 and out[2]["hit_terms"] == ""
    assert out[3]["block_hits"] == 3 and out[3]["hit_terms"] == "pills"
    assert not out[3]["passed"]
    assert out[4]["passed"]
    with pytest.raises(ValueError, match="non-empty"):
        blocklist_gate(docs, "text", "doc_id", blocklist=())


def test_chunk_retrieve_topk_ranks_relevant_chunks_first(spark):
    from clickhouse_mysql_data_reader_spark.operators.text import chunk_retrieve_topk

    docs = spark.createDataFrame(
        [
            (1, "vector stream join " * 4),       # pure query words
            (2, "scan filter merge batch " * 4),  # none
            (3, "vector scan filter merge stream batch row column " * 2),  # some
        ],
        "doc_id long, text string",
    )
    out = chunk_retrieve_topk(docs, "vector stream join", k=3).collect()
    assert [r["doc_id"] for r in out] == [1, 3, 2]
    assert out[0]["score_x1e6"] > out[1]["score_x1e6"] > out[2]["score_x1e6"] == 0
    with pytest.raises(ValueError, match="query must contain tokens"):
        chunk_retrieve_topk(docs, "   ")


def test_bpe_pretokens_pieces_and_bounds(spark):
    from clickhouse_mysql_data_reader_spark.operators.text import (
        bpe_pretoken_count,
        bpe_pretokens,
        token_count,
    )

    rows = [
        # contractions split off; digits split SINGLY; punct runs as one
        (1, "Don't stop... v2.0 costs $1,234!!"),
        (2, "plain words only here"),
        (3, "a"),
        # standalone apostrophes (not followed by a letter) must still
        # count as pieces or the >=-whitespace-tokens bound breaks
        (4, "don ' t said 'the voice'"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            bpe_pretokens(F.col("text")).alias("pieces"),
            bpe_pretoken_count(F.col("text")).alias("n"),
            token_count(F.col("text")).alias("ws"),
        ).collect()
    }
    # normalize_text lowercases; each digit is its own piece, each
    # punctuation RUN is one piece, "don't" -> don + 't
    assert out[1]["pieces"] == [
        "don", "'t", "stop", "...", "v", "2", ".", "0",
        "costs", "$", "1", ",", "2", "3", "4", "!!",
    ]
    assert out[2]["pieces"] == ["plain", "words", "only", "here"]
    assert out[4]["pieces"] == [
        "don", "'", "t", "said", "'the", "voice", "'",
    ]
    # every whitespace token yields >= 1 piece: pretoken count is an
    # upper bound on the whitespace count and on true BPE tokens
    for r in out.values():
        assert r["n"] == len(r["pieces"]) >= r["ws"]


def test_blocklist_gate_null_and_empty_text_pass(spark):
    from clickhouse_mysql_data_reader_spark.operators.text import (
        blocklist_gate,
        blocklist_pass_expr,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "clean words"), (3, "buy viagra now")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in blocklist_gate(docs, "text", "doc_id").collect()}
    # NULL text: zero tokens, zero hits, PASSES (it contains nothing) —
    # not the silent -1/-1/fail the legacy sizeOfNull produced
    assert (out[1]["n_tokens"], out[1]["block_hits"], out[1]["passed"]) == (0, 0, True)
    assert out[1]["block_ratio"] == 0.0 and out[1]["hit_terms"] == ""
    assert out[2]["passed"] is True
    assert out[3]["passed"] is False and out[3]["hit_terms"] == "viagra"

    flags = docs.select(
        "doc_id", blocklist_pass_expr(F.col("text"), ("viagra",)).alias("ok")
    ).collect()
    assert {r["doc_id"]: r["ok"] for r in flags} == {1: True, 2: True, 3: False}


def test_lang_id_multi_argmax_mixed_and_unk(spark):
    from clickhouse_mysql_data_reader_spark.operators.text import lang_id_multi

    rows = [
        (1, "the cat is in the house and it is warm"),            # en
        (2, "le chat est dans la maison et les oiseaux"),         # fr
        (3, "der Hund ist nicht mit der Katze und die Maus"),     # de
        (4, "el perro y el gato es en la casa"),                  # es (la/el/de overlap fr)
        (5, "the cat le chat the dog le chien in dans"),          # mixed en/fr
        (6, "zzz qqq www xxx yyy"),                               # unk
        (7, None),                                                # null -> unk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["lid"]
        for r in df.select(
            "doc_id", lang_id_multi(F.col("text")).alias("lid")
        ).collect()
    }
    assert out[1]["lang"] == "en" and not out[1]["is_mixed"]
    assert out[2]["lang"] == "fr"
    assert out[3]["lang"] == "de" and not out[3]["is_mixed"]
    assert out[4]["lang"] == "es"
    assert out[5]["is_mixed"] and out[5]["lang"] in ("en", "fr")
    assert out[6]["lang"] == "unk"
    assert out[7]["lang"] == "unk" and out[7]["is_mixed"] is False

    with pytest.raises(ValueError, match="no language families"):
        lang_id_multi(F.col("text"), {})
