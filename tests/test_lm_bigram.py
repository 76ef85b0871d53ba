"""Bigram stupid-backoff LM surprisal: pure-python reference cross-
check, the order-sensitivity property unigram lacks, doc-start/backoff
accounting, empty docs, and the overflow guard."""

from __future__ import annotations

from collections import Counter

import pytest

from clickhouse_mysql_data_reader_spark.operators.text import (
    lm_surprisal,
    lm_surprisal_bigram,
)

REF = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat sat on the rug",
]
SCALE = 1_000_000


def _mk(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _py_reference(doc_texts, ref_texts):
    """Same integer arithmetic, driver-side: stupid backoff alpha=0.4
    as *5 div 2 on the add-one unigram inverse."""
    uni = Counter(t for s in ref_texts for t in s.lower().split())
    big = Counter()
    for s in ref_texts:
        tk = s.lower().split()
        big.update(zip(tk[:-1], tk[1:]))
    n, v = sum(uni.values()), len(uni)
    db = n + v
    out = {}
    for i, s in enumerate(doc_texts):
        tk = s.lower().split()
        if not tk:
            continue
        tot = oov = backoff = 0
        for j, cur in enumerate(tk):
            prev = tk[j - 1] if j else ""
            if uni[cur] == 0:
                oov += 1
            uinv = SCALE * db // (uni[cur] + 1)
            if prev and big[(prev, cur)] > 0:
                inv = SCALE * uni[prev] // big[(prev, cur)]
            elif prev == "":
                inv = uinv
            else:
                backoff += 1
                inv = uinv * 5 // 2
            tot += inv
        out[i] = (len(tk), oov, backoff, tot / (len(tk) * SCALE))
    return out


def test_bigram_matches_python_reference(spark):
    docs = [
        "the cat sat on the mat",
        "mat the on sat cat the",  # scrambled: full backoff
        "the zebra sat",  # oov token
        "",
        "solo",
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["n_backoff"], r["surprisal"])
        for r in lm_surprisal_bigram(_mk(spark, docs), _mk(spark, REF, 100)).collect()
    }
    want = _py_reference(docs, REF)
    assert set(got) == set(want)  # empty doc 3 absent on both sides
    for i in want:
        assert got[i][:3] == want[i][:3], f"counts doc {i}"
        assert got[i][3] == pytest.approx(want[i][3], rel=1e-12), f"surprisal doc {i}"


def test_bigram_punishes_scrambled_order_where_unigram_cannot(spark):
    docs = _mk(spark, ["the cat sat on the mat", "mat the on sat cat the"])
    ref = _mk(spark, REF, 100)
    uni = {r["doc_id"]: r["surprisal"] for r in lm_surprisal(docs, ref).collect()}
    big = {r["doc_id"]: r["surprisal"] for r in lm_surprisal_bigram(docs, ref).collect()}
    assert uni[0] == uni[1]  # same token multiset: unigram is blind
    assert big[1] > big[0] * 2  # bigram sees the scrambled order


def test_single_token_doc_takes_plain_unigram_no_penalty(spark):
    """A doc-start token never had a bigram to miss — its score equals
    the unigram surprisal exactly (no alpha backoff penalty)."""
    docs = _mk(spark, ["solo"])
    ref = _mk(spark, REF, 100)
    u = lm_surprisal(docs, ref).collect()[0]
    b = lm_surprisal_bigram(docs, ref).collect()[0]
    assert b["n_backoff"] == 0
    assert b["surprisal"] == u["surprisal"]


def test_bigram_overflow_guard_raises(spark):
    docs, ref = _mk(spark, ["the cat"]), _mk(spark, REF, 100)
    out = lm_surprisal_bigram(docs, ref, scale=1 << 62)
    with pytest.raises(Exception, match="out of range"):
        out.collect()


def test_ccnet_buckets_labels_and_laziness(spark):
    """Buckets split the corpus ~in thirds by surprisal; thresholds stay
    in-plan (no job at build time); approx path returns the same labels
    on a tiny corpus; cut validation raises."""
    from clickhouse_mysql_data_reader_spark.operators.text import ccnet_buckets

    texts = [
        "the cat sat on the mat",          # common tokens -> head-ish
        "the dog sat on the rug",
        "the cat sat on the rug today",
        "zxqv plmk wrtn qqzz vbnm xkcd",   # gibberish -> tail
        "the dog ran to the mat quickly",
        "the cat and the dog sat",
    ]
    docs = _mk(spark, texts)

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = ccnet_buckets(docs)
    assert len(tracker.getJobIdsForGroup(None) or []) == before, "must stay lazy"

    rows = {r["doc_id"]: r["bucket"] for r in out.collect()}
    assert rows[3] == "tail", "gibberish lands in the tail band"
    from collections import Counter

    c = Counter(rows.values())
    assert c["head"] >= 1 and c["middle"] >= 1 and c["tail"] >= 1

    approx = {
        r["doc_id"]: r["bucket"]
        for r in ccnet_buckets(docs, approx=True).collect()
    }
    assert approx[3] == "tail"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="cuts"):
        ccnet_buckets(docs, cuts=(0.7, 0.3))


def test_frozen_models_match_derived(spark):
    """counts= / model= (the frozen-estimator reuse, DSIR-style) score
    identically to the derived-in-plan reference pass, and a NEW batch
    scores deterministically against the frozen model with no reference
    frame in sight."""
    from clickhouse_mysql_data_reader_spark.operators.text import (
        ccnet_buckets,
        lm_bigram_model,
        token_counts,
    )

    ref = _mk(spark, REF, 100)
    docs = _mk(spark, ["the cat sat on the mat", "zxqv plmk wrtn"])

    frozen_uni = token_counts(ref, "text")
    a = sorted(map(tuple, lm_surprisal(docs, ref).collect()))
    b = sorted(map(tuple, lm_surprisal(docs, None, counts=frozen_uni).collect()))
    assert a == b

    frozen_big = lm_bigram_model(ref, "text")
    c = sorted(map(tuple, lm_surprisal_bigram(docs, ref).collect()))
    d = sorted(map(tuple, lm_surprisal_bigram(docs, None, model=frozen_big).collect()))
    assert c == d

    batch2 = _mk(spark, ["the dog sat on the mat"], start=50)
    x = lm_surprisal_bigram(batch2, None, model=frozen_big).collect()
    y = lm_surprisal_bigram(batch2, None, model=frozen_big).collect()
    assert sorted(map(tuple, x)) == sorted(map(tuple, y))

    # frozen ccnet thresholds: labels follow the supplied cut values,
    # not the batch's own distribution
    lab = {
        r["doc_id"]: r["bucket"]
        for r in ccnet_buckets(
            docs, counts=frozen_uni, thresholds=(5.0, 20.0)
        ).collect()
    }
    # fluent ~6.75 mean inverse-prob (between cuts), all-OOV = N+V = 25
    assert lab[0] == "middle" and lab[1] == "tail"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="reference corpus or a frozen"):
        lm_surprisal(docs, None)
    with _pytest.raises(ValueError, match="reference corpus or a frozen"):
        lm_surprisal_bigram(docs, None)
