"""Byte-pair-encoding tokenizer training and application.

The training-data pipeline's tokenizer step, Spark-shaped the way real
BPE trainers work (Sennrich et al., ACL'16; HF tokenizers): the ONLY
corpus-scale operation is the word-frequency count — one groupBy over
exploded tokens with map-side combine, the same plan as ``vocab_topk``
— because BPE merges are a function of the word-frequency table alone,
not of the raw corpus. At 100 TB the count shuffles distinct words
(natural-language vocab, millions of rows), and the iterative merge
training runs on that small table; this module keeps the trainer
driver-side behind an explicit size guard (the same bounded-metadata
class as the k-means centroid collect — a word-freq table IS tokenizer
metadata), deterministic end-to-end:

- pair counts are exact integers from the word table,
- argmax tie-breaks are (count desc, pair lexicographic),
- so the merge list is identical across runs, partitionings, engines.

Application (``bpe_apply``) re-encodes documents with the learned
merges: an Arrow-batched mapInPandas (per-row Python is unavoidable —
greedy merge-priority encoding is inherently sequential per token) with
the merge ranks shipped once via broadcast.

Reference scope note: the reference pipeline has no tokenizer (it
ships rows, not tokens); this belongs to the training-data extension
surface (SURVEY north-star), next to vocab_topk / pack_sequences.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.text import tokens
from clickhouse_mysql_data_reader_spark.util import fan_out, self_contained_pickle

# marks the end of a word (Sennrich-style), so merges never cross word
# boundaries and a word-final symbol differs from the same bytes mid-word
EOW = "</w>"

# word-frequency rows the driver-side trainer accepts before demanding
# an explicit cap: ~1M rows of short strings is tens of MB — the same
# bounded-driver-metadata budget as a broadcast dim table
MAX_WORD_ROWS = 1_000_000


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) corpus word-frequency table — the single corpus-scale
    pass of BPE training (shared ``text.token_counts`` core, so the
    vocab_topk and BPE plans cannot drift)."""
    from clickhouse_mysql_data_reader_spark.operators.text import token_counts

    return token_counts(df, text_col, out_col="word")


def _word_symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _pairs_of(syms: tuple[str, ...]):
    return zip(syms, syms[1:])


def train_merges(word_freq: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Deterministic BPE merge training over a (word, count) table.

    Pure Python on the vocab-sized table, with the standard trainer
    optimization: pair counts and a pair -> words index are maintained
    INCREMENTALLY, so each round touches only the words containing the
    merged pair instead of recounting the whole vocab (naive recounting
    is O(n_merges x vocab) — hours of driver time at the 1M-word /
    1000-merge envelope this module allows). Each round merges the
    argmax pair (ties: lexicographically smallest pair); stops early
    when no pair occurs twice."""
    words: dict[int, tuple[str, ...]] = {}
    counts_by_word: dict[int, int] = {}
    seen: dict[tuple[str, ...], int] = {}
    for w, n in word_freq:
        syms = _word_symbols(w)
        if not syms:
            continue
        if syms in seen:
            counts_by_word[seen[syms]] += int(n)
        else:
            wid = len(words)
            seen[syms] = wid
            words[wid] = syms
            counts_by_word[wid] = int(n)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, syms in words.items():
        n = counts_by_word[wid]
        for p in _pairs_of(syms):
            pair_counts[p] = pair_counts.get(p, 0) + n
            pair_words.setdefault(p, set()).add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wid in list(pair_words.get(best, ())):
            syms = words[wid]
            n = counts_by_word[wid]
            # retract the old word's pair contributions...
            for p in _pairs_of(syms):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wid)
                    if not ws:
                        pair_words.pop(p, None)
            # ...rewrite it with the merge applied...
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_syms = tuple(out)
            words[wid] = new_syms
            # ...and add the new form's contributions back
            for p in _pairs_of(new_syms):
                pair_counts[p] = pair_counts.get(p, 0) + n
                pair_words.setdefault(p, set()).add(wid)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 1000,
    max_word_rows: int = MAX_WORD_ROWS,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Spark does the corpus-scale part (``word_frequencies``); the merge
    loop runs driver-side on the collected vocab table behind a size
    guard — raise ``max_word_rows`` deliberately (with the memory
    math) or pre-filter rare words (``HAVING n >= k``, the standard
    trainer trick) when a corpus's vocab exceeds it.

    The guard is applied by collecting at most ``max_word_rows + 1``
    rows (one job; driver memory stays bounded by the cap even on an
    over-limit corpus) — a separate count() would re-execute the
    corpus-scale aggregation a second time just to check the size."""
    rows = word_frequencies(df, text_col).limit(max_word_rows + 1).collect()
    if len(rows) > max_word_rows:
        raise ValueError(
            f"word-frequency table exceeds max_word_rows={max_word_rows}; "
            "pre-filter rare words (e.g. n >= 2) or raise the cap "
            "explicitly"
        )
    freq = [(r["word"], r["n"]) for r in rows]
    freq.sort()  # collect order is partition-dependent; training is not
    return train_merges(freq, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy merge-priority BPE encode of one word (the standard
    inference loop: repeatedly merge the best-ranked adjacent pair)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_apply(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(doc_id, n_bpe_tokens, bpe_tokens) per document under the learned
    merges — ``bpe_tokens`` is the space-joined symbol stream, the
    exact token budget ``pack_sequences`` wants instead of its
    whitespace estimate.

    Arrow-batched mapInPandas; the merge ranks ship once per executor
    via broadcast (not closure bytes). Per-row Python is unavoidable
    here — greedy rank-priority merging is sequential per word — but
    each batch amortizes it over thousands of rows, and the normalize/
    split stays JVM-side. NULL text encodes as zero tokens (CDC-fed
    corpora routinely carry NULLs); the id column keeps its input type.
    """
    self_contained_pickle(sys.modules[__name__])
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast({p: i for i, p in enumerate(merges)})

    # NULL-safe JVM-side: coalesce to empty text so the worker never
    # sees a None token array
    prepared = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("tk"),
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("n_bpe_tokens", T.LongType()),
            T.StructField("bpe_tokens", T.StringType()),
        ]
    )

    def encode_batches(batches):
        ranks = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out_n, out_toks = [], []
            for tk in pdf["tk"]:
                doc_syms: list[str] = []
                for w in tk:
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    doc_syms.extend(enc)
                out_n.append(len(doc_syms))
                out_toks.append(" ".join(doc_syms))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bpe_tokens": out_n, "bpe_tokens": out_toks}
            )

    return prepared.mapInPandas(encode_batches, out_schema)
