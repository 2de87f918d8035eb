"""Byte-pair-encoding tokenizer: distributed training-data collection,
driver-side merge learning, distributed application (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

The scale insight production BPE trainers use: training needs only the
WORD FREQUENCY TABLE, never the corpus — a 100 TB corpus collapses to
its distinct words (bounded further by ``max_words``) in one map-side-
combined count shuffle, and the merge loop runs driver-side over that
bounded table.  Application is embarrassingly parallel: the learned
merge ranks broadcast to executors and an Arrow-vectorized UDF encodes
each document in-row with a per-word memo (web text repeats words
heavily, so the memo turns per-word merge loops into dict hits).

Determinism: merge selection breaks frequency ties on the
lexicographically smallest pair, so the same word table always yields
the same merge sequence; the word-table cap keeps the most frequent
words with ties broken by the word itself.  No randomness anywhere.

Not in the cuML reference (dense-matrix data model); first-class here
like the dedup tier.  The harness registers the merge table as a
rows-only query (BPE training is iterative — not SQL-expressible; the
python-reference parity lives in tests/test_bpe.py instead).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from cuml_spark.text.lm import _token_array

END_OF_WORD = "</w>"


@dataclass
class BPEModel:
    """Learned merge list (in rank order) + the symbol vocabulary.
    Picklable/broadcastable; ``merge_ranks`` rebuilds lazily after
    unpickling."""

    merges: list[tuple[str, str]] = field(repr=False)
    vocab: list[str] = field(repr=False)
    token_sep: str = " "

    def merge_ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}

    def encode_word(self, word: str,
                    ranks: dict[tuple[str, str], int] | None = None
                    ) -> list[str]:
        """Greedy lowest-rank-first merging — the standard BPE encoder
        (equivalent to replaying the merges in learned order)."""
        if ranks is None:
            ranks = self.merge_ranks()
        syms = list(word) + [END_OF_WORD]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms


def word_count_table(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    token_sep: str = " ",
    max_words: int | None = 100_000,
) -> DataFrame:
    """→ (word, count): the (capped) word frequency table — the ONLY
    corpus pass BPE training needs, as a DataFrame so the distributed
    stage is independently checkable (the driver's DuckDB oracle runs
    it via the ``bpe_word_counts`` harness query).  One map-side-combined
    count shuffle; above the cap only the ``max_words`` most frequent
    words survive (count desc, ties broken by the word ascending —
    deterministic; Spark plans the cut as TakeOrderedAndProject)."""
    wc = (
        corpus.select(
            F.explode(_token_array(text_col, token_sep)).alias("word"))
        .groupBy("word").agg(F.count("*").alias("count"))
    )
    if max_words is not None:
        wc = wc.orderBy(F.col("count").desc(), F.col("word").asc()).limit(
            int(max_words))
    return wc


def corpus_word_counts(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    token_sep: str = " ",
    max_words: int | None = 100_000,
) -> dict[str, int]:
    """Collect :func:`word_count_table` to the driver dict the merge
    loop consumes — bounded to ``max_words`` rows by construction,
    the same driver-memory contract as ``fit_bigram_lm``'s bigram cap."""
    wc = word_count_table(
        corpus, text_col=text_col, token_sep=token_sep, max_words=max_words)
    return {r["word"]: r["count"] for r in wc.collect()}


def train_bpe_from_counts(
    word_counts: dict[str, int],
    n_merges: int,
    *,
    min_frequency: int = 2,
    token_sep: str = " ",
) -> BPEModel:
    """Sennrich's algorithm over a word frequency table: repeatedly
    merge the most frequent adjacent symbol pair (ties → lexicographic
    smallest pair) until ``n_merges`` merges or no pair reaches
    ``min_frequency``.  Pure driver loop over the bounded table."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    words: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        key = tuple(w) + (END_OF_WORD,)
        words[key] = words.get(key, 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_frequency:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == best[0] and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + c
        words = new_words
    base = sorted({s for w in word_counts for s in w} | {END_OF_WORD})
    vocab = base + [a + b for a, b in merges]
    return BPEModel(merges=merges, vocab=vocab, token_sep=token_sep)


def train_bpe(
    corpus: DataFrame,
    n_merges: int = 200,
    *,
    text_col: str = "text",
    token_sep: str = " ",
    max_words: int | None = 100_000,
    min_frequency: int = 2,
) -> BPEModel:
    """Distributed word counting + driver merge learning — see module
    docstring for the scale contract."""
    counts = corpus_word_counts(
        corpus, text_col=text_col, token_sep=token_sep, max_words=max_words)
    return train_bpe_from_counts(
        counts, n_merges, min_frequency=min_frequency, token_sep=token_sep)


def bpe_tokenize(
    df: DataFrame,
    model: BPEModel,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id_col, n_words, n_bpe_tokens, bpe_tokens): encode every
    document with the broadcast model — map-only, one corpus scan, zero
    shuffle; the Arrow UDF memoizes per-word encodings inside each
    batch (web text repeats words heavily).  Null text → 0/0/null;
    words with unseen characters fall back to character symbols (the
    merge loop simply finds no applicable ranks)."""
    bc = df.sparkSession.sparkContext.broadcast(model)

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(tok_arrays: pd.Series) -> pd.Series:
        m = bc.value
        ranks = m.merge_ranks()
        memo: dict[str, list[str]] = {}
        out = []
        for toks in tok_arrays:
            if toks is None:
                out.append(None)
                continue
            enc: list[str] = []
            for w in toks:
                e = memo.get(w)
                if e is None:
                    e = m.encode_word(w, ranks)
                    memo[w] = e
                enc.extend(e)
            out.append(enc)
        return pd.Series(out)

    toks = _token_array(text_col, model.token_sep)
    return df.select(
        F.col(id_col),
        F.coalesce(F.size(toks), F.lit(0)).cast("long").alias("n_words"),
        _encode(toks).alias("__bt"),
    ).select(
        id_col, "n_words",
        F.coalesce(F.size("__bt"), F.lit(0)).cast("long")
        .alias("n_bpe_tokens"),
        F.col("__bt").alias("bpe_tokens"),
    )
