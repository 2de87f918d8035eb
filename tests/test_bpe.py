"""BPE tokenizer (text/bpe.py): Sennrich-reference training parity,
greedy encoding laws, distributed application."""

from __future__ import annotations

import pickle
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cuml_spark.text import (BPEModel, bpe_tokenize, train_bpe,
                             train_bpe_from_counts)
from cuml_spark.text.bpe import END_OF_WORD


def _reference_bpe(word_counts, n_merges, min_frequency=2):
    """Independent reimplementation of Sennrich's pseudocode (the
    published reference algorithm), used to pin the operator."""
    vocab = {tuple(w) + (END_OF_WORD,): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < min_frequency:
            break
        (a, b), _n = best
        merges.append((a, b))
        out = {}
        for syms, c in vocab.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            out[tuple(ns)] = out.get(tuple(ns), 0) + c
        vocab = out
    return merges


def test_train_bpe_matches_sennrich_example():
    """The classic low/lower/newest/widest corpus: first merges must
    pick the most frequent pairs with deterministic tie-breaks, and the
    trained encoder must reproduce replay-the-merges tokenization."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    model = train_bpe_from_counts(counts, 10, min_frequency=2)
    ref = _reference_bpe(counts, 10)
    assert model.merges == ref
    # 'es' (9) then 'est' (9) are the classic first merges
    assert model.merges[0] == ("e", "s")
    assert model.merges[1] == ("es", "t")
    # encoding a trained word uses the merges; an unseen word falls
    # back toward characters
    enc = model.encode_word("newest")
    assert "".join(enc) == "newest" + END_OF_WORD
    assert len(enc) == 1  # freq-6 word fully merges within 10 merges
    chars = model.encode_word("zzq")
    assert chars == ["z", "z", "q", END_OF_WORD]


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    words=st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1, max_size=12),
    n_merges=st.integers(min_value=0, max_value=15),
)
def test_train_bpe_matches_reference_for_any_table(words, n_merges):
    """For ANY word table the learned merge sequence equals the
    published reference algorithm's (including tie-breaks and the
    min-frequency stop)."""
    model = train_bpe_from_counts(words, n_merges)
    assert model.merges == _reference_bpe(words, n_merges)
    # encoding law: concatenating any word's encoding reconstructs it
    for w in words:
        assert "".join(model.encode_word(w)) == w + END_OF_WORD


def test_train_and_tokenize_distributed(spark):
    """End-to-end over a DataFrame: the distributed word count feeds
    training; bpe_tokenize encodes every doc map-only with per-word
    consistency; null/empty docs degrade to 0/0/null."""
    rows = [
        (0, "low low low low low lower lower"),
        (1, "newest newest newest newest newest newest"),
        (2, "widest widest widest"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_bpe(df, n_merges=10)
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert model.merges == _reference_bpe(counts, 10)
    out = {r["doc_id"]: r for r in bpe_tokenize(df, model).collect()}
    assert out[0]["n_words"] == 7
    enc_low = model.encode_word("low")
    enc_lower = model.encode_word("lower")
    assert out[0]["n_bpe_tokens"] == 5 * len(enc_low) + 2 * len(enc_lower)
    assert out[0]["bpe_tokens"][:len(enc_low)] == enc_low
    assert out[3]["n_bpe_tokens"] == 0 and out[3]["bpe_tokens"] is None
    assert out[4]["n_bpe_tokens"] == 0 and out[4]["bpe_tokens"] == []
    # model round-trips through pickle (broadcast/persistence contract)
    m2 = pickle.loads(pickle.dumps(model))
    assert m2.merges == model.merges and m2.vocab == model.vocab


def test_corpus_word_counts_cap_is_deterministic(spark):
    """Above the cap only the most frequent words survive, ties broken
    by the word text — the fit_bigram_lm bounded-driver contract."""
    from cuml_spark.text import corpus_word_counts

    df = spark.createDataFrame(
        [(0, "aa aa bb bb cc dd")], "doc_id long, text string")
    got = corpus_word_counts(df, max_words=3)
    assert got == {"aa": 2, "bb": 2, "cc": 1}  # cc beats dd lexically
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe_from_counts({"a": 1}, -1)


import pytest as _pytest

from tests.conftest import quality_param, unit_param


@_pytest.mark.parametrize("n_docs", [unit_param(2000), quality_param(20000)])
def test_fuzzy_contamination_recall_at_scale(spark, n_docs):
    """Planted-leak recall of fuzzy_cross_contamination beyond the
    500-doc fixture: every 40th corpus doc is a one-word-appended copy
    of a reference doc (char-5-gram Jaccard ≈ 0.95); with b=4 bands,
    r=4 rows the per-pair candidate probability is 1−(1−0.95⁴)⁴ ≈
    0.9997, so ≥95% flagged recall is a conservative floor — and zero
    unplanted docs may flag at threshold 0.9."""
    from pyspark.sql import functions as F

    from cuml_spark.text import fuzzy_cross_contamination

    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body text "),
            *[F.conv(F.xxhash64("id", F.lit(s)).cast("string"), 10, 16)
              for s in range(8)],
        ).alias("text"),
    )
    refs = base.filter(F.col("doc_id") % 40 == 0)
    planted = base.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + n_docs).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailer")).alias("text"),
    )
    corpus = base.unionAll(planted)
    out = {r["doc_id"]: r["first_ref_id"]
           for r in fuzzy_cross_contamination(
               corpus, refs, threshold=0.9).collect()}
    planted_ids = set(range(n_docs, 2 * n_docs, 40))
    flagged_planted = {d for d in out if d in planted_ids}
    recall = len(flagged_planted) / len(planted_ids)
    assert recall >= 0.95, recall
    # witnesses are the planted docs' own sources
    assert all(out[d] == d - n_docs for d in flagged_planted)
    # precision at this threshold: nothing unplanted flags (the
    # originals themselves flag only if some ref is near-identical to
    # them — by construction refs ⊂ corpus with same ids, excluded)
    assert not {d for d in out if d not in planted_ids}
