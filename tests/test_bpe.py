"""BPE merge learning vs a pure-Python reference implementation of the
published algorithm (Sennrich et al. 2016), same tie-break rules."""

from __future__ import annotations

import re
from collections import Counter

from healthcare_data_warehouse_spark.operators.bpe import (
    bpe_segment,
    learn_bpe_merges,
)
from conftest import SF_SMOKE


def _ref_bpe(texts: list[str], num_merges: int):
    """Reference BPE: word-type vocab, argmax pair by (count desc, pair
    lexicographic asc), left-to-right non-overlapping merge."""
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                vocab[w] += 1
    symtab = {w: list(w) + ["</w>"] for w in vocab}
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for w, cnt in vocab.items():
            syms = symtab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        merges.append((rank, left, right, n))
        for w in symtab:
            syms, out = symtab[w], []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symtab[w] = out
    return merges, symtab, vocab


def test_learn_bpe_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "low new low wide wider widest",
        "the the the them theme",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = learn_bpe_merges(df, num_merges=10, checkpoint_every=3)
    want, _, _ = _ref_bpe(texts, 10)
    assert got == want


def test_learn_bpe_on_corpus_deterministic(spark):
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    a = learn_bpe_merges(docs, num_merges=4)
    b = learn_bpe_merges(docs.repartition(13), num_merges=4)
    assert a == b and len(a) == 4
    texts = [r["text"] for r in docs.select("text").collect()]
    want, _, _ = _ref_bpe(texts, 4)
    assert a == want


def test_bpe_segment_matches_reference_token_counts(spark):
    texts = ["low lower lowest", "new newer lowest low"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    merges = learn_bpe_merges(df, num_merges=5)
    got = {r["doc_id"]: (r["n_subwords"], r["n_sym_chars"])
           for r in bpe_segment(df, merges).collect()}

    _, symtab, _ = _ref_bpe(texts, 5)
    for doc_id, t in enumerate(texts):
        words = [w for w in re.split(r"\s+", t.strip()) if w]
        n_sub = sum(len(symtab[w]) for w in words)
        n_chars = sum(len(s) for w in words for s in symtab[w])
        assert got[doc_id] == (n_sub, n_chars)
