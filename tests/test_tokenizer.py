"""BPE tokenizer-training operator (operators/tokenizer.py, q194): rules
pinned against an independent pure-Python BPE reference, fertility payoff
invariants, determinism under repartitioning."""

from __future__ import annotations

from collections import Counter

from inspectadb_spark.operators.tokenizer import bpe_encode, bpe_merges
from tests.conftest import SF_DIR


def _ref_bpe(word_freqs: dict[str, int], n_merges: int,
             min_pair_freq: int = 2):
    """Independent reference: Sennrich-style BPE on a word-frequency dict
    with (freq DESC, left ASC, right ASC) selection and greedy
    non-overlapping left-to-right merges."""
    wf = [(list(w), f) for w, f in sorted(word_freqs.items())]
    rules = []
    for rank in range(1, n_merges + 1):
        counts = Counter()
        for syms, f in wf:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), pf = min(counts.items(),
                         key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if pf < min_pair_freq:
            break
        rules.append((rank, l, r, l + r, pf))
        new_wf = []
        for syms, f in wf:
            acc = [syms[0]] if syms else []
            for x in syms[1:]:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            new_wf.append((acc, f))
        wf = new_wf
    return rules


def _word_freqs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wf = Counter()
    for row in docs.select("text").collect():
        for w in row["text"].split(" "):
            if w:
                wf[w] += 1
    return docs, wf


def test_bpe_merges_match_python_reference(spark):
    docs, wf = _word_freqs(spark)
    want = _ref_bpe(wf, 8)
    got = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
           for r in bpe_merges(docs, n_merges=8).orderBy("rank").collect()]
    assert got == want


def test_bpe_merges_partition_invariant(spark):
    docs, _ = _word_freqs(spark)
    a = [tuple(r) for r in bpe_merges(docs, n_merges=5).orderBy("rank").collect()]
    b = [tuple(r) for r in
         bpe_merges(docs.repartition(13), n_merges=5).orderBy("rank").collect()]
    assert a == b


def test_bpe_encode_fertility_payoff(spark):
    docs, wf = _word_freqs(spark)
    rules = [(r["left"], r["right"]) for r in
             bpe_merges(docs, n_merges=6).orderBy("rank").collect()]
    enc = bpe_encode(docs, rules).collect()
    assert len(enc) == docs.count()
    total_char = sum(r["n_syms_char"] for r in enc)
    total_bpe = sum(r["n_syms_bpe"] for r in enc)
    # chars per word sanity vs the python word table
    assert total_char == sum(len(w) * f for w, f in wf.items())
    # every merge strictly reduces corpus symbols; 6 high-freq rules must
    # cut at least 6 symbols total and never increase any doc
    assert total_bpe < total_char
    assert all(r["n_syms_bpe"] <= r["n_syms_char"] for r in enc)


def test_bpe_greedy_nonoverlapping_merge(spark):
    # 'aaa' + rule (a,a): greedy left-to-right -> [aa, a], never [a, aa] or [aa, aa]
    df = spark.createDataFrame([(1, "aaa aaa b")], "doc_id long, text string")
    rules = bpe_merges(df, n_merges=1, min_pair_freq=1).collect()
    assert [(r["left"], r["right"], r["pair_freq"]) for r in rules] == [("a", "a", 4)]
    enc = bpe_encode(df, [("a", "a")]).collect()[0]
    # each 'aaa' -> [aa, a]: 2 syms; 'b' -> 1; total 5 from 7 chars
    assert enc["n_syms_char"] == 7 and enc["n_syms_bpe"] == 5
