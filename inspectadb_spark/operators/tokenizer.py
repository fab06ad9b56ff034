"""BPE tokenizer training support (SURVEY.md §2.2i extension): learn
byte-pair-encoding merge rules from the corpus, Spark-first.

The scale insight (Sennrich et al. 2016's own formulation): BPE trains on
the WORD-FREQUENCY table, not the corpus. The corpus pays exactly ONE
token aggregation (Heaps'-law-small result); every merge iteration then
runs on that small table — adjacent-pair counting, one top-1 pick, one
array rewrite — so n_merges iterations never rescan raw text. The driver
moves one row per iteration (the chosen pair: a model-sized collect).

Determinism: pair selection orders by (freq DESC, left ASC, right ASC) —
an explicit total order, no hash-map iteration arbitrariness — and the
merge rewrite is the standard greedy non-overlapping left-to-right fold,
expressed as a JVM-side ``aggregate()`` higher-order fold (no Python in
the loop). Results are engine/run/partition invariant; the property test
pins them against an independent pure-Python BPE reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """(syms: array<string> of characters, freq) — one corpus shuffle."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(F.expr("split(w, '')").alias("syms"), "freq")
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent symbol-pair frequencies over the word table."""
    return (
        wf.filter(F.size("syms") >= 2)
        .select(
            F.expr("explode(transform(sequence(1, size(syms) - 1),"
                   " i -> struct(element_at(syms, i) AS l,"
                   "             element_at(syms, i + 1) AS r)))").alias("p"),
            "freq",
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("pf"))
    )


def _fold_expr(l: str, r: str) -> str:
    l_lit = l.replace("\\", "\\\\").replace("'", "\\'")
    r_lit = r.replace("\\", "\\\\").replace("'", "\\'")
    return (
        "CASE WHEN size(syms) >= 2 THEN"
        " aggregate(slice(syms, 2, size(syms) - 1), array(element_at(syms, 1)),"
        " (acc, x) -> CASE WHEN element_at(acc, -1) = '{l}' AND x = '{r}'"
        " THEN concat(slice(acc, 1, size(acc) - 1), array('{l}{r}'))"
        " ELSE concat(acc, array(x)) END) ELSE syms END"
    ).format(l=l_lit, r=r_lit)


def _merge_pair(wf: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy non-overlapping left-to-right merge of (left, right) in every
    word — the shared ``_fold_expr`` codegen fold, no Python."""
    return wf.select(F.expr(_fold_expr(left, right)).alias("syms"), "freq")


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from the corpus.

    Returns one row per learned rule: (rank, left, right, merged,
    pair_freq) in learning order. Stops early if no pair reaches
    ``min_pair_freq``.
    """
    spark = docs.sparkSession
    wf = _word_freqs(docs, text_col).localCheckpoint(eager=True)
    rules = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(wf)
            .orderBy(F.desc("pf"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pf"] < min_pair_freq:
            break
        l, r, pf = top[0]["l"], top[0]["r"], int(top[0]["pf"])
        rules.append((rank, l, r, l + r, pf))
        # cut lineage each round: the fold expression would otherwise nest
        wf = _merge_pair(wf, l, r).localCheckpoint(eager=True)
    return spark.createDataFrame(
        rules, "rank int, left string, right string, merged string,"
               " pair_freq bigint")


def bpe_encode(docs: DataFrame, rules: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply learned merge rules to the corpus and report the fertility
    payoff per document: (id, n_words, n_syms_char, n_syms_bpe).

    Rule application is the same greedy fold, chained in learning order
    as stacked column rewrites. r13 shape: the encoding of a word is a
    pure function of the WORD, so the interpreted fold chain runs once
    per DISTINCT word — the same Heaps'-law-small table the training
    loop exploits — instead of once per word INSTANCE (guide §2.3:
    shrink the expensive operator's input to its value domain). The
    per-word symbol counts broadcast back onto the instance stream, so
    the corpus still pays exactly one shuffle (the per-doc rollup) and
    the per-instance work is a broadcast hash probe instead of an
    8-deep interpreted array fold. Values are identical: the fold is
    deterministic per word, and the rollup sums the same per-instance
    counts. For large rule sets (real tokenizers: 32k merges) the
    per-word encode is where you would switch to a broadcast trie +
    mapInPandas — the TRAINING loop above is the part that must stay
    distributed.
    """
    inst = (
        docs.select(F.col(id_col),
                    F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    vocab = (
        inst.select("w").distinct()
        .select("w", F.expr("split(w, '')").alias("syms"))
        .withColumn("n_char", F.size("syms"))
    )
    out = vocab
    for l, r in rules:
        out = out.withColumn("syms", F.expr(_fold_expr(l, r)))
    wenc = out.select("w", "n_char", F.size("syms").alias("n_bpe"))
    return (
        inst.join(F.broadcast(wenc), "w")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_words"),
             F.sum("n_char").alias("n_syms_char"),
             F.sum("n_bpe").alias("n_syms_bpe"))
    )
