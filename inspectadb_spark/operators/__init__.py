"""Composite operators — plan builders over the DataFrame API.

Each function here is a *logical-plan builder*: it takes DataFrames and
returns a lazy DataFrame. Nothing executes rows in Python; Catalyst sees the
full composed plan and optimizes across operator boundaries (filter pushdown
through a CDC apply, column pruning into a sessionize, broadcast of a dedup's
dimension side, …).
"""

from inspectadb_spark.operators.cdc import apply_changelog, scd2_history
from inspectadb_spark.operators.sessionize import sessionize
from inspectadb_spark.operators.asof import asof_join
from inspectadb_spark.operators.dedup import (
    exact_dedup,
    jaccard_similar_pairs,
    minhash_signatures,
    minhash_near_dup_pairs,
    simhash,
)
from inspectadb_spark.operators.similarity import cosine_topk, srp_ann_topk
from inspectadb_spark.operators.text import (
    token_counts,
    text_quality,
    token_stats,
    char_fingerprint,
)

__all__ = [
    "apply_changelog", "scd2_history", "sessionize", "asof_join",
    "exact_dedup", "jaccard_similar_pairs", "minhash_signatures",
    "minhash_near_dup_pairs", "simhash",
    "cosine_topk", "srp_ann_topk",
    "token_counts", "text_quality", "token_stats", "char_fingerprint",
]
