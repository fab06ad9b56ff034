"""User-defined function surface (SURVEY.md §2.2l)."""

from inspectadb_spark.functions.udfs import (
    SplitWordsUDTF,
    net_price_pandas,
    weighted_mean_pandas,
    zscore_normalize,
)

__all__ = [
    "SplitWordsUDTF",
    "net_price_pandas",
    "weighted_mean_pandas",
    "zscore_normalize",
]
