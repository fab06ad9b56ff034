"""UDF / UDAF / UDTF surface (SURVEY.md §2.2l; SNIPPETS.md [2][3]).

Policy (the 100 TB rule): built-ins ALWAYS win — they stay inside
whole-stage codegen with zero IPC. When Python is unavoidable, every shape
here is Arrow-vectorized (scalar pandas UDF, grouped-agg pandas UDF,
``applyInPandas`` grouped-map, UDTF); none is a row-at-a-time Python UDF.
Each function mirrors a built-in-expressible computation so correctness is
checkable against the built-in / DuckDB oracle (q52).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# -- scalar pandas UDF (SCALAR: Series -> Series, Arrow-batched) --------------

@pandas_udf(DoubleType())
def net_price_pandas(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized net price — semantically identical to the built-in
    expression ``price * (1 - discount)``; exists to exercise/validate the
    Arrow scalar path against the codegen one."""
    return price * (1.0 - discount)


# -- grouped-aggregate pandas UDF (Series -> scalar per group) ----------------

@pandas_udf(DoubleType())
def weighted_mean_pandas(v: pd.Series, w: pd.Series) -> float:
    """Weighted mean sum(v*w)/sum(w) as a vectorized UDAF."""
    denom = w.sum()
    return float((v * w).sum() / denom) if denom else float("nan")


# -- grouped-map applyInPandas (DataFrame -> DataFrame per group) -------------

def zscore_normalize(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score via ``applyInPandas`` (grouped-map). The classic
    shape for per-entity normalization of features before training. Output
    schema = input + zscore column; group sizes bound task memory, so at
    scale pre-split giant groups (salt) before applying."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, zscore double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        pdf = pdf.copy()
        pdf["zscore"] = (pdf[value_col] - mean) / std if std else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(norm, out_schema)


# -- UDTF (one row in -> many rows out, registered as a table function) -------

try:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWordsUDTF:
        """Tokenizing table function: SELECT * FROM split_words('a b c')."""

        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield w, i

except ImportError:  # pragma: no cover - udtf ships with pyspark >= 3.5
    SplitWordsUDTF = None


def mapinpandas_tokens(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """``mapInPandas`` fan-out example: doc rows -> (doc_id, token) rows in
    Arrow batches. The streaming-iterator shape means a batch of giant docs
    never materializes more than one pandas frame at a time per task."""
    from collections.abc import Iterator

    def toks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[[id_col, text_col]].copy()
            out[text_col] = out[text_col].str.split(" ")
            out = out.explode(text_col).rename(columns={text_col: "tok"})
            yield out

    return df.mapInPandas(toks, f"{id_col} bigint, tok string")
