"""User-defined function surface (SURVEY.md §2F).

The reference's UDF story is "arbitrary Java in Mapper.map() / custom
Reducer"; ours is the vectorized Arrow path. Policy: NONE of these run in
oracle-checked queries — built-in Catalyst expressions always win there
(codegen, pushdown, no serialization). These exist for the cases built-ins
can't express, and they are pytest-verified against built-in equivalents.

- scalar: `@pandas_udf` (Arrow batches, ~10-100× over row-at-a-time Python)
- UDAF:   `applyInPandas` over grouped data
- UDTF:   prefer `explode` of an array expression (JVM-side); shown here
          alongside the pandas path for parity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def l2_norm_udf(vec: pd.Series) -> pd.Series:
    """Scalar pandas UDF: L2 norm of an array<float> column.

    Equivalent built-in: functions/vectors.py::norm (preferred in queries —
    this exists to exercise/verify the Arrow scalar path).
    """
    import numpy as np

    def f(a) -> float:
        x = np.asarray(a, dtype="float64")  # accumulate in double like the built-in
        return float(np.sqrt(np.dot(x, x)))

    return vec.map(f)


@F.pandas_udf(T.DoubleType())
def token_entropy_udf(text: pd.Series) -> pd.Series:
    """Scalar pandas UDF: Shannon entropy (bits) of a doc's token
    distribution — a quality-scoring feature with no tidy built-in form."""
    import numpy as np

    def entropy(s: str) -> float:
        toks = s.split(" ")
        counts = pd.Series(toks).value_counts().to_numpy(dtype="float64")
        p = counts / counts.sum()
        return float(-(p * np.log2(p)).sum())

    return text.map(entropy)


ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group UDAF body: z-score of `value` within the group (ddof=0).
    Degenerate groups (single row / zero variance) get zscore 0.0."""
    std = pdf["value"].std(ddof=0)
    mean = pdf["value"].mean()
    z = (pdf["value"] - mean) / std if std > 0 else pdf["value"] * 0.0
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "value": pdf["value"],
            "zscore": z,
        }
    )


def zscore_per_user(events: DataFrame) -> DataFrame:
    """applyInPandas UDAF: per-user z-score of event values.

    Built-in equivalent (preferred at scale — stays in codegen):
    (value - avg(value) over w) / stddev_pop(value) over w.
    """
    return events.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        _zscore_group, schema=ZSCORE_SCHEMA
    )


def explode_tokens(documents: DataFrame) -> DataFrame:
    """UDTF-shaped operator, JVM-side: one output row per token with its
    position — `posexplode` of a split, no Python involved (the preferred
    form; a Python UDTF would pay per-row serialization for the same
    result)."""
    return documents.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@F.udtf(returnType="pos: int, ngram: string")
class CharNgramsUDTF:
    """True Python UDTF (Spark 4): emit each character trigram of the
    input with its position. Exists to exercise the UDTF surface itself
    (arbitrary per-row fan-out in Python); for anything expressible as
    array ops, prefer the JVM-side explode form (`explode_tokens` above) —
    a Python UDTF pays Arrow serialization per row batch."""

    def eval(self, text: str):
        if text is None:
            return
        for i in range(max(len(text) - 2, 0)):
            yield i, text[i : i + 3]


def char_ngrams_jvm(documents: DataFrame) -> DataFrame:
    """JVM twin of CharNgramsUDTF for the differential test: positions
    0-based, trigrams via substring over a sequence.

    sequence(1, 0) in Spark defaults the step to -1 and yields [1, 0], so
    texts shorter than 3 chars must short-circuit to an empty array or the
    fan-out emits two spurious rows the UDTF never produces."""
    return documents.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "CASE WHEN length(text) >= 3 THEN"
                " transform(sequence(1, length(text) - 2), i -> substr(text, i, 3))"
                " ELSE array() END"
            )
        ).alias("pos", "ngram"),
    )
