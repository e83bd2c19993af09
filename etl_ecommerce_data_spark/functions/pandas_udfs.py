"""The sanctioned Python paths: Arrow-batched Pandas UDFs.

Policy (SCALE.md): everything that CAN be a JVM expression IS one — Python
appears only where the semantics genuinely aren't expressible declaratively,
and then always Arrow-batched (pandas_udf / applyInPandas), never row-at-a-time
``udf``. Two members:

- ``cosine_pandas`` — vectorized numpy cosine as a scalar pandas_udf. The JVM
  higher-order-function ``functions.vectors.cosine`` is the production path;
  this exists as the vectorized-UDF reference implementation (tested equal)
  and the template for scoring functions that need numpy/scipy kernels.
- ``user_value_ewma`` — exponentially weighted moving average per key via
  ``applyInPandas``. EWMA is a sequential recurrence (s_t = (1-α)·s_{t-1} +
  α·x_t) — not expressible as a single Spark window aggregate — so each
  group's ordered fold runs in pandas; groups are independent, so the operator
  scales with key cardinality exactly like any groupBy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Cosine similarity over two array<double> columns, one Arrow batch at a
    time. Null/zero-norm pairs → null (same contract as the JVM cosine)."""

    def one(x, y):
        if x is None or y is None:
            return None
        xv = np.asarray(x, dtype=np.float64)
        yv = np.asarray(y, dtype=np.float64)
        # contract parity with the JVM twin on malformed rows: mismatched
        # widths would raise out of np.dot (aborting the whole task where
        # zip_with null-pads to NULL), and a null ELEMENT arrives as NaN
        # (JVM arithmetic yields NULL) — both map to None here
        if xv.shape != yv.shape or np.isnan(xv).any() or np.isnan(yv).any():
            return None
        nx = float(np.sqrt(np.dot(xv, xv)))
        ny = float(np.sqrt(np.dot(yv, yv)))
        if nx == 0.0 or ny == 0.0:
            return None
        return float(np.dot(xv, yv)) / (nx * ny)

    return pd.Series([one(x, y) for x, y in zip(a, b)])


def chunk_udtf(chunk_tokens: int = 32):
    """Python UDTF (Spark 4 table-function surface): explode a document into
    fixed-size token chunks — the UDTF twin of the JVM
    ``functions.text.chunk_texts`` path, registered with the SAME oracle so
    the newest Python surface is hash-pinned, not just smoke-tested.

    Arrow-optimized (``useArrow=True``): rows move in columnar batches. The
    JVM expression remains the production path per the Python-at-the-edges
    policy; this is the template for table functions whose per-row expansion
    needs real Python (parsers, tokenizers)."""
    from pyspark.sql.functions import udtf

    if chunk_tokens <= 0:
        # a negative step makes range() empty — every document would
        # silently emit ZERO chunks (and 0 raises a bare range() error
        # inside executors with no hint at the bad parameter)
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")

    @udtf(returnType="chunk_id: long, chunk_text: string", useArrow=True)
    class ChunkDoc:
        def eval(self, text: str):  # noqa: D102 - UDTF contract
            if text is None:
                return
            toks = text.split(" ")
            for i, start in enumerate(range(0, max(len(toks), 1), chunk_tokens)):
                yield i, " ".join(toks[start : start + chunk_tokens])

    return ChunkDoc


def user_value_ewma(
    events: DataFrame,
    alpha: float = 0.1,
    key_col: str = "user_id",
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Final EWMA of ``value_col`` per key, folding rows in (time, tiebreak)
    order with ``s_1 = x_1`` (pandas ``ewm(adjust=False)`` semantics).

    The fold order is total (time + unique tiebreak), so the sequence of IEEE
    operations — and therefore the result, bit-for-bit — is fixed regardless
    of partitioning. One shuffle on the key; per-group work is a single
    in-memory pandas pass.
    """

    one_minus = 1.0 - alpha  # bind the exact constant used in every step

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([time_col, tiebreak_col], kind="mergesort")
        # Explicit fold (not pandas .ewm) so the per-step expression is
        # literally `prev*(1-α) + x*α` — the same two multiplies and one add
        # the SQL-oracle fold performs, hence bit-identical results.
        s: float | None = None
        for x in pdf[value_col].to_numpy():
            xf = float(x)
            s = xf if s is None else s * one_minus + xf * alpha
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "ewma_value": [s],
                "n_events": [len(pdf)],
            }
        )

    # the key's declared type comes from the INPUT schema — hardcoding
    # `long` broke (or corrupted) any non-bigint key column at the Arrow
    # conversion of the returned frame
    key_dt = events.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_dt}, ewma_value double, n_events long"
    return (
        events.select(key_col, time_col, tiebreak_col, value_col)
        .groupBy(key_col)
        .applyInPandas(fn, out_schema)
    )
