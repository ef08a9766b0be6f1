"""UDF/UDAF/UDTF surface demonstrations (SURVEY.md §2.10).

Policy (SURVEY.md §2.10): built-in expressions first; these exist to
cover the *machinery* — grouped-aggregate ``pandas_udf`` (Arrow-batched
UDAF), and Python UDTF (1→N generator) — with semantics simple enough
that a plain-SQL oracle can verify the plumbing end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def geometric_mean_udaf(v: pd.Series) -> float:
    """Grouped-aggregate pandas_udf (UDAF): geometric mean of
    (1 + x), i.e. exp(mean(log1p(x))) - 1. Deliberately chosen so the
    DuckDB oracle is EXP(AVG(LN(1 + x))) - 1 — verifying the Arrow
    grouped-agg path against closed-form SQL."""
    return float(np.expm1(np.log1p(v.to_numpy(dtype="float64")).mean()))


@F.pandas_udf(T.DoubleType())
def l2_norm_udf(vecs: pd.Series) -> pd.Series:
    """Scalar pandas_udf (Arrow-batched): L2 norm of an array column
    via one numpy matmul-style reduction per batch — the sanctioned
    vectorized-Python pattern (SNIPPETS.md scalar-udf ref). Semantics
    chosen SQL-expressible so the oracle verifies the Arrow scalar
    path itself: sqrt(sum(x^2))."""
    return vecs.map(
        lambda v: float(np.sqrt(np.dot(a := np.asarray(v, dtype="float64"), a)))
    )


class TokenExplode:
    """Python UDTF (Spark ≥3.5): one input row → one row per token.

    The oracle is the same double-unnest SQL as f_posexplode; what's
    under test is the lateral-join UDTF machinery, not tokenization.
    """

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if text is None:
            return
        pos = 0
        for tok in text.lower().split():
            if tok:
                yield doc_id, pos, tok
                pos += 1


token_explode_udtf = F.udtf(
    TokenExplode,
    returnType="doc_id bigint, pos int, tok string",
    # Arrow-optimized UDTF (Spark 4): batches cross the Python boundary
    # as Arrow record batches (ArrowEvalPythonUDTF) instead of pickled
    # rows (BatchEvalPythonUDTF) — the generator body is unchanged.
    useArrow=True,
)
