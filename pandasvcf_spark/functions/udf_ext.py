"""User-extension surface: vectorized (Arrow) pandas UDFs (SURVEY §2.9).

The reference's 'UDFs' are Python row functions mapped over numpy values
(vector_GT_alleles, vartype_map — variant_annotations.py:21-60,130-135).
Every one of those is a native column expression in this engine; this module
is the escape hatch for functions that genuinely need Python, exposed the
only way that's sane at scale: Arrow-batched pandas UDFs (~10-100x faster
than row-at-a-time Python UDFs) and grouped applyInPandas.

Includes one reference implementation of each kind, used by the tests:
  * `py_vartype` — scalar pandas UDF twin of the native `vartype_expr`
    (also a cross-check that the HOF expression matches a plain Python
    implementation of the reference semantics).
  * `zscore_group` — grouped applyInPandas normalizer.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


def vectorized(return_type: str):
    """Decorator: register a (pd.Series... -> pd.Series) function as an
    Arrow-batched scalar UDF. Thin by design — the point is that users get
    the fast path by default, never a row-at-a-time Python UDF."""
    return pandas_udf(return_type)


def _vartype_py(ref: str, allele: str) -> str:
    """Reference vartype semantics (variant_annotations.py:130-162) in plain
    Python — the golden twin of functions/genomics.vartype_expr."""
    if allele == ref:
        return "ref"
    if len(allele) == len(ref):
        diffs = sum(1 for a, b in zip(ref, allele) if a != b)
        return "snp" if diffs == 1 else "mnp"
    if len(ref) > len(allele):
        overlap_diff = any(a != b for a, b in zip(ref, allele))
        return "indel" if overlap_diff else "del"
    return "ins"


def py_vartype():
    """Factory returning the Arrow-batched vartype UDF. Built at call time
    on the driver — decorating at module import would re-run pandas_udf()
    during executor-side unpickling, where no SparkSession exists."""

    @vectorized("string")
    def _udf(ref: pd.Series, allele: pd.Series) -> pd.Series:
        return pd.Series(
            [_vartype_py(r, a) for r, a in zip(ref, allele)], dtype="object"
        )

    return _udf


def grouped_apply(df: DataFrame, keys: list[str], fn, schema: str) -> DataFrame:
    """applyInPandas wrapper: `fn(pdf) -> pdf` runs once per key group as a
    whole pandas DataFrame (one shuffle on the keys; each group must fit in
    one worker's memory — use windows/aggs when it doesn't)."""
    return df.groupBy(*keys).applyInPandas(fn, schema)


def zscore_group(value_col: str, out_col: str = "zscore"):
    """Grouped z-score normalizer for use with `grouped_apply`."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        pdf[out_col] = 0.0 if std == 0 else (pdf[value_col] - mean) / std
        return pdf

    return fn
