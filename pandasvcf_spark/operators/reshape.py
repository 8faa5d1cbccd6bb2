"""Reshaping operators: long<->wide (the reference's stack/unstack pair).

The wide->long direction lives in annotate.explode_genotypes (reference R1).
This module adds the inverse (reference R2 — `unstack(level=4)` in the
example notebook, cell 17) and the union helper (reference R3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandasvcf_spark.functions.genomics import SITE_KEY


def pivot_genotypes(
    long_df: DataFrame,
    value_col: str = "GT",
    sample_ids: list[str] | None = None,
) -> DataFrame:
    """Long genotype table -> wide site x sample matrix of `value_col`
    (reference R2: set_index(...).unstack(level=4)).

    sample_ids: pass the known sample list to skip the distinct-scan Spark
    otherwise needs to discover pivot columns — on a large cluster that
    avoids an extra job over the full table. With thousands of samples the
    wide shape is inherently driver-heavy; prefer the long shape for
    analysis and pivot only narrowed slices (as the reference notebook does).
    """
    p = long_df.groupBy(*SITE_KEY).pivot("sample_ids", sample_ids)
    return p.agg(F.first(value_col))


def union_genotypes(*dfs: DataFrame) -> DataFrame:
    """Union by column name, tolerating missing columns (reference R3
    pd.concat; Spark fills absent columns with NULL)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
