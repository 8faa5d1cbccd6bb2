from pandasvcf_spark.operators.annotate import (
    annotate_genotypes,
    annotate_vcf,
    explode_genotypes,
)
from pandasvcf_spark.operators.dedup import (
    dedup_documents,
    dedup_exact,
    dedup_stats,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from pandasvcf_spark.operators.relational import (
    anti_join,
    dedup_annotate_join,
    join_dim,
    pivot_counts,
    rank_per_group,
    running_agg,
    semi_join,
    topk,
)
from pandasvcf_spark.operators.similarity import (
    ann_bucket_topk,
    bucket_histogram,
    cosine_topk,
)
from pandasvcf_spark.operators.text_features import tf_idf

__all__ = [
    "annotate_genotypes",
    "annotate_vcf",
    "explode_genotypes",
    "dedup_documents",
    "dedup_exact",
    "dedup_stats",
    "minhash_near_dup_pairs",
    "simhash_near_dup_pairs",
    "anti_join",
    "dedup_annotate_join",
    "join_dim",
    "pivot_counts",
    "rank_per_group",
    "running_agg",
    "semi_join",
    "topk",
    "ann_bucket_topk",
    "bucket_histogram",
    "cosine_topk",
    "tf_idf",
]
