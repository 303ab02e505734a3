from etl_lens_spark.similarity.knn import (
    brute_force_topk,
    cosine_similarity,
    lsh_topk,
)

__all__ = ["brute_force_topk", "cosine_similarity", "lsh_topk"]
