from log_vector_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
    literal_vector,
    fixed_query_vector,
)
