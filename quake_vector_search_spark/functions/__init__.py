from quake_vector_search_spark.functions.vector import (  # noqa: F401
    cosine_similarity_col,
    dot_col,
    l2_batch,
    l2_col,
    l2_squared_col,
)
