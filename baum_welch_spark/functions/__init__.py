from baum_welch_spark.functions.columns import (
    as_double_array,
    cosine_similarity,
    dot,
    l2_norm,
    word_shingles,
    words,
)

__all__ = [
    "as_double_array",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "word_shingles",
    "words",
]
