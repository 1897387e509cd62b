from timedf_spark.functions.pandas_parity import (
    floor_div,
    skew_pandas,
    ts_to_ns_epoch,
)
from timedf_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "skew_pandas",
    "ts_to_ns_epoch",
    "floor_div",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
