from memories_spark.functions.vectors import (  # noqa: F401
    cosine_expr,
    dot_expr,
    norm_expr,
)
from memories_spark.functions.decay import half_life_decay  # noqa: F401
from memories_spark.functions.texttools import tokens_expr  # noqa: F401
