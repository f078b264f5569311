from careers_spark.functions.text import (  # noqa: F401
    normalize_col,
    normalize_py,
    tokenize_py,
    tokenize_udf,
)
