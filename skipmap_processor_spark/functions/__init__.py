from skipmap_processor_spark.functions.udfs import (  # noqa: F401
    content_sha_expr,
    normalize_content_expr,
    normalize_content_pandas,
    normalize_py,
    sha256_py,
)
