from skipmap_processor_spark.plans.queries import (  # noqa: F401
    COVERAGE,
    ORACLE_SQL,
    QUERIES,
)
