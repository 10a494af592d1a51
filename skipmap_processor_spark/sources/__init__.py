from skipmap_processor_spark.sources.events import (  # noqa: F401
    DDL_FIELDS,
    EVENT_FIELDS,
    base_spark_schema,
    event_spark_schema,
    generate_bulk,
    generate_full,
    write_event_log,
)
