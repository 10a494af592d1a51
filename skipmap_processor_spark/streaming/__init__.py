from skipmap_processor_spark.streaming.pipeline import (  # noqa: F401
    apply_epoch,
    bootstrap_base,
    replay_log,
    run_stream,
)
