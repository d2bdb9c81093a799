from flink_uba_spark.sources.readers import (  # noqa: F401
    load_testdata,
    read_apache_log,
    read_order_events,
    read_receipt_events,
    read_user_behavior,
    register_views,
    stream_csv_dir,
    stream_kafka,
    stream_rate,
    stream_socket,
)
