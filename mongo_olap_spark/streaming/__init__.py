from mongo_olap_spark.streaming.cdc import cdc_from_events, CDC_SCHEMA  # noqa: F401
from mongo_olap_spark.streaming.pipeline import CubeMaintainer  # noqa: F401
