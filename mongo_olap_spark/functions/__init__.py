from mongo_olap_spark.functions.expressions import (  # noqa: F401
    dsum,
    davg,
    dot,
    cosine,
)
