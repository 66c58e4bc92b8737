from mongo_olap_spark.plans.router import CubeRouter, AggregateRequest  # noqa: F401
