from mongo_olap_spark.sources.tables import TABLES, load_table, load_all  # noqa: F401
