"""mongo_olap_spark — a PySpark-native OLAP pre-aggregation engine.

A from-scratch re-expression of the capabilities of the reference
``kshpin/mongo-olap`` (a MongoDB OLAP pre-aggregation microservice:
cube definitions = dimensions × re-aggregable measures over a source
collection, populated by an aggregation pipeline and kept fresh from
the collection's change stream), built Spark-first:

- the relational surface is the DataFrame/SQL API (Catalyst plans it);
- cubes are managed aggregate tables (``cube/``);
- incremental maintenance is Structured Streaming + signed-delta
  merge (``streaming/``);
- the MongoDB aggregation-pipeline operator surface is mapped onto
  native ``pyspark.sql.functions`` (``functions/``);
- LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal columns) live in ``operators/``.

Provenance note: /root/reference was empty at survey and build time
(SURVEY.md §0), so reference citations are semantic, to public
MongoDB aggregation semantics, not file:line.
"""

__version__ = "0.1.0"

from mongo_olap_spark.session import get_spark  # noqa: F401
from mongo_olap_spark.sources.tables import TABLES, load_table  # noqa: F401
