from mongo_olap_spark.cube.spec import CubeSpec, Dimension, Measure  # noqa: F401
from mongo_olap_spark.cube.build import build_cube  # noqa: F401
from mongo_olap_spark.cube.query import query_cube  # noqa: F401
from mongo_olap_spark.cube.catalog import CubeCatalog  # noqa: F401
