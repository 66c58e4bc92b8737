"""Source adapter seam: one contract for batch collections and change
streams, so a real MongoDB connector drops in WITHOUT touching the
engine (VERDICT r2, "What's missing" item 1).

Everything downstream of ingestion — pipeline compiler, cube build,
IVM maintenance (streaming/pipeline.py), hybrid serving — consumes
plain DataFrames in two shapes:

- **snapshot shape**: one row per live document, typed columns
  (nested objects as structs, arrays as arrays);
- **CDC shape** (`streaming.cdc.CDC_SCHEMA`): one row per change —
  ``op`` (insert/update/delete), ``stream_ts`` (stream position as a
  watermarkable timestamp — Mongo clusterTime), ``change_id`` (unique
  per CHANGE — Mongo resume token/_id), the document's own columns
  (deletes carry the pre-image, Mongo ``fullDocumentBeforeChange``),
  and ``mult`` (+1 apply / −1 retract; an update is a −pre/+post
  pair).

This module pins that contract as an interface with two shipping
implementations (the parquet/JSONL testbed and the deterministic CDC
fixture) plus a refuse-by-name Mongo skeleton documenting EXACTLY what
a connector-backed implementation must provide. Contract tests
(tests/test_sources_contract.py) run every implementation through the
same assertions, so a new adapter is proven by construction.

What a real Mongo-backed implementation provides (and nothing more):

1. ``snapshot``: ``spark.read.format("mongodb")`` (the official Spark
   connector) with ``database``/``collection`` options → DataFrame.
   Partitioning: the connector's ``partitioner`` options shard the
   collection scan; predicate pushdown maps $match prefixes into the
   aggregation pipeline server-side.
2. ``change_stream``: ``spark.readStream.format("mongodb")`` with
   ``change.stream.publish.full.document.only=false`` mapped to the
   CDC shape: ``operationType``→op, ``clusterTime``→stream_ts,
   ``_id`` (resume token)→change_id (hash to int64 or carry as
   string), ``fullDocument``/``fullDocumentBeforeChange``→doc
   columns, op-derived ``mult``. Updates expand to two rows.
3. **Resume**: Spark Structured Streaming checkpoints the connector's
   resume tokens per partition inside ``checkpointLocation`` — the
   adapter itself stays stateless; restart with the same checkpoint
   dir resumes exactly where the stream stopped (the same property the
   file-based fixture inherits from the file-source's committed
   offsets log).
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame, SparkSession


class CollectionSource(abc.ABC):
    """A batch-readable collection of documents."""

    #: stable identifier (catalog key / logging)
    name: str

    @abc.abstractmethod
    def snapshot(self, spark: SparkSession) -> DataFrame:
        """Current collection state, one row per live document.

        Must be lazy (no job until an action) so Catalyst can push
        filters/projections into the scan, and must return the same
        schema on every call.
        """


class ChangeStreamSource(abc.ABC):
    """A resumable, ordered stream of document changes."""

    name: str

    @abc.abstractmethod
    def change_stream(self, spark: SparkSession) -> DataFrame:
        """Streaming DataFrame in the CDC shape (CDC_SCHEMA columns).

        Must be a streaming DataFrame (``df.isStreaming``); resume
        semantics come from the Structured Streaming checkpoint of
        whatever query consumes it — implementations hold no resume
        state of their own.
        """


#: Columns every change_stream() result must expose, in the shape the
#: maintenance pipeline consumes. Kept as a function so the contract
#: tracks streaming.cdc.CDC_SCHEMA rather than duplicating it.
def cdc_columns() -> list[str]:
    from mongo_olap_spark.streaming.cdc import CDC_SCHEMA

    return [f.split()[0] for f in CDC_SCHEMA.split(", ")]


class ParquetCollectionSource(CollectionSource):
    """The testbed lake: one parquet file/dir per collection
    (sources/tables.load_table, with its type normalizations)."""

    def __init__(self, sf_dir: str, table: str):
        self.name = table
        self._sf_dir = sf_dir
        self._table = table

    def snapshot(self, spark: SparkSession) -> DataFrame:
        from mongo_olap_spark.sources.tables import load_table

        return load_table(spark, self._sf_dir, self._table)


class JsonlCollectionSource(CollectionSource):
    """JSON-lines documents (sources/collections.read_collection):
    nested objects as structs, malformed docs quarantined."""

    def __init__(self, path: str, *, schema=None, name: str = "jsonl"):
        self.name = name
        self._path = path
        self._schema = schema

    def snapshot(self, spark: SparkSession) -> DataFrame:
        from mongo_olap_spark.sources.collections import read_collection

        return read_collection(spark, self._path, schema=self._schema)


class ResumableChangeStream(abc.ABC):
    """PULL-based change stream with an explicit resume token — the
    reference's client-visible change-stream contract (SURVEY §1.1/
    §3.2: a consumer holds a resume token and asks for changes strictly
    after it), made explicit as an interface (r14, VERDICT r13 task 4).

    The Structured-Streaming path (:class:`ChangeStreamSource`) hides
    resume inside Spark's checkpoint; this contract surfaces it for
    consumers that drive ingestion themselves (the service's
    ``pump_cdc`` loop, a cron'd batch applier):

    - ``read_change_stream(resume_after=tok)`` returns changes
      STRICTLY AFTER ``tok`` in stream order, plus the token of the
      last change delivered. ``resume_after=None`` starts from the
      beginning of the retained stream.
    - Re-asking with the same token re-delivers the same changes
      (at-least-once is the transport's promise — exactly Mongo's).
    - Tokens are integers that ORDER changes (Mongo's resume tokens
      order by clusterTime+ordinal; the testbed's ``change_id`` is
      already that ordinal). An applier gets exactly-once by fencing
      on its own committed watermark: commit (state + token) atomically
      and skip any batch whose token ≤ the committed one —
      ``CubeMaintainer.apply_batch``'s batch_id watermark IS that
      fence, so the cube manifest doubles as the token store and a
      killed/restarted pump never double-applies and never skips.
    """

    @abc.abstractmethod
    def read_change_stream(
        self,
        spark: SparkSession,
        *,
        resume_after: int | None = None,
        max_changes: int | None = None,
    ) -> tuple[DataFrame, int | None]:
        """One pull: ``(batch, token)``.

        ``batch`` is a BATCH DataFrame in the CDC shape holding the (up
        to ``max_changes``) oldest changes strictly after
        ``resume_after``; ``token`` is the resume token of the newest
        change in the batch, or ``resume_after`` unchanged when the
        stream is drained (empty batch). The batch must be a prefix of
        the remaining stream in token order — a gap would be silently
        skipped by the consumer's fence."""


class FileChangeStreamSource(ChangeStreamSource, ResumableChangeStream):
    """CDC rows landed as parquet files (the testbed fixture, or any
    transport that stages changes to object storage — the common
    Kafka-connect/Debezium landing pattern). Implements BOTH stream
    contracts: the Structured-Streaming shape (file-source committed
    offsets in the consumer's checkpoint provide resume;
    ``dedup_changes`` guards replayed suffixes) and the explicit
    resume-token pull (``change_id`` is the token — unique and
    stream-ordered per the CDC shape)."""

    def __init__(self, path: str, *, name: str = "cdc_files"):
        self.name = name
        self._path = path

    def change_stream(self, spark: SparkSession) -> DataFrame:
        from mongo_olap_spark.streaming.cdc import CDC_SCHEMA

        return spark.readStream.schema(CDC_SCHEMA).parquet(self._path)

    def read_change_stream(
        self,
        spark: SparkSession,
        *,
        resume_after: int | None = None,
        max_changes: int | None = None,
    ) -> tuple[DataFrame, int | None]:
        from pyspark.sql import functions as F

        from mongo_olap_spark.streaming.cdc import CDC_SCHEMA

        df = spark.read.schema(CDC_SCHEMA).parquet(self._path)
        if resume_after is not None:
            df = df.filter(F.col("change_id") > F.lit(int(resume_after)))
        if max_changes is not None:
            # oldest-first prefix: a bounded TakeOrdered (K = the pull
            # size), not a full sort — the scale-safe shape for "give
            # me the next N changes"
            df = df.orderBy("change_id").limit(int(max_changes))
        tok = df.agg(F.max("change_id")).first()[0]
        if tok is None:
            return df, resume_after
        return df, int(tok)


class MongoCollectionSource(CollectionSource, ChangeStreamSource):
    """Skeleton for the official MongoDB Spark connector. This sandbox
    has no MongoDB and no network, so construction works (config is
    plain data) but both reads refuse by name with the exact options a
    deployment supplies — the engine-facing surface is final."""

    def __init__(self, uri: str, database: str, collection: str):
        self.name = f"{database}.{collection}"
        self.uri, self.database, self.collection = uri, database, collection

    def _refuse(self, what: str) -> RuntimeError:
        return RuntimeError(
            f"MongoCollectionSource.{what}: the mongodb Spark connector is "
            "not available in this environment. In a deployment: "
            f"spark.read{'Stream' if what == 'change_stream' else ''}"
            f'.format("mongodb").option("connection.uri", {self.uri!r})'
            f'.option("database", {self.database!r})'
            f'.option("collection", {self.collection!r}) — then map to the '
            "CDC shape per sources/adapters docstring."
        )

    def snapshot(self, spark: SparkSession) -> DataFrame:
        raise self._refuse("snapshot")

    def change_stream(self, spark: SparkSession) -> DataFrame:
        raise self._refuse("change_stream")

    def read_change_stream(self, spark: SparkSession, *,
                           resume_after: int | None = None,
                           max_changes: int | None = None):
        # the pull contract maps onto pymongo's
        # collection.watch(resume_after=token) cursor (batch the cursor,
        # carry each change's _id as the token, order is server-given);
        # this sandbox has neither pymongo nor a server
        raise self._refuse("read_change_stream")
