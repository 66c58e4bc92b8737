"""$redact: conditional document-tree pruning (SURVEY.md §2.2 S21).

Mongo's ``$redact`` walks each document top-down; at every node a
condition evaluates to ``$$PRUNE`` (drop the subtree), ``$$KEEP``
(keep the subtree verbatim and stop descending) or ``$$DESCEND``
(keep this level, recurse into children).

Spark-first shape: the tree walk happens **at plan-build time** over
the DataFrame's ``StructType`` — the emitted plan is one nested
CASE / struct expression per document column, fully JVM-side and
whole-stage-codegen'd. There is no per-row recursion, no Python in
the row path, and no lambda HOF except for arrays of structs (where
``F.transform`` is the only way to descend; the cost is documented at
the call site and the branch is skipped entirely for scalar arrays).

At 100 TB this is the difference between a projection (what this is)
and a per-document interpreter (what a naive port would be): redact
costs the same as any other expression select — it pipelines inside
the scan stage with pushdown/pruning intact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

#: Decision constants — ``decide`` callbacks return a string Column
#: evaluating to one of these per row.
PRUNE = "prune"
KEEP = "keep"
DESCEND = "descend"


def redact(col: Column, dtype: DataType, decide, path: tuple = ()) -> Column:
    """Redact one column of type ``dtype``.

    ``decide(node_col, path, dtype) -> Column[str]`` is consulted at
    every struct node (including the root if it is a struct); it
    returns a Column evaluating to :data:`PRUNE`, :data:`KEEP` or
    :data:`DESCEND`. ``dtype`` is the node's ``StructType`` so the
    decider can be schema-aware without triggering analysis errors on
    absent fields. Non-struct leaves are kept as-is — Mongo's $redact
    conditions attach to documents, not scalars.
    """
    if isinstance(dtype, StructType):
        decision = decide(col, path, dtype)
        descended = F.struct(
            *[
                redact(col[f.name], f.dataType, decide, path + (f.name,)).alias(f.name)
                for f in dtype.fields
            ]
        )
        return (
            F.when(decision == PRUNE, F.lit(None).cast(dtype))
            .when(decision == KEEP, col)
            .otherwise(descended)
        )
    if isinstance(dtype, ArrayType) and isinstance(
        dtype.elementType, (StructType, ArrayType)
    ):
        # Array of documents: descend per element. F.transform is a
        # lambda HOF (interpreted per element) — the one non-codegen
        # branch; only taken when the schema actually nests docs in
        # arrays.
        elem = dtype.elementType
        return F.transform(col, lambda x: redact(x, elem, decide, path + ("[]",)))
    return col


def redact_document(df: DataFrame, doc_col: str, decide) -> DataFrame:
    """Apply :func:`redact` to ``df[doc_col]`` using the DataFrame's
    schema for the plan-time walk; returns ``df`` with the column
    replaced."""
    dtype = df.schema[doc_col].dataType
    return df.withColumn(doc_col, redact(F.col(doc_col), dtype, decide))


def level_gate(prune_at: int = 2, keep_at: int = 0, field: str = "level"):
    """A canonical ACL-style decider: nodes carrying an integer
    ``field`` prune at >= ``prune_at``, keep (stop descending) at
    == ``keep_at``, otherwise descend; nodes without the field always
    descend (the Mongo default)."""

    def decide(node: Column, path: tuple, dtype: StructType) -> Column:
        if field not in dtype.fieldNames():
            return F.lit(DESCEND)
        lvl = node[field]
        return (
            F.when(lvl >= prune_at, F.lit(PRUNE))
            .when(lvl == keep_at, F.lit(KEEP))
            .otherwise(F.lit(DESCEND))
        )

    return decide
