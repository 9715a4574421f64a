"""Nested-document normalization — BSON-shaped data → relational columns.

The reference exports Mongo documents whose nested sub-documents and
arrays pass through as Arrow structs/lists, inferred per first batch
(reference main.py:212-218) — consumers get whatever nesting the source
had. This module is the deliberate normalization layer the reference
lacks:

  - ``flatten_structs``: recursively promote struct fields to top-level
    columns (``address.city`` → ``address_city``). Pure projection —
    zero shuffle, zero Python; Catalyst prunes unaccessed leaves all the
    way into the parquet scan (nested-column pruning), so flattening a
    100 TB table for a 2-leaf query reads 2 leaves.
  - ``normalize_array``: split one array-of-X column into a child table
    (id, idx, element) — the doc→child-table step of relational
    normalization; ``posexplode_outer`` keeps empty/null arrays visible
    as a null child row when asked.
  - ``infer_json_schema``: schema for a JSON-string column from a
    driver-side sample (explicit, bounded, logged) — the engine-blessed
    replacement for the reference's silent first-batch freezing: sample
    size is a visible knob and the result is an explicit StructType the
    caller pins, versions, and reviews (SURVEY §1.1 consequence).

Together: ``parse → flatten → normalize arrays`` turns a Mongo
collection dump into flat fact + child tables with nothing but
projections and one Generate per array — the shape every downstream
operator family here expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def flatten_structs(df: DataFrame, sep: str = "_", max_depth: int = 10) -> DataFrame:
    """Recursively lift struct fields to top-level columns.

    Arrays and maps are left intact (use ``normalize_array`` for those);
    name collisions raise rather than silently shadow. Column order is
    deterministic: original order, each struct replaced in place by its
    expanded fields.
    """
    for _ in range(max_depth):
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StructType)
        ]
        if not struct_cols:
            return df
        out, names = [], set()
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                for sub in f.dataType.fields:
                    new = f"{f.name}{sep}{sub.name}"
                    if new in names:
                        raise ValueError(f"flatten collision on column {new!r}")
                    names.add(new)
                    out.append(F.col(f"`{f.name}`.`{sub.name}`").alias(new))
            else:
                if f.name in names:
                    raise ValueError(f"flatten collision on column {f.name!r}")
                names.add(f.name)
                out.append(F.col(f"`{f.name}`"))
        df = df.select(*out)
    raise ValueError(f"nesting deeper than max_depth={max_depth}")


def normalize_array(
    df: DataFrame,
    array_col: str,
    id_cols: list[str],
    keep_empty: bool = False,
) -> DataFrame:
    """Child table for one array column: (id_cols..., idx, element).

    ``keep_empty=True`` emits a (id, null, null) row for empty/null
    arrays (posexplode_outer) so joins back to the parent don't silently
    drop array-less documents; the default drops them (inner explode).
    Map-only Generate — output partitioning inherits the parent's.
    """
    pos = F.posexplode_outer(array_col) if keep_empty else F.posexplode(array_col)
    return df.select(*id_cols, pos.alias("idx", "element"))


def infer_json_schema(
    spark: SparkSession, df: DataFrame, json_col: str, sample_rows: int = 1000
) -> StructType:
    """Schema for a JSON-string column from a bounded driver-side sample.

    Explicitly NOT streaming inference: the sample is collected once
    (``sample_rows`` is the visibility/cost knob), parsed by the JSON
    source's schema inference (which unions types across the sample),
    and returned for the caller to PIN — the engine's answer to the
    reference's first-batch freezing, where late-appearing fields were
    silently dropped (main.py:212-218). Fields absent from the sample
    are still absent here; the difference is the schema is an explicit,
    reviewable artifact instead of a per-partition accident.
    """
    import json

    sample = [
        r[0] for r in df.select(json_col).dropna().limit(sample_rows).collect()
    ]
    docs = [d for d in (json.loads(s) for s in sample) if isinstance(d, dict)]
    if not docs:
        return StructType([])
    # createDataFrame's inference unions fields/types across the sampled
    # documents (nested dicts → structs, lists → arrays) — no RDD path
    return spark.createDataFrame(docs).schema


def parse_and_flatten(
    df: DataFrame, json_col: str, schema: StructType | str, sep: str = "_"
) -> DataFrame:
    """The Mongo-document ingestion idiom in one step: parse the JSON
    column under an explicit schema, drop the raw string, flatten."""
    parsed = df.withColumn(json_col, F.from_json(F.col(json_col), schema))
    return flatten_structs(parsed, sep=sep)
