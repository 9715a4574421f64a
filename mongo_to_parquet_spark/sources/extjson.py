"""Mongo extended-JSON lines source — a Spark 4 Python DataSource.

The reference's data comes out of MongoDB; its interchange format on disk
is ``mongoexport`` JSON lines, where BSON types that JSON can't express
are wrapped in ``$``-keyed envelopes::

    {"_id": {"$oid": "..."}, "created_at": {"$date": "2024-01-01T00:00:00Z"},
     "n": {"$numberLong": "42"}, "price": 1.5, "tags": ["a", "b"]}

``spark.read.json`` would surface those envelopes as structs and mangle
the types. This module registers a ``mongoexport`` format on the Spark 4
Python DataSource API (``pyspark.sql.datasource``) that unwraps the
common envelopes ($oid, $date, $numberLong/$numberInt/$numberDouble/
$numberDecimal) during the scan, so downstream operators see plain
Spark types — the ingestion twin of sources/mongo.py's (jar-gated) live
connector, with zero external dependencies. ``$numberDecimal``
(Decimal128) unwraps to ``decimal.Decimal``, never float — bind it to a
DecimalType schema field to keep money values exact.

Partitioning: one input partition per file (mongoexport shards dumps
into files; a 100 TB dump is many files, so file-granular parallelism is
the natural split — the same contract as Spark's own JSON source before
splittable compression). The Python reader is Arrow-batched by the
DataSource framework; per-row cost is stdlib ``json.loads``, the
unavoidable price of a text interchange format — convert to parquet once
(the reference's whole purpose) and never scan the JSONL twice.

Usage::

    spark.dataSource.register(MongoExportDataSource)
    df = (spark.read.format("mongoexport")
          .schema("_id string, created_at timestamp, n bigint, price double")
          .load(path))
"""

from __future__ import annotations

import datetime as dt
import decimal
import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def unwrap_extjson(v):
    """Recursively unwrap mongoexport ``$``-envelopes to plain values."""
    if isinstance(v, dict):
        if len(v) == 1:
            ((k, inner),) = v.items()
            if k == "$oid":
                return str(inner)
            if k == "$date":
                if isinstance(inner, dict) and "$numberLong" in inner:
                    ms = int(inner["$numberLong"])
                    return dt.datetime.fromtimestamp(ms / 1000.0, dt.timezone.utc).replace(tzinfo=None)
                s = str(inner).replace("Z", "+00:00")
                out = dt.datetime.fromisoformat(s)
                return out.astimezone(dt.timezone.utc).replace(tzinfo=None) if out.tzinfo else out
            if k in ("$numberLong", "$numberInt"):
                return int(inner)
            if k == "$numberDouble":
                return float(inner)
            if k == "$numberDecimal":
                # Decimal128 exists precisely to carry exact decimals
                # (money) — keep exactness so a DecimalType schema field
                # binds losslessly; a float round-trip would corrupt the
                # one type whose purpose is not being a float
                return decimal.Decimal(str(inner))
        return {k: unwrap_extjson(x) for k, x in v.items()}
    if isinstance(v, list):
        return [unwrap_extjson(x) for x in v]
    return v


def wrap_extjson(v):
    """Inverse of :func:`unwrap_extjson`: plain Python values → mongoexport
    envelopes (ints → $numberLong, datetimes → $date, Decimal →
    $numberDecimal; floats/strings/None stay plain, like mongoexport)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return {"$numberLong": str(v)}
    if isinstance(v, dt.datetime):
        return {"$date": v.isoformat(timespec="milliseconds") + "Z"}
    if isinstance(v, decimal.Decimal):
        return {"$numberDecimal": str(v)}
    if isinstance(v, list):
        return [wrap_extjson(x) for x in v]
    if isinstance(v, dict):
        return {k: wrap_extjson(x) for k, x in v.items()}
    return v


def write_extjson_lines(path: str, docs, id_field: str = "_id") -> int:
    """Write documents as a mongoexport-shaped JSONL file; returns count.

    Test/fixture helper for the ingestion round-trip (q_mongo_export):
    real dumps come from ``mongoexport`` itself; this produces the same
    shape so the scan path can be verified end-to-end without a mongod.
    Values under ``id_field`` are emitted as ``{"$oid": ...}``.
    """
    n = 0
    with open(path, "w", encoding="utf-8") as fh:
        for doc in docs:
            enc = {
                k: ({"$oid": str(v)} if k == id_field else wrap_extjson(v))
                for k, v in doc.items()
            }
            fh.write(json.dumps(enc) + "\n")
            n += 1
    return n


def infer_extjson_schema(spark, path: str, sample_rows: int = 1000):
    """Schema for a mongoexport dump from a bounded driver-side sample.

    Same posture as operators/nested.infer_json_schema: the sample is
    read once, envelopes are UNWRAPPED first (so ``$date`` infers as
    timestamp and ``$numberLong`` as bigint, not as structs), and the
    resulting schema is an explicit, reviewable artifact the caller pins —
    not the reference's silent first-batch freeze (main.py:212-218).
    """
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".json", ".jsonl")) and not f.startswith(("_", "."))
        )
        if os.path.isdir(path)
        else [path]
    )
    docs = []
    for fp in files:
        with open(fp, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    doc = unwrap_extjson(json.loads(line))
                    if isinstance(doc, dict):
                        docs.append(doc)
                if len(docs) >= sample_rows:
                    break
        if len(docs) >= sample_rows:
            break
    if not docs:
        from pyspark.sql.types import StructType

        return StructType([])
    return spark.createDataFrame(docs).schema


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class MongoExportReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mongoexport source requires a path")

    def partitions(self):
        p = self.path
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith((".json", ".jsonl")) and not f.startswith(("_", "."))
            )
        else:
            files = [p]
        return [_FilePartition(f) for f in files] or [_FilePartition(p)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        fields = [f.name for f in self.schema.fields]
        raw_mode = fields == ["doc"]  # schema-less fallback: raw JSON text
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                if raw_mode:
                    yield (line,)
                    continue
                doc = unwrap_extjson(json.loads(line))
                yield tuple(doc.get(f) for f in fields)


class MongoExportStreamReader(DataSourceStreamReader):
    """Tail a growing mongoexport dump directory as a stream.

    The batch reader snapshots a finished dump; real pipelines land new
    dump files continuously (one per export run / change-stream window —
    the jar-less analog of a Mongo change feed). Offsets are positions in
    the filename-sorted file listing — mongoexport shard names sort
    stably, and files are immutable once written, so `{"index": N}` fully
    identifies the consumed prefix. Each unconsumed file becomes one
    InputPartition (same file-granular parallelism as the batch reader);
    restarts resume from the checkpointed offset with no dupes and no
    gaps (pinned in tests/test_streaming.py).
    """

    def __init__(self, schema, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mongoexport stream source requires a path")
        self._batch_reader = MongoExportReader(schema, options)

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".json", ".jsonl")) and not f.startswith(("_", "."))
            )
        return [self.path] if os.path.exists(self.path) else []

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(self._files())}

    def partitions(self, start: dict, end: dict):
        files = self._files()
        return [
            _FilePartition(f) for f in files[start["index"] : end["index"]]
        ] or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not partition.path:  # empty micro-batch placeholder
            return iter(())
        return self._batch_reader.read(partition)

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to clean up


class _PartFile(WriterCommitMessage):
    def __init__(self, path: str, count: int):
        self.path = path
        self.count = count


class MongoExportWriter(DataSourceWriter):
    """Executor-side JSONL writer: each task writes one ``part-*.jsonl``
    with every row re-wrapped into mongoexport envelopes (wrap_extjson;
    an ``_id`` column becomes ``{"$oid": ...}``), and the driver-side
    commit records a manifest — the standard task-file + driver-commit
    protocol, so a failed task's partial file is simply never committed.
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mongoexport writer requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> "_PartFile":
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(
            self.path, f"part-{ctx.partitionId():05d}-{ctx.taskAttemptId()}.jsonl"
        )
        n = 0
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                doc = row.asDict(recursive=True)
                enc = {
                    k: ({"$oid": str(v)} if k == "_id" and v is not None
                        else wrap_extjson(v))
                    for k, v in doc.items()
                }
                fh.write(json.dumps(enc) + "\n")
                n += 1
        return _PartFile(out, n)

    def commit(self, messages) -> None:
        committed = {os.path.basename(m.path): m.count for m in messages}
        manifest = os.path.join(self.path, "_SUCCESS.json")
        keep = dict(committed)
        if not self.overwrite and os.path.isfile(manifest):
            with open(manifest) as fh:
                keep.update(json.load(fh).get("files", {}))
        # anything not in the manifest union is a previous overwrite's data
        # or a failed/speculative task attempt's partial file — drop it
        for f in os.listdir(self.path):
            if f.endswith(".jsonl") and f not in keep:
                os.remove(os.path.join(self.path, f))
        with open(manifest, "w") as fh:
            json.dump({"files": keep, "rows": sum(keep.values())}, fh)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class MongoExportDataSource(DataSource):
    """``spark.read.format("mongoexport")`` — see module docstring.

    Also registers as a STREAMING source: ``spark.readStream.format(
    "mongoexport").schema(...).load(dir)`` tails the dump directory,
    one micro-batch partition per newly-landed file.
    """

    @classmethod
    def name(cls) -> str:
        return "mongoexport"

    def schema(self) -> str:
        # schema-less reads get the reference's universal fallback: the
        # raw document as a JSON string (caller extracts with from_json) —
        # mirrors the reference's "whatever BSON yields" posture without
        # guessing types (SURVEY §1.1 inferred-then-frozen critique).
        return "doc string"

    def reader(self, schema) -> MongoExportReader:
        return MongoExportReader(schema, self.options)

    def streamReader(self, schema) -> MongoExportStreamReader:
        return MongoExportStreamReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> MongoExportWriter:
        return MongoExportWriter(self.options, overwrite)
