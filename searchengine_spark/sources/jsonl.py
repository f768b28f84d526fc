"""JSONL corpus source/sink on the Spark 4 Python DataSource API.

The reference ingests its corpus from JSON/NDJSON files (SURVEY.md §2
S1/S4; /root/reference/searchenginespark.py:34 json.load over a
directory of case files). Spark's native `spark.read.json` already
covers that for well-formed corpora, and it remains the default path
(registry S1). This source exists for the ingest shapes native JSON
handles poorly, while staying inside Spark's planning model:

- **partition-per-file parallelism** with per-row error QUARANTINE:
  malformed lines land in a `_corrupt` column instead of failing the
  task or silently nulling whole rows (PERMISSIVE mode's per-COLUMN
  nulls lose the original line; this keeps it byte-exact for replay);
- **planner-visible filter pushdown** (`pushFilters`): EqualTo / In /
  IsNotNull / StringStartsWith on top-level fields are applied while
  PARSING, before rows are materialized — on a 100 TB crawl drop a
  `lang='en'` filter into the reader and never build 95% of rows
  (the JSON text is still read: byte-skipping needs a columnar
  container, which is what the parquet path is for; unsupported
  filters are returned to Spark and re-applied above, so pushdown is
  never a correctness risk);
- **exactly-once JSONL sink** (one file per partition, commit via
  task-temp rename) for corpus interchange with line-oriented tools;
- **file-tailing stream reader**: each microbatch picks up files
  that appeared since the last offset — a directory-drop ingest shim
  with replayable offsets (sorted file-name watermark), the same
  contract streaming/kafka_shim.py fakes for Kafka.

Everything here is driver/executor-picklable plain Python; register
with `register_jsonl_source(spark)` then
`spark.read.format("jsonl_docs")...`.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "jsonl_docs"

# documents-shaped default; callers override with .schema(...)
DEFAULT_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, _corrupt string"
)
CORRUPT_COL = "_corrupt"


def _list_jsonl(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith((".jsonl", ".ndjson", ".json")) and not f.startswith("_"):
                out.append(os.path.join(root, f))
    return sorted(out)  # deterministic partition order & stream offsets


def _compile_filters(filters: list[Filter]):
    """-> (supported filters, predicate fn over a parsed dict)."""
    preds, supported = [], []
    for f in filters:
        if len(getattr(f, "attribute", ())) != 1:
            continue  # nested paths unsupported
        col = f.attribute[0]
        if isinstance(f, EqualTo):
            preds.append(lambda d, c=col, v=f.value: d.get(c) == v)
        elif isinstance(f, In):
            preds.append(lambda d, c=col, vs=set(f.value): d.get(c) in vs)
        elif isinstance(f, IsNotNull):
            preds.append(lambda d, c=col: d.get(c) is not None)
        elif isinstance(f, StringStartsWith):
            preds.append(
                lambda d, c=col, v=f.value: isinstance(d.get(c), str)
                and d[c].startswith(v)
            )
        else:
            continue
        supported.append(f)
    return supported, (lambda d: all(p(d) for p in preds))


@dataclass
class _FilePartition(InputPartition):
    path: str


def _parse_file(path: str, fields: list[str], pred) -> Iterator[Tuple]:
    """Yield schema-ordered tuples; malformed lines quarantine into
    the _corrupt column (all data fields null) rather than erroring."""
    data_fields = [f for f in fields if f != CORRUPT_COL]
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            try:
                d = json.loads(line)
                if not isinstance(d, dict):
                    raise ValueError("not an object")
                d[CORRUPT_COL] = None
            except ValueError:
                if CORRUPT_COL not in fields:
                    continue
                # Quarantine rows go through the SAME pushed
                # predicate as good rows (their data fields are all
                # NULL) — pushFilters claimed these filters as fully
                # handled, so a pushed lang='en' must not leak a
                # lang=NULL corrupt row into the result.
                d = {f: None for f in fields}
                d[CORRUPT_COL] = line
            if not pred(d):
                continue
            yield tuple(d.get(f) for f in fields)


class JsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_docs requires a path")
        self.fields = [f.name for f in schema.fields]
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]):
        self.pushed, _ = _compile_filters(filters)
        # Return the filters we DON'T handle; Spark keeps those.
        return [f for f in filters if f not in self.pushed]

    def partitions(self):
        return [_FilePartition(p) for p in _list_jsonl(self.path)]

    def read(self, partition: _FilePartition) -> Iterator[Tuple]:
        _, pred = _compile_filters(self.pushed)
        yield from _parse_file(partition.path, self.fields, pred)


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp: str
    final: str


class JsonlWriter(DataSourceWriter):
    """One .jsonl file per partition. Tasks write to a temp name;
    commit() renames winners and abort()/leftovers stay invisible to
    readers (underscore prefix) — task-retry-safe exactly-once."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_docs requires a path")
        self.fields = [f.name for f in schema.fields if f.name != CORRUPT_COL]
        self.overwrite = overwrite

    def write(self, iterator) -> _FileCommit:
        os.makedirs(self.path, exist_ok=True)
        token = uuid.uuid4().hex
        tmp = os.path.join(self.path, f"_tmp-{token}.jsonl")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                d = {f: row[f] for f in self.fields}
                fh.write(json.dumps(d, sort_keys=True) + "\n")
        return _FileCommit(tmp=tmp, final=os.path.join(self.path, f"part-{token}.jsonl"))

    def commit(self, messages) -> None:
        if self.overwrite:
            for old in _list_jsonl(self.path):
                os.remove(old)
        for m in messages:
            if m is not None:
                os.rename(m.tmp, m.final)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp):
                os.remove(m.tmp)


class JsonlStreamReader(SimpleDataSourceStreamReader):
    """Directory-tail stream: offset = last consumed file name (files
    must arrive in sorted-name order, e.g. timestamp/sequence named —
    the standard drop-directory contract). Replaying [start, end)
    re-reads exactly the files in that window."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_docs requires a path")
        self.fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _files_after(self, last: str) -> list[str]:
        return [p for p in _list_jsonl(self.path) if os.path.basename(p) > last]

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        new = self._files_after(start["last"])
        if not new:
            return iter(()), start
        end = {"last": os.path.basename(new[-1])}
        # Materialize: the simple-reader contract ships this batch's
        # rows through the driver (they must be picklable, and the
        # engine caches them for commit-replay) — that bounds batch
        # size to driver memory, which is exactly the trade the
        # "simple" API makes; a partition-planned DataSourceStreamReader
        # is the path for firehose volumes.
        rows = [
            row for p in new for row in _parse_file(p, self.fields, lambda d: True)
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        rows = []
        for p in self._files_after(start["last"]):
            if os.path.basename(p) <= end["last"]:
                rows.extend(_parse_file(p, self.fields, lambda d: True))
        return iter(rows)


class JsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return DEFAULT_SCHEMA

    def reader(self, schema: StructType) -> JsonlReader:
        return JsonlReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(schema, self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> JsonlStreamReader:
        return JsonlStreamReader(schema, self.options)


def register_jsonl_source(spark) -> None:
    spark.dataSource.register(JsonlDataSource)
