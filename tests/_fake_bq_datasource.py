"""In-process fake of the spark-bigquery-connector (test scaffolding).

Registers a Python DataSource named ``bigquery`` (Spark 4 DataSource
API) so ``sinks.bigquery_append`` can be *executed* — not mocked —
end-to-end through Spark's real write path: options resolve through
the DSv2 option plumbing, ``write()`` runs per-partition on executors,
and ``commit()`` performs the staged "load job" on the driver.  The
shape mirrors the connector's indirect write mode (≙ the reference's
GCS-staged batch load, HanaToBQ.java:256-259):

- executors stage partition files under ``<temporaryGcsBucket>/stage/``
  (the GCS staging area),
- the driver's commit moves every staged part into
  ``<temporaryGcsBucket>/tables/<dataset.table>/`` atomically-ish (the
  BigQuery load job), so an aborted write leaves the table untouched,
- append mode never truncates (WRITE_APPEND) and creates the table
  directory if absent (CREATE_IF_NEEDED).

Kept free of pytest imports: the module is registered with cloudpickle
by value so executor workers can deserialize the class without having
``tests/`` importable.
"""

from __future__ import annotations

import json
import os
import sys
import uuid
from dataclasses import dataclass

from pyspark import cloudpickle
from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class StagedPart(WriterCommitMessage):
    staged_path: str
    rows: int


def _opt(options: dict, key: str) -> str | None:
    # DSv2 option maps are case-insensitive; Python sees lowercase keys.
    for k, v in options.items():
        if k.lower() == key.lower():
            return v
    return None


class FakeBigQueryWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.overwrite = overwrite
        self.write_method = _opt(options, "writeMethod")
        bucket = _opt(options, "temporaryGcsBucket")
        if not bucket:
            raise ValueError("indirect write mode needs temporaryGcsBucket")
        target = _opt(options, "path")  # df.write.save("<dataset.table>")
        if not target or "." not in target:
            raise ValueError(f"expected dataset.table target, got {target!r}")
        self.stage_dir = os.path.join(bucket, "stage")
        self.table_dir = os.path.join(bucket, "tables", target)

    def write(self, iterator):  # executor-side: stage one partition
        os.makedirs(self.stage_dir, exist_ok=True)
        path = os.path.join(self.stage_dir, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return StagedPart(staged_path=path, rows=n)

    def commit(self, messages):  # driver-side: the "load job"
        os.makedirs(self.table_dir, exist_ok=True)  # CREATE_IF_NEEDED
        for m in messages:
            dest = os.path.join(self.table_dir, os.path.basename(m.staged_path))
            os.replace(m.staged_path, dest)  # WRITE_APPEND: add, never truncate

    def abort(self, messages):  # failed job: table dir untouched
        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


class FakeBigQueryDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bigquery"

    def writer(self, schema, overwrite: bool):
        return FakeBigQueryWriter(self.options, overwrite)


def read_fake_table(bucket: str, dataset: str, table: str) -> list[dict]:
    """Driver-side helper: read back what the fake 'load job' committed."""
    table_dir = os.path.join(bucket, "tables", f"{dataset}.{table}")
    rows: list[dict] = []
    if not os.path.isdir(table_dir):
        return rows
    for name in sorted(os.listdir(table_dir)):
        with open(os.path.join(table_dir, name)) as f:
            rows.extend(json.loads(line) for line in f if line.strip())
    return rows


cloudpickle.register_pickle_by_value(sys.modules[__name__])
