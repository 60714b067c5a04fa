"""BigQuery sink interface contract (SURVEY §2a R13).

The connector jar and GCP creds don't exist in this container, so the
live write is untestable here — but the *contract* is: the writer the
sink builds must carry exactly the reference's dispositions
(HanaToBQ.java:256-259: WRITE_APPEND ≙ mode("append"), GCS-staged
batch load ≙ writeMethod=indirect with temporaryGcsBucket;
CREATE_IF_NEEDED is the connector's default create semantics).  A
recording stand-in for ``df.write`` captures the chain.
"""

from __future__ import annotations

import pytest

from hana_bq_beam_connector_spark.sinks import bigquery_append


class _RecordingWriter:
    def __init__(self, record: dict, fail: Exception | None = None):
        self._record = record
        self._fail = fail
        record["options"] = {}

    def format(self, fmt):
        self._record["format"] = fmt
        return self

    def mode(self, mode):
        self._record["mode"] = mode
        return self

    def option(self, key, value):
        self._record["options"][key] = value
        return self

    def save(self, target):
        if self._fail is not None:
            raise self._fail
        self._record["target"] = target


class _FakeDF:
    def __init__(self, record: dict, fail: Exception | None = None):
        self.write = _RecordingWriter(record, fail)


def test_bigquery_append_writer_contract():
    rec: dict = {}
    bigquery_append(
        _FakeDF(rec), "dest_ds", "events_copy", temp_bucket="stage-bkt"
    )
    assert rec["format"] == "bigquery"
    assert rec["mode"] == "append"  # WRITE_APPEND (HanaToBQ.java:257)
    # GCS-staged batch load job, the reference's write path (README:22)
    assert rec["options"]["writeMethod"] == "indirect"
    assert rec["options"]["temporaryGcsBucket"] == "stage-bkt"
    assert rec["target"] == "dest_ds.events_copy"


def test_bigquery_append_no_bucket_omits_option():
    rec: dict = {}
    bigquery_append(_FakeDF(rec), "ds", "t")
    assert "temporaryGcsBucket" not in rec["options"]
    assert rec["target"] == "ds.t"


def test_bigquery_append_fails_with_actionable_error():
    """Without the connector jar the sink must raise the documented
    actionable error (fail fast — SURVEY quirk #7 fixed), chaining
    the underlying cause."""
    cause = Exception("ClassNotFoundException: bigquery")
    with pytest.raises(RuntimeError, match="spark-bigquery-connector"):
        bigquery_append(_FakeDF({}, fail=cause), "ds", "t")


def test_bigquery_append_executed_through_fake_datasource(spark, tmp_path):
    """Upgrade from recorded-options to an *executed* write: a Python
    DataSource registered under the name ``bigquery`` receives the real
    writer chain (mode/options/target) through Spark's DSv2 write path,
    stages partitions on executors, and commits a load-job-style move —
    the same stage-then-load shape as the connector's indirect mode
    (HanaToBQ.java:256-259).  Verifies WRITE_APPEND (two appends union,
    nothing truncated) and CREATE_IF_NEEDED (table dir created)."""
    from tests._fake_bq_datasource import (
        FakeBigQueryDataSource,
        read_fake_table,
    )

    spark.dataSource.register(FakeBigQueryDataSource)
    bucket = str(tmp_path / "gcs")

    df1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id int, name string"
    ).repartition(2)
    bigquery_append(df1, "dest_ds", "events_copy", temp_bucket=bucket)
    got = read_fake_table(bucket, "dest_ds", "events_copy")
    assert sorted((r["id"], r["name"]) for r in got) == [
        (1, "alpha"),
        (2, "beta"),
        (3, "gamma"),
    ]

    # Second append: WRITE_APPEND semantics — prior rows survive.
    df2 = spark.createDataFrame([(4, "delta")], "id int, name string")
    bigquery_append(df2, "dest_ds", "events_copy", temp_bucket=bucket)
    got = read_fake_table(bucket, "dest_ds", "events_copy")
    assert len(got) == 4 and {r["id"] for r in got} == {1, 2, 3, 4}

    # Staging area is drained by the commit (the "load job" consumed it).
    import os

    assert os.listdir(os.path.join(bucket, "stage")) == []
