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
