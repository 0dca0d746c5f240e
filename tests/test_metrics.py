"""Heartbeat reporter + comm-factor accounting (reference status thread /
network comm factor, work_distributor.cpp:24-90, parser.py:21-27)."""

from __future__ import annotations

import json
import time

from landscape_spark.metrics import HeartbeatReporter, comm_factor, stage_totals


def test_heartbeat_writes_jsonl(spark, tmp_path):
    path = str(tmp_path / "hb.jsonl")
    hb = HeartbeatReporter(spark, path, interval=0.1).start()
    spark.range(2_000_000).selectExpr("id % 97 as k").groupBy("k").count().collect()
    time.sleep(0.35)
    hb.stop()
    lines = [json.loads(x) for x in open(path) if x.strip()]
    assert len(lines) >= 2
    for rec in lines:
        assert "ts" in rec and "active_stages" in rec


def test_comm_factor_arithmetic():
    before = {"shuffle_write_bytes": 100, "shuffle_read_bytes": 0, "input_bytes": 0, "output_bytes": 0, "n_stages": 1}
    after = {"shuffle_write_bytes": 1700, "shuffle_read_bytes": 0, "input_bytes": 0, "output_bytes": 0, "n_stages": 2}
    assert comm_factor(before, after, 800) == 2.0
    assert comm_factor(None, after, 800) is None
    assert comm_factor(before, after, 0) is None


def test_stage_totals_none_when_ui_disabled(spark):
    # the shared test session runs with spark.ui.enabled=false
    assert stage_totals(spark) is None
