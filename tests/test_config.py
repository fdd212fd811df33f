"""Config-tree wiring: YAML → expectation suites → pipeline knobs
(reference config_loader.py + validation_config.yml declarative path)."""

from __future__ import annotations

import os

from real_time_data_pipeline_spark.config import Config, get_path
from real_time_data_pipeline_spark.operators.quality import (
    apply_suite,
    suite_from_config,
)
from real_time_data_pipeline_spark.streaming.pipeline import PipelineConfig

ENGINE_YML = os.path.join(
    os.path.dirname(__file__), "..", "config", "engine.yml"
)


def test_dot_path_lookup_with_default():
    cfg = Config(path=ENGINE_YML)
    assert cfg.get("streaming.watermark_delay") == "30 minutes"
    assert cfg.get("kafka.topics.dead_letter") == "banking.transactions.deadletter"
    assert cfg.get("no.such.path", "fallback") == "fallback"
    assert get_path({"a": {"b": 1}}, "a.b") == 1


def test_pipeline_config_from_yaml():
    pc = PipelineConfig.from_config(Config(path=ENGINE_YML))
    assert pc.window_duration == "1 hour"
    assert pc.slide is None
    assert pc.watermark == "30 minutes"
    assert pc.alert_amount_threshold == 10_000.0


def test_suite_from_config_validates_rows(spark):
    cfg = Config(path=ENGINE_YML)
    rules = cfg.get("validation.suites.transactions")
    suite = suite_from_config(rules)
    assert len(suite) == 9  # 8 reference expectations + dateutil_parseable

    df = spark.createDataFrame(
        [
            ("T1", "A1", "deposit", 100.0, "USD", "completed", "2024-01-01T10:00:00"),
            ("T2", "A1", "bribery", 100.0, "USD", "completed", "2024-01-01T10:00:00"),
            ("T3", "A1", "deposit", -5.0, "USD", "completed", "2024-01-01T10:00:00"),
            (None, "A1", "deposit", 100.0, "USD", "completed", "2024-01-01T10:00:00"),
        ],
        "transaction_id string, account_id string, transaction_type string,"
        "amount double, currency string, status string, timestamp string",
    )
    out = {r.transaction_id: r for r in apply_suite(df, suite).collect()}
    assert out["T1"].dq_valid is True
    assert out["T2"].dq_valid is False
    assert any("in_set" in e for e in out["T2"].dq_errors)
    assert out["T3"].dq_valid is False
    assert any("between" in e for e in out["T3"].dq_errors)
    assert out[None].dq_valid is False


def test_accounts_suite_from_config(spark):
    cfg = Config(path=ENGINE_YML)
    suite = suite_from_config(cfg.get("validation.suites.accounts"))
    df = spark.createDataFrame(
        [("A1", "C1", "checking"), ("A1", "C2", "margin"), ("A2", None, "savings")],
        "account_id string, customer_id string, account_type string",
    )
    rows = apply_suite(df, suite).collect()
    # A1 duplicated -> unique fails for both; 'margin' not in set; null customer
    assert sum(r.dq_valid for r in rows) == 0 or all(
        not r.dq_valid for r in rows if r.account_id == "A1"
    )
    a2 = [r for r in rows if r.account_id == "A2"][0]
    assert not a2.dq_valid and any("not_null" in e for e in a2.dq_errors)
