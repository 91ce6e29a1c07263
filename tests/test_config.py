"""Env-var config compatibility: the reference's keys (MIGRATION.md) must
actually flow into the settings dataclasses."""

from __future__ import annotations

from beast_spark.config import IngestSettings, OOBSettings, RetrySettings, StatsSettings


def test_ingest_settings_env_overrides(monkeypatch):
    monkeypatch.setenv("FAIL_ON_NULL_MESSAGE", "true")
    monkeypatch.setenv("FAIL_ON_DESERIALIZE_ERROR", "1")
    monkeypatch.setenv("FAIL_ON_UNKNOWN_FIELDS", "false")
    monkeypatch.setenv("BQ_METADATA_NAMESPACE", "__meta")
    monkeypatch.setenv("FORCE_PYTHON_DECODE", "yes")
    s = IngestSettings()
    assert s.fail_on_null_message and s.fail_on_deserialize_error
    assert not s.fail_on_unknown_fields
    assert s.metadata_namespace == "__meta"
    assert s.force_python_decode


def test_retry_settings_env_and_backoff_formula(monkeypatch):
    monkeypatch.setenv("MAX_PUSH_ATTEMPTS", "3")
    monkeypatch.setenv("EXPONENTIAL_BACKOFF_INITIAL_TIME_IN_MS", "7")
    monkeypatch.setenv("EXPONENTIAL_BACKOFF_RATE", "3")
    monkeypatch.setenv("EXPONENTIAL_BACKOFF_MAXIMUM_TIME_IN_MS", "50")
    r = RetrySettings()
    assert r.max_push_attempts == 3
    # initial·rate^attempt capped at max (ExponentialBackOffProvider.java:29-32)
    assert [r.delay_ms(a) for a in range(4)] == [7, 21, 50, 50]


def test_reference_defaults_without_env(monkeypatch):
    for k in (
        "FAIL_ON_NULL_MESSAGE", "FAIL_ON_DESERIALIZE_ERROR", "FAIL_ON_UNKNOWN_FIELDS",
        "BQ_METADATA_NAMESPACE", "MAX_PUSH_ATTEMPTS",
        "EXPONENTIAL_BACKOFF_INITIAL_TIME_IN_MS",
    ):
        monkeypatch.delenv(k, raising=False)
    assert IngestSettings().fail_on_unknown_fields  # reference default: true
    assert RetrySettings().max_push_attempts == 5
    assert OOBSettings().past_days == 1825 and OOBSettings().future_days == 366


def test_statsd_settings_env_and_disabled_default(monkeypatch):
    """AppConfig.java:33-48: STATSD_* keys; disabled default = no-op client."""
    for k in ("STATSD_ENABLED", "STATSD_HOST", "STATSD_PORT", "STATSD_PREFIX"):
        monkeypatch.delenv(k, raising=False)
    s = StatsSettings()
    assert not s.enabled and s.port == 8125
    assert s.client().enabled is False  # NoOpStatsDClient analog
    monkeypatch.setenv("STATSD_ENABLED", "true")
    monkeypatch.setenv("STATSD_HOST", "metrics.local")
    monkeypatch.setenv("STATSD_PORT", "9125")
    monkeypatch.setenv("STATSD_PREFIX", "beastly")
    s = StatsSettings()
    assert (s.enabled, s.host, s.port, s.prefix) == (True, "metrics.local", 9125, "beastly")
