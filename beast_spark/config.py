"""Env-var configuration mirroring the reference's keys.

Only keys that remain meaningful under Spark are carried over (SURVEY.md
§4.2: queue capacities / ack timeouts / worker pools are replaced by
Structured Streaming's checkpointed micro-batch loop). Defaults match the
reference (``config/AppConfig.java``, ``config/BackOffConfig.java``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_bool(key: str, default: bool) -> bool:
    v = os.environ.get(key)
    return default if v is None else v.strip().lower() in ("1", "true", "yes")


def _env_int(key: str, default: int) -> int:
    v = os.environ.get(key)
    return default if v is None else int(v)


@dataclass(frozen=True)
class IngestSettings:
    """Flags governing decode/convert behavior (config/AppConfig.java:83-89,
    config/ProtoMappingConfig.java:14-16)."""

    fail_on_null_message: bool = field(
        default_factory=lambda: _env_bool("FAIL_ON_NULL_MESSAGE", False)
    )
    fail_on_deserialize_error: bool = field(
        default_factory=lambda: _env_bool("FAIL_ON_DESERIALIZE_ERROR", False)
    )
    fail_on_unknown_fields: bool = field(
        default_factory=lambda: _env_bool("FAIL_ON_UNKNOWN_FIELDS", True)
    )
    metadata_namespace: str | None = field(
        default_factory=lambda: os.environ.get("BQ_METADATA_NAMESPACE") or None
    )
    # Opt out of the JVM from_protobuf decode even when the connector is
    # present (e.g. to honor byte-exact Python-codec semantics in tests).
    force_python_decode: bool = field(
        default_factory=lambda: _env_bool("FORCE_PYTHON_DECODE", False)
    )


@dataclass(frozen=True)
class RetrySettings:
    """Push retry/backoff (config/AppConfig.java:62-64, BackOffConfig.java:6-16)."""

    max_push_attempts: int = field(default_factory=lambda: _env_int("MAX_PUSH_ATTEMPTS", 5))
    backoff_initial_ms: int = field(
        default_factory=lambda: _env_int("EXPONENTIAL_BACKOFF_INITIAL_TIME_IN_MS", 10)
    )
    backoff_rate: int = field(default_factory=lambda: _env_int("EXPONENTIAL_BACKOFF_RATE", 2))
    backoff_max_ms: int = field(
        default_factory=lambda: _env_int("EXPONENTIAL_BACKOFF_MAXIMUM_TIME_IN_MS", 60000)
    )

    def delay_ms(self, attempt: int) -> int:
        """initial · rate^attempt, capped (backoff/ExponentialBackOffProvider.java:29-32)."""
        return min(self.backoff_initial_ms * self.backoff_rate ** attempt, self.backoff_max_ms)


@dataclass(frozen=True)
class StatsSettings:
    """StatsD emission config (config/AppConfig.java:33-48). Disabled by
    default, like the reference (``@DefaultValue("false") STATSD_ENABLED``
    → NoOpStatsDClient)."""

    enabled: bool = field(default_factory=lambda: _env_bool("STATSD_ENABLED", False))
    host: str = field(default_factory=lambda: os.environ.get("STATSD_HOST", "127.0.0.1"))
    port: int = field(default_factory=lambda: _env_int("STATSD_PORT", 8125))
    prefix: str = field(default_factory=lambda: os.environ.get("STATSD_PREFIX", "beast"))

    def client(self):
        """Build the matching emitter (streaming/stats.py::StatsDClient)."""
        from beast_spark.streaming.stats import StatsDClient

        return StatsDClient(
            host=self.host, port=self.port, prefix=self.prefix, enabled=self.enabled
        )


@dataclass(frozen=True)
class OOBSettings:
    """Out-of-bounds partition-date window (handler/error/OOBError.java:22-26):
    a day-partition key older than ``past_days`` or further than
    ``future_days`` ahead is routed to the DLQ instead of the main sink."""

    past_days: int = 1825
    future_days: int = 366
