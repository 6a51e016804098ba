"""Pipeline configuration (reference R24: viper reads config.yaml + env
overrides, ``cmd/main.go:18-23``; schema in reference ``README.md:64-88``).

Engine shape: a dataclass loaded from YAML (if pyyaml is present) or JSON,
with ``CDC_``-prefixed environment variables overriding file values -- the
same precedence the reference uses. The config carries the same concerns:
which tables to replicate, where the changelog/sink/checkpoint live, and
backpressure.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

try:
    import yaml  # type: ignore

    _HAVE_YAML = True
except ModuleNotFoundError:  # pragma: no cover - environment-dependent
    _HAVE_YAML = False


@dataclass
class CdcConfig:
    tables: list[str] = field(default_factory=list)  # "schema.table" pairs (README.md:73-74)
    changelog_dir: str = "changelog"
    sink_dir: str = "sink"
    checkpoint_dir: str = "checkpoint"
    audit_log_path: str | None = None  # R25's cdc-logs.db analogue; None = audit disabled
    max_files_per_trigger: int | None = None  # backpressure (R9/maxOffsetsPerTrigger analogue)
    kafka_brokers: str | None = None
    kafka_topic: str | None = None
    fmt: str = "json"  # event-log format: json (wire parity) | parquet/orc (throughput)

    @classmethod
    def load(cls, path: str | None = None, env: dict[str, str] | None = None) -> "CdcConfig":
        raw: dict = {}
        if path and os.path.exists(path):
            with open(path) as f:
                text = f.read()
            if _HAVE_YAML and (path.endswith(".yaml") or path.endswith(".yml")):
                raw = yaml.safe_load(text) or {}
            else:
                raw = json.loads(text)
        env = dict(os.environ if env is None else env)
        # env override: CDC_SINK_DIR=... beats the file, like viper's AutomaticEnv
        for f_ in cls.__dataclass_fields__:
            key = f"CDC_{f_.upper()}"
            if key in env:
                val: object = env[key]
                if f_ == "tables":
                    val = [t.strip() for t in str(val).split(",") if t.strip()]
                elif f_ == "max_files_per_trigger":
                    val = int(val)  # type: ignore[arg-type]
                raw[f_] = val
        known = {k: v for k, v in raw.items() if k in cls.__dataclass_fields__}
        return cls(**known)

    def build_pipeline(self, spark):
        from .streaming.pipeline import CdcPipeline

        return CdcPipeline(
            spark=spark,
            changelog_dir=self.changelog_dir,
            sink_dir=self.sink_dir,
            checkpoint_dir=self.checkpoint_dir,
            max_files_per_trigger=self.max_files_per_trigger,
            audit_log_path=self.audit_log_path,
            fmt=self.fmt,
        )
