"""Per-job target configuration with job-name matchers.

Semantic port of the reference's user config
(/root/reference/crates/model/src/config.rs:31-257, env.rs:95-121):

- a config file (YAML or JSON by extension) is either a single static
  target config (a mapping) or a LIST of matchers, each ``{match_job:
  <regex>, config: {...}}``; the first matcher whose regex matches the
  job name wins, and a no-regex matcher matches everything
  (config.rs:224-249)
- a target config carries includes/excludes (+ the default exclude list,
  config.rs:152-166), skip_duplicate, ignore_patterns and extra_baselines
  (config.rs:137-196)
- unknown fields are rejected (serde deny_unknown_fields)
- LOGJUICER_KEEP_DUPLICATE in the environment forces skip_duplicate off
  (config.rs:168-172)
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from .config import FileSetConfig

_TARGET_FIELDS = {
    "includes", "excludes", "default_excludes", "skip_duplicate",
    "ignore_patterns", "extra_baselines",
}


class ConfigError(ValueError):
    pass


@dataclass(frozen=True)
class TargetConfig:
    """One resolved target config (config.rs:137-221)."""

    fileset: FileSetConfig = field(default_factory=FileSetConfig)
    skip_duplicate: bool = True
    ignore_patterns: tuple = ()
    extra_baselines: tuple = ()

    @classmethod
    def from_dict(cls, d: dict) -> "TargetConfig":
        if not isinstance(d, dict):
            raise ConfigError(f"target config must be a mapping, got {type(d).__name__}")
        unknown = set(d) - _TARGET_FIELDS
        if unknown:
            raise ConfigError(f"unknown config fields: {sorted(unknown)}")
        for pat in list(d.get("includes", [])) + list(d.get("excludes", [])) + list(
            d.get("ignore_patterns", [])
        ):
            re.compile(pat)  # fail fast on bad regexes (config.rs BadRegex)
        skip_duplicate = bool(d.get("skip_duplicate", True))
        if os.environ.get("LOGJUICER_KEEP_DUPLICATE") is not None:
            skip_duplicate = False  # config.rs:168-172
        return cls(
            fileset=FileSetConfig(
                includes=tuple(d.get("includes", [])),
                excludes=tuple(d.get("excludes", [])),
                default_excludes=bool(d.get("default_excludes", True)),
            ),
            skip_duplicate=skip_duplicate,
            ignore_patterns=tuple(d.get("ignore_patterns", [])),
            extra_baselines=tuple(d.get("extra_baselines", [])),
        )

    def to_pipeline_config(self, base=None, **overrides):
        """Project onto a PipelineConfig (ignore_patterns + skip_duplicate;
        the fileset applies at the source-table stage, see
        pipeline.from_log_table)."""
        from dataclasses import replace

        from .pipeline import PipelineConfig

        base = base or PipelineConfig()
        return replace(
            base,
            ignore_patterns=self.ignore_patterns,
            skip_duplicate=self.skip_duplicate,
            **overrides,
        )


@dataclass(frozen=True)
class MatcherConfig:
    """Job-name matcher (config.rs:224-249): no regex matches everything."""

    job_re: str | None = None

    def matches(self, job_name: str | None) -> bool:
        # Reference parity (config.rs:241-248): content WITHOUT a job name
        # matches ANY matcher (`_ => true`), so with job_name=None the first
        # entry's config applies rather than the default fallback.
        if self.job_re is None or job_name is None:
            return True
        return re.search(self.job_re, job_name) is not None


class Config:
    """The loaded user config: static, or first-match-wins matcher list
    with a default fallback (config.rs:31-37, 108-133)."""

    def __init__(self, static: TargetConfig | None = None,
                 matchers: list[tuple[MatcherConfig, TargetConfig]] | None = None):
        if matchers is not None and not matchers:
            raise ConfigError("Target list is empty")
        self._static = static if matchers is None else None
        self._matchers = matchers
        self._default = TargetConfig.from_dict({})

    @classmethod
    def from_path(cls, path: str) -> "Config":
        ext = os.path.splitext(path)[1].lower()
        with open(path) as f:
            raw = f.read()
        if ext == ".yaml":
            import yaml

            data = yaml.safe_load(raw)
        elif ext == ".json":
            data = json.loads(raw)
        else:
            raise ConfigError(f"unknown format: {ext.lstrip('.')}")
        return cls.from_data(data)

    @classmethod
    def from_data(cls, data) -> "Config":
        if data is None:
            return cls(static=TargetConfig.from_dict({}))
        if isinstance(data, dict):
            return cls(static=TargetConfig.from_dict(data))
        if isinstance(data, list):
            matchers = []
            for entry in data:
                if not isinstance(entry, dict) or set(entry) - {"match_job", "config"}:
                    raise ConfigError(f"bad matcher entry: {entry!r}")
                job_re = entry.get("match_job")
                if job_re is not None:
                    re.compile(job_re)
                matchers.append(
                    (MatcherConfig(job_re), TargetConfig.from_dict(entry.get("config", {})))
                )
            return cls(matchers=matchers)
        raise ConfigError(f"config must be a mapping or a list, got {type(data).__name__}")

    def get_target_config(self, job_name: str | None = None) -> TargetConfig:
        if self._matchers is None:
            return self._static
        for mc, tc in self._matchers:
            if mc.matches(job_name):
                return tc
        return self._default

    def test_target_config(self, job_name: str | None = None):
        """Debug helper (config.rs:122-133): (matcher position, config) or
        None when no matcher fires."""
        if self._matchers is None:
            return (0, self._static)
        for pos, (mc, tc) in enumerate(self._matchers):
            if mc.matches(job_name):
                return (pos, tc)
        return None
