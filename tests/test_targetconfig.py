"""Target-config matcher tests, transcribed from the reference suite
(/root/reference/crates/model/src/config.rs:312-436), plus the archive
manifest adapter (source.rs:95-161 semantics)."""

import pytest

from logjuicer_spark.targetconfig import Config, ConfigError


def config_from_yaml(text: str) -> Config:
    import yaml

    return Config.from_data(yaml.safe_load(text))


def config_check(config: Config, path: str) -> bool:
    return config.get_target_config("test").fileset.is_fp_valid(path)


def test_config_default_exclude():
    # config.rs:312-329
    config = Config.from_data(None)
    tc = config.get_target_config("test")
    for src in [
        "config.yaml",
        "/config/.git/HEAD",
        "font.ttf.gz",
        "/system/etc/conf",
        "blah/sos_commands/selinux/ps_auxZww",
        "blurp/sos_commands/process/ps_alxwww",
        "foo/sos_commands/process/ps_-elfL",
    ]:
        assert tc.fileset.is_fp_valid(src) is False


def test_config_default():
    # config.rs:331-337
    config = config_from_yaml("")
    for src in ["service/api.log", "job-output.txt"]:
        assert config_check(config, src) is True


def test_config_include():
    # config.rs:350-363
    config = config_from_yaml("includes:\n  - undercloud/deploy.log\n")
    assert config_check(config, "service/api.log") is False
    assert config_check(config, "undercloud/deploy.log") is True
    assert config_check(config, "undercloud/deploy.log.log") is True
    assert config_check(config, "undercloud/deploy.log.png") is False


def test_config_exclude():
    # config.rs:365-376
    config = config_from_yaml("excludes:\n  - bzImage\n")
    assert config_check(config, "deploy/bzImage.gz") is False
    assert config_check(config, "test.png") is False
    assert config_check(config, "undercloud/deploy.log") is True


def test_config_no_default():
    # config.rs:378-390
    config = config_from_yaml("default_excludes: false\nexcludes:\n  - bzImage\n")
    assert config_check(config, "test.png") is True
    assert config_check(config, "/.git/config") is True
    assert config_check(config, "boot/bzImage") is False


def test_config_bad():
    # config.rs:392-412: unknown fields are rejected in yaml and json
    with pytest.raises(ConfigError):
        config_from_yaml("unknown: true")
    with pytest.raises(ConfigError):
        Config.from_data({"unknown": True})


def test_config_match():
    # config.rs:414-436
    config = config_from_yaml(
        """
- match_job: config-.*
  config: {}
- match_job: linters
  config:
    ignore_patterns:
    - fetch log
"""
    )
    # the reference matches Content::sample_job(name), whose job_name is
    # "{name}-job" (report.rs:313-327)
    def target_config(name):
        return config.test_target_config(f"{name}-job")

    assert target_config("proj-linters") is not None
    assert target_config("config-check") is not None
    assert target_config("unit") is None

    import re

    patterns = target_config("linters")[1]
    assert any(re.search(p, "- task: fetch log") for p in patterns.ignore_patterns)
    assert not any(re.search(p, "traceback") for p in patterns.ignore_patterns)

    no_patterns = target_config("config")[1]
    assert not no_patterns.ignore_patterns


def test_config_pipeline_projection(monkeypatch):
    config = config_from_yaml("ignore_patterns:\n  - noisy\nskip_duplicate: false\n")
    pc = config.get_target_config(None).to_pipeline_config()
    assert pc.ignore_patterns == ("noisy",) and pc.skip_duplicate is False
    # config.rs:168-172: the env var forces skip_duplicate off
    monkeypatch.setenv("LOGJUICER_KEEP_DUPLICATE", "1")
    pc2 = config_from_yaml("skip_duplicate: true\n").get_target_config(
        None
    ).to_pipeline_config()
    assert pc2.skip_duplicate is False


def test_config_empty_matcher_list():
    with pytest.raises(ConfigError, match="empty"):
        Config.from_data([])


def test_cli_consumes_config_file(tmp_path, spark):
    """End-to-end: a matcher config selects per-job ignore_patterns that
    suppress an otherwise-novel anomaly line."""
    import json

    from logjuicer_spark import cli

    cfgf = tmp_path / "cfg.yaml"
    cfgf.write_text(
        "- match_job: noisy-.*\n"
        "  config:\n"
        "    ignore_patterns:\n"
        "    - explosion\n"
        "- config: {}\n"
    )
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    b = spark.createDataFrame(
        [("b", i, "log", f"steady line {w}", "bash", None)
         for i, w in enumerate(["alpha", "bravo", "charlie"])],
        schema,
    )
    t = spark.createDataFrame(
        [("t", 0, "log", "steady line alpha", "bash", None),
         ("t", 1, "log", "totally novel explosion", "bash", None)],
        schema,
    )
    bdir, tdir = str(tmp_path / "b"), str(tmp_path / "t")
    b.write.parquet(bdir)
    t.write.parquet(tdir)

    def run(job):
        out = str(tmp_path / f"out-{job}")
        cli.main(["--out", out, "--config", str(cfgf), "--job-name", job,
                  "diff", bdir, tdir])
        html = open(f"{out}/report.html").read()  # S11 browsable artifact
        assert "logjuicer-spark report" in html
        return json.load(open(f"{out}/report.json"))["total_anomaly_count"]

    assert run("noisy-gate") == 0      # matcher 0: explosion ignored
    assert run("other-job") == 1       # fallback matcher: plain config