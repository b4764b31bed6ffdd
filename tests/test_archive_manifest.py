"""Archive-manifest adapter (S7 analog; source.rs:95-161 semantics)."""

from pyspark.sql import functions as F

from logjuicer_spark import pipeline
from logjuicer_spark.config import FileSetConfig

SCHEMA = "archive string, entry string, line_nr int, text string"


def _manifest(spark, archive, lines_by_entry):
    rows = [
        (archive, entry, i + 1, text)
        for entry, lines in lines_by_entry.items()
        for i, text in enumerate(lines)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_adapter_shape_and_fileset(spark):
    m = _manifest(
        spark,
        "ci/logs.tar.gz",
        {
            "job-output.txt": ["task alpha ok", "task bravo ok"],
            "controller/service.log": ["service started cleanly"],
            "font.ttf": ["binarygarbage"],  # default-excluded entry
        },
    )
    turns = pipeline.from_archive_manifest(m, fileset=FileSetConfig())
    rows = turns.collect()
    convs = {r.conv_id for r in rows}
    # one source per archive entry, named like Source::TarFile's url
    assert convs == {
        "ci/logs.tar.gz?entry=job-output.txt",
        "ci/logs.tar.gz?entry=controller/service.log",
    }
    # IndexName derives from the ENTRY path, not the archive
    tools = {r.conv_id: r.tool for r in rows}
    assert tools["ci/logs.tar.gz?entry=job-output.txt"] != ""
    assert len(rows) == 3


def test_two_archive_diff_end_to_end(spark):
    base_lines = [f"deploy step {w} finished" for w in ["alpha", "bravo", "charlie"]]
    baseline = _manifest(spark, "run1.tar", {"job-output.txt": base_lines})
    target = _manifest(
        spark,
        "run2.tar",
        {"job-output.txt": base_lines[:2] + ["kernel panicked badly tonight"]},
    )
    out = pipeline.run(
        spark,
        pipeline.from_archive_manifest(target),
        baseline_turns=pipeline.from_archive_manifest(baseline),
    )
    anoms = out["anomalies"].collect()
    assert [(r.conv_id, r.turn_idx) for r in anoms] == [
        ("run2.tar?entry=job-output.txt", 3)
    ]
    # entries with equivalent paths across archives share one index/tool
    assert anoms[0].tool == pipeline.from_archive_manifest(baseline).select(
        "tool"
    ).first()[0]
