"""Dataset-harness e2e (reference `logjuicer test` layout, dataset.rs)."""

import os

import pytest

from logjuicer_spark.dataset import check_dataset, load_inf

BASE = os.path.join(os.path.dirname(__file__), "datasets")


@pytest.mark.parametrize("name", sorted(os.listdir(BASE)))
def test_dataset(spark, name):
    assert check_dataset(spark, os.path.join(BASE, name)) == "ok"


def test_load_inf():
    inf = load_inf(os.path.join(BASE, "ci-job"))
    assert inf["anomalies"] == [
        "compiler crashed with signal",
        "cannot continue without compiled artifacts",
    ]
    assert inf["skip"] is False
