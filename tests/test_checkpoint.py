"""Checkpoint-resume: stages skip on re-run, recompute on change,
manifests carry per-partition lineage."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from openmldb_spark.plans.checkpoint import CheckpointedPipeline


def _build(spark, tmp, threshold):
    from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

    p = CheckpointedPipeline(spark, tmp)
    p.stage(
        "featurize",
        lambda s, up: window_agg(
            s.read.parquet("/root/testdata/sf0.001/events.parquet"),
            WindowSpec(["user_id"], "ts", "rows", 5, tiebreak=["event_id"]),
            [Agg("sum", "value", "s5"), Agg("count", None, "c5")],
            impl="kernel",
        ),
    )
    p.stage(
        "filter_hot",
        lambda s, up: up["featurize"].filter(F.col("s5") > threshold),
        depends_on=("featurize",),
    )
    return p


def test_resume_skips_clean_stages(spark, tmp_path):
    d = str(tmp_path / "ckpt")
    r1 = _build(spark, d, 100).run()
    assert not r1["featurize"].skipped and not r1["filter_hot"].skipped
    assert r1["featurize"].rows == 1000

    # identical pipeline → both stages resume from checkpoint
    r2 = _build(spark, d, 100).run()
    assert r2["featurize"].skipped and r2["filter_hot"].skipped
    assert r2["featurize"].rows == r1["featurize"].rows

    # change only the downstream stage → upstream stays checkpointed
    r3 = _build(spark, d, 200).run()
    assert r3["featurize"].skipped
    assert not r3["filter_hot"].skipped
    assert r3["filter_hot"].rows < r1["filter_hot"].rows


def test_manifest_lineage(spark, tmp_path):
    d = str(tmp_path / "ckpt2")
    res = _build(spark, d, 100).run()
    man = json.load(open(os.path.join(d, "featurize", "_manifest.json")))
    assert man["rows"] == 1000
    assert len(man["partitions"]) >= 1
    for part in man["partitions"]:
        assert set(part) == {"file", "rows", "bytes", "row_groups"}
    assert sum(p["rows"] for p in man["partitions"]) == 1000
    # schema recorded for drift detection
    assert "s5" in man["schema"]

    p = _build(spark, d, 100)
    rep = p.report(res)
    assert rep["stages"][0]["rows"] == 1000
    assert rep["total_wall_sec"] > 0


def test_force_rerun(spark, tmp_path):
    d = str(tmp_path / "ckpt3")
    _build(spark, d, 100).run()
    r = _build(spark, d, 100).run(force=True)
    assert not r["featurize"].skipped
