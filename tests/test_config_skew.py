"""R24 config loader precedence + salted aggregation equivalence."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from change_data_capture_service_spark.config import CdcConfig
from change_data_capture_service_spark.catalog import load_table
from change_data_capture_service_spark.plans.skew import salted_agg


def test_config_file_plus_env_override(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps({"tables": ["public.users"], "sink_dir": "from_file"}))
    cfg = CdcConfig.load(str(p), env={"CDC_SINK_DIR": "from_env", "CDC_TABLES": "a.b, c.d"})
    assert cfg.sink_dir == "from_env"          # env beats file (viper AutomaticEnv)
    assert cfg.tables == ["a.b", "c.d"]
    assert cfg.checkpoint_dir == "checkpoint"  # default survives


def test_config_builds_pipeline(spark, tmp_path):
    cfg = CdcConfig(
        changelog_dir=str(tmp_path / "log"),
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    pipe = cfg.build_pipeline(spark)
    users = spark.createDataFrame([(1, "ada")], "id long, name string")
    pipe.snapshot(users, "public", "users", pk_cols=["id"])
    pipe.run_available()
    assert pipe.latest_state("public", "users").count() == 1


def test_salted_agg_equals_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    plain = {
        (r["user_id"]): r["n_types"]
        for r in e.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n_types"))
        .collect()
    }
    salted = {
        (r["user_id"]): r["n_types"]
        for r in salted_agg(
            e,
            ["user_id"],
            partial_aggs=[F.collect_set("event_type").alias("types")],
            merge_aggs=[
                F.size(F.array_distinct(F.flatten(F.collect_list("types")))).alias("n_types")
            ],
        ).collect()
    }
    assert salted == plain
