"""E3/E4 tests: barrier-mode ClusterSpec rendezvous and the MLlib
training analogue."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from xlearning_spark.ml import build_cluster_specs, train_text_classifier
from xlearning_spark.sources import read_table


def test_cluster_spec_rendezvous(spark):
    specs = build_cluster_specs(spark, n_workers=4)
    assert len(specs) == 4
    # every worker derived the same membership (the rendezvous
    # guarantee the reference implements via AM polling)
    clusters = {str(s["cluster"]) for s in specs}
    assert len(clusters) == 1
    cluster = specs[0]["cluster"]
    assert len(cluster["chief"]) == 1
    assert len(cluster["worker"]) == 3
    # unique endpoints
    eps = cluster["chief"] + cluster["worker"]
    assert len(set(eps)) == 4
    # roles/indices are per-worker and consistent
    roles = sorted((s["task"]["type"], s["task"]["index"]) for s in specs)
    assert roles == [("chief", 0), ("worker", 0), ("worker", 1), ("worker", 2)]


def test_text_classifier_trains(spark):
    from pyspark.sql import functions as F

    # The fixture's lang column is independent of the text (verified:
    # marker words are uniform across langs), so no model can learn it.
    # Train on a content-derived label instead: the pipeline must
    # recover a separable signal near-perfectly.
    docs = read_table(spark, SF_SMOKE, "documents").withColumn(
        "target", F.when(F.col("text").contains("spark"), "spark").otherwise("other")
    )
    model, acc = train_text_classifier(docs, "text", "target")
    assert acc > 0.95, acc
    pred = model.transform(docs)
    assert pred.count() == docs.count()


def test_framework_env_contracts():
    # E4: exact env-variable contract per framework
    # (HboxContainer.java:944-1050).
    import json

    from xlearning_spark.ml import framework_env

    cluster = {
        "worker": ["h1:2222", "h2:2222"],
        "ps": ["h0:2000"],
        "tracker": ["h0:9091"],
    }

    tf = framework_env("tensorflow", "worker", 1, cluster)
    assert tf["TF_ROLE"] == "worker" and tf["TF_INDEX"] == "1"
    cfg = json.loads(tf["TF_CONFIG"])
    assert cfg["cluster"]["worker"] == ["h1:2222", "h2:2222"]
    assert cfg["task"] == {"type": "worker", "index": 1}
    assert json.loads(tf["TF_CLUSTER_DEF"]) == cfg["cluster"]

    mx_w = framework_env("mxnet", "worker", 0, cluster)
    assert mx_w["DMLC_PS_ROOT_URI"] == "h0" and mx_w["DMLC_PS_ROOT_PORT"] == "2000"
    assert mx_w["DMLC_NUM_WORKER"] == "2" and mx_w["DMLC_NUM_SERVER"] == "1"
    assert mx_w["DMLC_WORKER_ID"] == "0" and "DMLC_SERVER_ID" not in mx_w
    mx_s = framework_env("mxnet", "ps", 0, cluster)
    assert mx_s["DMLC_SERVER_ID"] == "0" and "DMLC_WORKER_ID" not in mx_s

    xgb = framework_env("xgboost", "worker", 1, cluster)
    assert xgb["DMLC_TRACKER_URI"] == "h0" and xgb["DMLC_TRACKER_PORT"] == "9091"
    assert xgb["DMLC_TASK_ID"] == "1"

    gen = framework_env("generic", "worker", 3)
    assert gen == {"INDEX": "3", "ROLE": "worker"}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        framework_env("caffe", "worker", 0)
    with _pytest.raises(ValueError):
        framework_env("mxnet", "worker", 0, {"worker": ["h1:1"]})


def test_framework_env_through_pipe(spark):
    # The env contract must actually reach a launched child: pipe a
    # command that echoes TF_CONFIG back and parse it.
    from xlearning_spark.ml import framework_env
    from xlearning_spark.operators.pipe import pipe_lines

    env = framework_env(
        "tensorflow", "worker", 0, {"worker": ["h1:2222"], "ps": ["h0:2000"]}
    )
    df = spark.createDataFrame([("x",)], "line string").coalesce(1)
    out = pipe_lines(df, ["sh", "-c", 'echo "$TF_CONFIG"'], env=env).collect()
    import json

    cfg = json.loads(out[0]["line"])
    assert cfg["cluster"]["ps"] == ["h0:2000"]
    assert cfg["task"] == {"type": "worker", "index": 0}
