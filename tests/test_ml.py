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
