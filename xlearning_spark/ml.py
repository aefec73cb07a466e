"""Distributed-training orchestration analogue (SURVEY.md §2.3 E3/E4).

The reference's core training workflow: workers reserve ports and
report them to the AM, which assembles a sorted role->host:port
ClusterSpec JSON once every worker has checked in; each container then
reads TF_CONFIG and joins the rendezvous (reference:
ApplicationContainerListener.java:540-549, 768-806;
HboxContainer.java:758-801). Framework launchers then run the actual
training (HboxContainer.java:944-1050).

Spark-native mapping:
  E3 rendezvous -> barrier execution: ``BarrierTaskContext.barrier()``
     is the all-present gate and ``getTaskInfos()`` is the membership
     list, so the ClusterSpec can be assembled inside each barrier task
     with no side-channel RPC at all.
  E4 launchers  -> ``spark.ml`` pipelines (the MLlib analogue named by
     the build mandate): tokenize -> hash features -> IDF -> logistic
     regression, trained distributed by Spark itself.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def build_cluster_specs(spark, n_workers: int, base_port: int = 2222) -> list[dict]:
    """E3: one TF_CONFIG-shaped dict per worker via a barrier stage.

    Every worker enters ``barrier()`` (the all-present rendezvous the
    reference implements with reserved-port polling), then derives the
    same sorted worker list from ``getTaskInfos()`` — so all specs
    agree without any coordinator. Worker 0 doubles as chief, like the
    reference's TF ClusterSpec assembly (Listener:768-806).
    """
    sc = spark.sparkContext

    def assemble(index_iter):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        ctx.barrier()  # rendezvous: nobody proceeds until all present
        infos = ctx.getTaskInfos()
        # Deterministic ordering by partition position (the reference
        # sorts by worker index, Listener:1038-1051); address:port is
        # unique per worker even when executors share a host.
        workers = [
            f"{info.address.split(':')[0]}:{base_port + i}"
            for i, info in enumerate(infos)
        ]
        me = ctx.partitionId()
        spec = {
            "cluster": {"chief": workers[:1], "worker": workers[1:]},
            "task": {
                "type": "chief" if me == 0 else "worker",
                "index": me if me == 0 else me - 1,
            },
        }
        yield json.dumps(spec, sort_keys=True)

    rdd = sc.parallelize(range(n_workers), n_workers).barrier().mapPartitions(assemble)
    return [json.loads(s) for s in rdd.collect()]


def train_text_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    num_features: int = 1 << 14,
    seed: int = 42,
):
    """E4: the MLlib training analogue — TF-IDF + logistic regression.

    Returns (fitted PipelineModel, training accuracy). Deterministic
    (fixed seed, fixed feature hashing). Every stage is distributed:
    feature hashing is map-side, IDF and LR are Spark aggregations /
    barrier-free iterative jobs — the engine-native replacement for
    launching an external framework per worker.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, IDF, StringIndexer, Tokenizer

    pipeline = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="__tokens"),
            HashingTF(inputCol="__tokens", outputCol="__tf", numFeatures=num_features),
            IDF(inputCol="__tf", outputCol="__features"),
            StringIndexer(inputCol=label_col, outputCol="__label"),
            LogisticRegression(
                featuresCol="__features", labelCol="__label", maxIter=20, regParam=0.01
            ),
        ]
    )
    model = pipeline.fit(df)
    pred = model.transform(df)
    from pyspark.sql import functions as F

    acc = pred.agg(
        (F.sum((F.col("__label") == F.col("prediction")).cast("int")) / F.count("*"))
    ).collect()[0][0]
    return model, float(acc)


#: Frameworks whose child-process env contract the reference wires up
#: (HboxContainer.java:944-1050); "generic" is the plain INDEX/ROLE
#: contract every non-special framework gets.
FRAMEWORKS = ("tensorflow", "mxnet", "xgboost", "generic")


def framework_env(
    framework: str,
    role: str,
    index: int,
    cluster: dict[str, list[str]] | None = None,
) -> dict[str, str]:
    """E4 launch-contract twin: the environment the reference exports
    to a framework's child process, derived from a Spark-side cluster
    spec instead of YARN container state (HboxContainer.java:944-1050;
    env names in common/HboxConstants).

    ``cluster`` maps role -> ["host:port", ...] (the output shape of
    :func:`build_cluster_specs`, or any explicit allocation). Feed the
    result to ``operators.pipe.pipe_lines(env=...)`` or
    ``job.JobSpec(env=...)`` — the pipe operator is the engine's
    process launcher, so together they reproduce the reference's
    launcher surface for commands that read these variables.

    Contracts reproduced:
      - tensorflow: TF_ROLE / TF_INDEX + TF_CONFIG (cluster + task
        json, what tf.distribute reads) and TF_CLUSTER_DEF
        (HboxContainer.java:946-953)
      - mxnet (parameter-server mode): DMLC_PS_ROOT_URI/PORT from the
        first ps entry, DMLC_NUM_WORKER / DMLC_NUM_SERVER, DMLC_ROLE,
        and DMLC_WORKER_ID or DMLC_SERVER_ID per role
        (HboxContainer.java:957-969)
      - xgboost (rabit tracker): DMLC_TRACKER_URI/PORT from the
        tracker entry, DMLC_NUM_WORKER, DMLC_TASK_ID, DMLC_ROLE
        (HboxContainer.java:971-976)
      - generic: INDEX + ROLE (the default contract every worker gets)
    """
    if framework not in FRAMEWORKS:
        raise ValueError(f"framework must be one of {FRAMEWORKS}")
    cluster = cluster or {}
    env = {"INDEX": str(index), "ROLE": role}
    if framework == "tensorflow":
        workers = cluster.get("worker", [])
        ps = cluster.get("ps", [])
        spec = {k: v for k, v in (("worker", workers), ("ps", ps)) if v}
        env.update(
            TF_ROLE=role,
            TF_INDEX=str(index),
            TF_CLUSTER_DEF=json.dumps(spec, sort_keys=True),
            TF_CONFIG=json.dumps(
                {"cluster": spec, "task": {"type": role, "index": index}},
                sort_keys=True,
            ),
        )
    elif framework == "mxnet":
        ps = cluster.get("ps", [])
        if not ps:
            raise ValueError("mxnet PS mode needs cluster['ps']")
        host, port = ps[0].rsplit(":", 1)
        env.update(
            DMLC_PS_ROOT_URI=host,
            DMLC_PS_ROOT_PORT=port,
            DMLC_NUM_WORKER=str(len(cluster.get("worker", []))),
            DMLC_NUM_SERVER=str(len(ps)),
            DMLC_ROLE=role,
        )
        env["DMLC_SERVER_ID" if role == "ps" else "DMLC_WORKER_ID"] = str(index)
    elif framework == "xgboost":
        tracker = cluster.get("tracker", cluster.get("ps", []))
        if not tracker:
            raise ValueError("xgboost needs cluster['tracker'] (rabit tracker)")
        host, port = tracker[0].rsplit(":", 1)
        env.update(
            DMLC_TRACKER_URI=host,
            DMLC_TRACKER_PORT=port,
            DMLC_NUM_WORKER=str(len(cluster.get("worker", []))),
            DMLC_TASK_ID=str(index),
            DMLC_ROLE=role,
        )
    return env
