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


def test_framework_env_lightgbm_lightlda():
    # DISTLIGHTGBM / DISTLIGHTLDA contracts (HboxContainer.java:976-984)
    # + the machine-list files their containers assemble (:804-880).
    from xlearning_spark.ml import framework_env, rendezvous_files

    cluster = {"worker": ["h1:12400", "h2:12401"], "ps": ["h0:2000", "h3:2001"]}

    gbm = framework_env("lightgbm", "worker", 1, cluster)
    assert gbm["LIGHTGBM_NUM_MACHINE"] == "2"
    assert gbm["LIGHTGBM_LOCAL_LISTEN_PORT"] == "12401"  # own port
    files = rendezvous_files("lightgbm", cluster)
    assert files["lightGBMlist.txt"] == "h1 12400\nh2 12401\n"

    lda_w = framework_env("lightlda", "worker", 0, cluster)
    assert lda_w["LIGHTLDA_WORKER_NUM"] == "2"
    assert lda_w["LIGHTLDA_SERVER_NUM"] == "2"
    assert lda_w["LIGHTLDA_RANK"] == "0" and lda_w["LIGHTLDA_ROLE"] == "worker"
    # workers read the endpoint FILE, they don't export an endpoint
    assert "LIGHTLDA_SERVER_ENDPOINT" not in lda_w
    lda_s = framework_env("lightlda", "ps", 1, cluster)
    assert lda_s["LIGHTLDA_SERVER_ENDPOINT"] == "h3:2001"
    files = rendezvous_files("lightlda", cluster)
    assert files["lightLdaEndPoints.txt"] == "0 h0:2000\n1 h3:2001\n"


def test_framework_env_torch_xdl_xflow():
    from xlearning_spark.ml import framework_env

    cluster = {
        "worker": ["h1:29500", "h2:29501"],
        "ps": ["h0:2000"],
        "zk": ["zk1:2181"],
    }

    # DISTTORCH (HboxContainer.java:1035-1041): rank0 = first worker.
    t = framework_env("torch", "worker", 1, cluster)
    assert t["INIT_METHOD"] == "tcp://h1:29500"
    assert t["RANK"] == "1" and t["WORLD_SIZE"] == "2"
    assert t["master_addr"] == "h1" and t["master_port"] == "29500"

    # XDL (HboxContainer.java:1042-1055): scheduler gets PS_* extras,
    # worker gets TASK_NUM, everyone gets TASK_NAME/TASK_INDEX/ZK_ADDR.
    sch = framework_env(
        "xdl", "scheduler", 0, cluster,
        resources={"PS_CPU_CORES": "4", "PS_MEMORY_M": "8192"},
    )
    assert sch["TASK_NAME"] == "scheduler" and sch["ZK_ADDR"] == "zk1:2181"
    assert sch["PS_NUM"] == "1"
    assert sch["PS_CPU_CORES"] == "4" and sch["PS_MEMORY_M"] == "8192"
    w = framework_env("xdl", "worker", 1, cluster)
    assert w["TASK_NUM"] == "2" and "PS_NUM" not in w

    # XFLOW (HboxContainer.java:1020-1034): DMLC contract + HEAPPROFILE;
    # every non-worker role is a SERVER (r4 advice: mxnet/xflow parity).
    xf_w = framework_env("xflow", "worker", 2, cluster)
    assert xf_w["DMLC_WORKER_ID"] == "2" and xf_w["HEAPPROFILE"] == "./W2"
    xf_s = framework_env("xflow", "ps", 0, cluster)
    assert xf_s["DMLC_SERVER_ID"] == "0" and xf_s["HEAPPROFILE"] == "./S0"
    # any non-'worker' role maps to SERVER_ID, matching the reference's
    # else-branch (not an allowlist of 'ps')
    mx_e = framework_env("mxnet", "evaluator", 3, cluster)
    assert mx_e["DMLC_SERVER_ID"] == "3" and "DMLC_WORKER_ID" not in mx_e


def test_mpi_command_and_env(tmp_path):
    # The AM-local mpiexec assembly (ApplicationMaster.java:1618-1697):
    # exact argv shape + MCA env, exercised end-to-end through a stub
    # mpiexec binary so the argv actually execs.
    import subprocess

    from xlearning_spark.ml import MPI_EXEC_ENV, framework_env, mpi_command

    install = tmp_path / "openmpi"
    (install / "bin").mkdir(parents=True)
    stub = install / "bin" / "mpiexec"
    stub.write_text('#!/bin/sh\nprintf \'%s\\n\' "$@"\n')
    stub.chmod(0o755)

    argv, env = mpi_command(
        ["h1", "h2", "h3"], ["python", "train.py"], str(install), str(tmp_path)
    )
    assert argv[0] == str(install / "bin" / "mpiexec")
    assert argv[1:3] == ["--host", "h1,h2,h3"]
    assert argv[-3:] == ["--", "python", "train.py"]
    assert env["OMPI_MCA_plm_rsh_agent"] == "/bin/true"
    assert env["OMPI_MCA_rmaps_ppr_pernode"] == "1"
    assert set(MPI_EXEC_ENV) <= set(env)

    out = subprocess.run(
        argv, env={**env, "PATH": "/usr/bin:/bin"}, capture_output=True, text=True
    )
    lines = out.stdout.splitlines()
    assert lines[0] == "--host" and lines[1] == "h1,h2,h3"
    assert lines[-2:] == ["python", "train.py"]

    # container-side env for the launched ranks
    cenv = framework_env("horovod", "worker", 1, mpi_install_dir=str(install))
    assert cenv["OPAL_PREFIX"] == str(install)
    assert cenv["HBOX_TF_INDEX"] == "1"
    assert f"{install}/lib/openmpi" in cenv["LD_LIBRARY_PATH"]


def test_horovod_command_and_flags(tmp_path):
    # launchHorovodExec twin (ApplicationMaster.java:1794-1857): argv
    # ordering, :slots host suffixes, -x flag forwarding, env assembly —
    # execed end-to-end through a stub mpirun.
    import subprocess

    from xlearning_spark.ml import horovod_command, horovod_flags

    install = tmp_path / "openmpi"
    (install / "bin").mkdir(parents=True)
    stub = install / "bin" / "mpirun"
    stub.write_text('#!/bin/sh\nprintf \'%s\\n\' "$@"\n')
    stub.chmod(0o755)

    # readHorovodConfig twin: every knob becomes its -x pair, defaults off.
    assert horovod_flags() == []
    assert horovod_flags(mpi_threads_disable=True) == [
        "-x",
        "HOROVOD_MPI_THREADS_DISABLE=1",
    ]
    flags = horovod_flags(
        timeline="/tmp/tl.json",
        fusion_threshold=67108864,
        cycle_time=5,
        stall_check_disable=True,
        hierarchical_allreduce=True,
    )
    assert flags[flags.index("-x", 0) + 1] == "HOROVOD_TIMELINE=/tmp/tl.json"
    assert "HOROVOD_FUSION_THRESHOLD=67108864" in flags
    assert "HOROVOD_CYCLE_TIME=5" in flags
    assert "HOROVOD_STALL_CHECK_DISABLE=1" in flags
    assert "HOROVOD_HIERARCHICAL_ALLREDUCE=1" in flags

    # ppw=1: bare hosts, -np = worker count (AM:1811-1818).
    argv, env = horovod_command(
        ["h1", "h2"], ["python", "train.py"], mpi_install_dir=str(install)
    )
    assert argv[0] == str(install / "bin" / "mpirun")
    assert argv[1:5] == ["-np", "2", "-H", "h1,h2"]
    assert argv[-2:] == ["python", "train.py"]
    # fixed reference tail, in order (AM:1826)
    tail = " ".join(argv[5:-2])
    assert tail == (
        "-bind-to none -map-by slot -x NCCL_DEBUG=INFO -x LD_LIBRARY_PATH "
        "-x PATH -mca pml ob1 -mca btl ^openib -mca btl_tcp_if_include "
        "10.0.0.0/8"
    )
    assert env["OPAL_PREFIX"] == str(install)
    assert env["LD_LIBRARY_PATH"] == f"{install}/lib"

    # ppw=4: host:slots suffix, -np = workers*ppw; flags precede tail;
    # extra LD path is prepended (AM:1799-1808).
    argv4, env4 = horovod_command(
        ["h1", "h2"],
        ["python", "train.py"],
        process_per_worker=4,
        mpi_install_dir=str(install),
        extra_ld_library_path="/opt/nccl/lib",
        mpi_threads_disable=True,
    )
    assert argv4[1:5] == ["-np", "8", "-H", "h1:4,h2:4"]
    assert argv4[5:7] == ["-x", "HOROVOD_MPI_THREADS_DISABLE=1"]
    assert argv4[7:9] == ["-bind-to", "none"]
    assert env4["LD_LIBRARY_PATH"] == f"/opt/nccl/lib:{install}/lib"

    out = subprocess.run(
        argv, env={**env, "PATH": "/usr/bin:/bin"}, capture_output=True, text=True
    )
    lines = out.stdout.splitlines()
    assert lines[:4] == ["-np", "2", "-H", "h1,h2"]
    assert lines[-2:] == ["python", "train.py"]


def test_build_mpi_hosts(spark):
    from xlearning_spark.ml import build_mpi_hosts

    hosts = build_mpi_hosts(spark, 4)
    assert len(hosts) == 4
    assert all(h and ":" not in h for h in hosts)


def test_lightlda_env_through_pipe(spark):
    # e2e: the per-framework contract reaches a pipe-launched child.
    from xlearning_spark.ml import framework_env
    from xlearning_spark.operators.pipe import pipe_lines

    env = framework_env(
        "lightlda", "ps", 0, {"worker": ["h1:1"], "ps": ["h0:9876"]}
    )
    df = spark.createDataFrame([("x",)], "line string").coalesce(1)
    out = pipe_lines(
        df,
        ["sh", "-c", 'echo "$LIGHTLDA_RANK $LIGHTLDA_SERVER_ENDPOINT"'],
        env=env,
    ).collect()
    assert out[0]["line"] == "0 h0:9876"
