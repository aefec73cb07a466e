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
#: contract every non-special framework gets. "horovod"/"tensornet"
#: share the MPI contract (the reference branches them together).
FRAMEWORKS = (
    "tensorflow",
    "mxnet",
    "xgboost",
    "lightgbm",
    "lightlda",
    "torch",
    "xdl",
    "xflow",
    "mpi",
    "horovod",
    "tensornet",
    "generic",
)


def framework_env(
    framework: str,
    role: str,
    index: int,
    cluster: dict[str, list[str]] | None = None,
    resources: dict[str, str] | None = None,
    mpi_install_dir: str = "/usr/local/openmpi",
    mpi_app_dir: str = ".",
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
      - lightgbm: LIGHTGBM_NUM_MACHINE (worker count) +
        LIGHTGBM_LOCAL_LISTEN_PORT (this worker's own reserved port,
        i.e. the port of cluster['worker'][index]); the machine list
        itself travels as a file — see :func:`rendezvous_files`
        (HboxContainer.java:976-978, 804-839)
      - lightlda: LIGHTLDA_WORKER_NUM / LIGHTLDA_SERVER_NUM /
        LIGHTLDA_RANK / LIGHTLDA_ROLE, plus LIGHTLDA_SERVER_ENDPOINT
        (own endpoint) on ps-role containers only — workers instead
        read the endpoint file from :func:`rendezvous_files`
        (HboxContainer.java:979-984, 841-880)
      - torch (DISTTORCH): INIT_METHOD=tcp://<rank0 host:port>, RANK,
        WORLD_SIZE, master_addr / master_port (lowercase, as the
        reference exports them) — rank 0 is cluster['worker'][0]
        (HboxContainer.java:1035-1041, 882-910)
      - xdl: TASK_NAME / TASK_INDEX / ZK_ADDR (cluster['zk'][0]);
        scheduler role additionally gets PS_NUM + PS_CPU_CORES /
        PS_MEMORY_M (from ``resources``), worker role gets TASK_NUM
        (HboxContainer.java:1042-1055)
      - xflow: the mxnet DMLC contract plus HEAPPROFILE=./W<i> or
        ./S<i> per role (HboxContainer.java:1020-1034)
      - mpi / horovod / tensornet: OPAL_PREFIX (the MPI install dir),
        HOME and PWD (the per-app exec dir — the rsh agent uses $HOME
        as working dir), HBOX_TF_INDEX (the reference reuses the TF
        index slot as MPI rank marker); the mpiexec launch itself is
        :func:`mpi_command` (HboxContainer.java:990-1010)
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
    elif framework in ("mxnet", "xflow"):
        ps = cluster.get("ps", [])
        if not ps:
            raise ValueError(f"{framework} PS mode needs cluster['ps']")
        host, port = ps[0].rsplit(":", 1)
        env.update(
            DMLC_PS_ROOT_URI=host,
            DMLC_PS_ROOT_PORT=port,
            DMLC_NUM_WORKER=str(len(cluster.get("worker", []))),
            DMLC_NUM_SERVER=str(len(ps)),
            DMLC_ROLE=role,
        )
        # Reference contract (HboxContainer.java:957-963): WORKER_ID
        # for role 'worker', SERVER_ID for EVERY other role — not just
        # 'ps' (r4 advice fix).
        env["DMLC_WORKER_ID" if role == "worker" else "DMLC_SERVER_ID"] = str(index)
        if framework == "xflow":
            env["HEAPPROFILE"] = ("./W" if role == "worker" else "./S") + str(index)
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
    elif framework == "lightgbm":
        workers = cluster.get("worker", [])
        if not workers:
            raise ValueError("lightgbm needs cluster['worker']")
        env.update(
            LIGHTGBM_NUM_MACHINE=str(len(workers)),
            LIGHTGBM_LOCAL_LISTEN_PORT=workers[index].rsplit(":", 1)[1],
        )
    elif framework == "lightlda":
        workers = cluster.get("worker", [])
        ps = cluster.get("ps", [])
        if not ps:
            raise ValueError("lightlda needs cluster['ps']")
        env.update(
            LIGHTLDA_WORKER_NUM=str(len(workers)),
            LIGHTLDA_SERVER_NUM=str(len(ps)),
            LIGHTLDA_RANK=str(index),
            LIGHTLDA_ROLE=role,
        )
        if role == "ps":
            # Only ps containers export their own endpoint (the
            # reference leaves it unset on workers, which read the
            # endpoint FILE instead — rendezvous_files).
            env["LIGHTLDA_SERVER_ENDPOINT"] = ps[index]
    elif framework == "torch":
        workers = cluster.get("worker", [])
        if not workers:
            raise ValueError("torch needs cluster['worker'] (rank 0 first)")
        rank0_host, rank0_port = workers[0].rsplit(":", 1)
        env.update(
            INIT_METHOD=f"tcp://{workers[0]}",
            RANK=str(index),
            WORLD_SIZE=str(len(workers)),
            master_addr=rank0_host,
            master_port=rank0_port,
        )
    elif framework == "xdl":
        zk = cluster.get("zk", [])
        if not zk:
            raise ValueError("xdl needs cluster['zk'] (zookeeper address)")
        env.update(TASK_NAME=role, TASK_INDEX=str(index), ZK_ADDR=zk[0])
        resources = resources or {}
        if role == "scheduler":
            env["PS_NUM"] = str(len(cluster.get("ps", [])))
            for k in ("PS_CPU_CORES", "PS_MEMORY_M"):
                if k in resources:
                    env[k] = str(resources[k])
        elif role == "worker":
            env["TASK_NUM"] = str(len(cluster.get("worker", [])))
    elif framework in ("mpi", "horovod", "tensornet"):
        lib = f"{mpi_install_dir}/lib"
        env.update(
            OPAL_PREFIX=mpi_install_dir,
            HOME=mpi_app_dir,
            PWD=mpi_app_dir,
            HBOX_TF_INDEX=str(index),
            LD_LIBRARY_PATH=f"{lib}:{lib}/openmpi:{lib}/pmix",
        )
    return env


def rendezvous_files(
    framework: str, cluster: dict[str, list[str]]
) -> dict[str, str]:
    """E4 rendezvous-FILE twin: the machine-list files the reference's
    containers assemble from AM-polled peer reports before launch.

    - lightgbm: every worker writes ``lightGBMlist.txt`` — one
      ``"ip port"`` line per worker (HboxContainer.java:830-838; the
      reported string is ``host + " " + port``, :814).
    - lightlda: workers write ``lightLdaEndPoints.txt`` — one
      ``"rank host:port"`` line per ps (HboxContainer.java:853, 871-879).

    Feed the result to ``pipe_lines(input_files=...)``-style staging or
    just write the files into the child's working dir before launch.
    Spark-side the peer list comes from :func:`build_cluster_specs`
    (barrier ``getTaskInfos()``) instead of AM polling, so the files
    can be produced deterministically with no side-channel at all.
    """
    if framework == "lightgbm":
        workers = cluster.get("worker", [])
        return {
            "lightGBMlist.txt": "".join(
                f"{w.rsplit(':', 1)[0]} {w.rsplit(':', 1)[1]}\n" for w in workers
            )
        }
    if framework == "lightlda":
        ps = cluster.get("ps", [])
        return {
            "lightLdaEndPoints.txt": "".join(
                f"{i} {ep}\n" for i, ep in enumerate(ps)
            )
        }
    return {}


#: The MCA options the reference AM exports around its mpiexec child
#: (ApplicationMaster.java:1670-1680): bind-to none, no rsh agent
#: (containers are already placed), verbose plm, oversubscribe, one
#: proc per node.
MPI_EXEC_ENV = {
    "OMPI_MCA_hwloc_base_binding_policy": "none",
    "OMPI_MCA_plm_rsh_agent": "/bin/true",
    "OMPI_MCA_plm_base_verbose": "1",
    "OMPI_MCA_rmaps_base_oversubscribe": "1",
    "OMPI_MCA_rmaps_ppr_pernode": "1",
}


def mpi_command(
    hosts: list[str],
    command: list[str],
    mpi_install_dir: str = "/usr/local/openmpi",
    log_dir: str = ".",
) -> tuple[list[str], dict[str, str]]:
    """E4 MPI-rendezvous twin: the exact ``mpiexec`` argv + env the
    reference AM assembles and execs (ApplicationMaster.java:1618-1697).

    ``hosts`` is the worker host list (the reference iterates its
    acquired containers, :1639-1643; Spark-side use
    :func:`build_mpi_hosts`). The ``/bin/sh -c`` shim between mpiexec
    and the user command reproduces the reference's per-rank log
    redirect (:1655): every rank appends to stdout/stderr files under
    the log dir; rank HBOX_TF_INDEX==1 additionally tees to the
    console. Returns ``(argv, env)`` — run with ``subprocess`` from
    the driver, the analogue of the AM-local mpiexec process.
    """
    if not hosts:
        raise ValueError("mpi needs at least one host")
    shim = (
        '[ "$HBOX_TF_INDEX" != 1 ] && exec "$@" 1>> "{d}"/stdout 2>> "{d}"/stderr; '
        '"$@" 2>&1 | tee -a "{d}"/stdout'
    ).format(d=log_dir)
    argv = [
        f"{mpi_install_dir}/bin/mpiexec",
        "--host",
        ",".join(hosts),
        "/bin/sh",
        "-c",
        shim,
        "--",
        *command,
    ]
    env = dict(MPI_EXEC_ENV)
    env["OPAL_PREFIX"] = mpi_install_dir
    env["LD_LIBRARY_PATH"] = f"{mpi_install_dir}/lib"
    return argv, env


def horovod_flags(
    mpi_threads_disable: bool = False,
    timeline: str | None = None,
    fusion_threshold: int | None = None,
    cycle_time: int | None = None,
    stall_check_disable: bool = False,
    hierarchical_allreduce: bool = False,
) -> list[str]:
    """E4 Horovod-tuning twin of the reference AM's ``readHorovodConfig``
    (ApplicationMaster.java:1767-1791): each enabled knob becomes an
    ``-x HOROVOD_*=value`` pair forwarded through mpirun to every rank.
    Returns a flat argv fragment (``["-x", "HOROVOD_...=...", ...]``).
    """
    flags: list[str] = []
    if mpi_threads_disable:
        flags += ["-x", "HOROVOD_MPI_THREADS_DISABLE=1"]
    if timeline is not None:
        flags += ["-x", f"HOROVOD_TIMELINE={timeline}"]
    if fusion_threshold is not None:
        flags += ["-x", f"HOROVOD_FUSION_THRESHOLD={fusion_threshold}"]
    if cycle_time is not None:
        flags += ["-x", f"HOROVOD_CYCLE_TIME={cycle_time}"]
    if stall_check_disable:
        flags += ["-x", "HOROVOD_STALL_CHECK_DISABLE=1"]
    if hierarchical_allreduce:
        flags += ["-x", "HOROVOD_HIERARCHICAL_ALLREDUCE=1"]
    return flags


def horovod_command(
    hosts: list[str],
    command: list[str],
    process_per_worker: int = 1,
    mpi_install_dir: str = "/usr/local/openmpi",
    extra_ld_library_path: str | None = None,
    btl_tcp_if_include: str = "10.0.0.0/8",
    **flag_kwargs,
) -> tuple[list[str], dict[str, str]]:
    """E4 Horovod-launch twin: the ``mpirun`` argv + env the reference
    AM assembles for Horovod jobs (``launchHorovodExec``,
    ApplicationMaster.java:1794-1857).

    Reproduced contract, in the reference's argument order:
    ``mpirun -np <workers*ppw> -H h1[:ppw],h2[:ppw],...`` (host gets a
    ``:slots`` suffix only when ``process_per_worker > 1``, :1811-1818),
    then the :func:`horovod_flags` ``-x`` pairs (:1820-1825), then the
    fixed tail ``-bind-to none -map-by slot -x NCCL_DEBUG=INFO
    -x LD_LIBRARY_PATH -x PATH -mca pml ob1 -mca btl ^openib
    -mca btl_tcp_if_include <cidr>`` (:1826), then the user command.
    Env: LD_LIBRARY_PATH = extra : <install>/lib : inherited
    (:1799-1808), PATH inherited — the reference prepends any user env;
    callers merge their own on top.

    ``flag_kwargs`` are forwarded to :func:`horovod_flags`.
    """
    if not hosts:
        raise ValueError("horovod needs at least one host")
    if process_per_worker < 1:
        raise ValueError("process_per_worker must be >= 1")
    if process_per_worker == 1:
        host_list = ",".join(hosts)
    else:
        host_list = ",".join(f"{h}:{process_per_worker}" for h in hosts)
    argv = [
        f"{mpi_install_dir}/bin/mpirun",
        "-np",
        str(len(hosts) * process_per_worker),
        "-H",
        host_list,
        *horovod_flags(**flag_kwargs),
        "-bind-to",
        "none",
        "-map-by",
        "slot",
        "-x",
        "NCCL_DEBUG=INFO",
        "-x",
        "LD_LIBRARY_PATH",
        "-x",
        "PATH",
        "-mca",
        "pml",
        "ob1",
        "-mca",
        "btl",
        "^openib",
        "-mca",
        "btl_tcp_if_include",
        btl_tcp_if_include,
        *command,
    ]
    ld_parts = []
    if extra_ld_library_path:
        ld_parts.append(extra_ld_library_path)
    ld_parts.append(f"{mpi_install_dir}/lib")
    env = {
        "OPAL_PREFIX": mpi_install_dir,
        "LD_LIBRARY_PATH": ":".join(ld_parts),
    }
    return argv, env


def build_mpi_hosts(spark, n_workers: int) -> list[str]:
    """Assemble the MPI host list from a barrier stage — the Spark
    analogue of the reference AM's acquired-container walk
    (ApplicationMaster.java:1639-1643), using the same rendezvous
    mechanism as :func:`build_cluster_specs`: every task enters
    ``barrier()``, reads ``getTaskInfos()``, and the deterministic
    per-partition host order IS the rank order.
    """
    sc = spark.sparkContext

    def assemble(index_iter):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        ctx.barrier()
        if ctx.partitionId() == 0:
            yield json.dumps(
                [info.address.split(":")[0] for info in ctx.getTaskInfos()]
            )

    rdd = sc.parallelize(range(n_workers), n_workers).barrier().mapPartitions(assemble)
    return json.loads(rdd.collect()[0])
