"""Job/cluster status surface (SURVEY.md §3.3): the engine's analogue
of the reference's REST endpoints (`/ws/app`, `/ws/containers`, ...)
— app and executor state exposed as DataFrames so the same questions
are answerable with SQL.

Reference mapping (web/.../AMWebServices.java:27-147):
  /ws/app             -> app_info
  /ws/containers      -> executor_table (containers = executors here)
  container metrics   -> the events pipeline (xlearning_spark.streaming)
  /ws/app/signal/{id} -> sources/delivery.cancel_job_group (E5)
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def app_info(spark: SparkSession) -> dict:
    """/ws/app analogue: application identity + uptime."""
    sc = spark.sparkContext
    return {
        "app_id": sc.applicationId,
        "app_name": sc.appName,
        "master": sc.master,
        "spark_version": sc.version,
        "start_time": _dt.datetime.fromtimestamp(sc.startTime / 1000.0).isoformat(),
        "ui_url": sc.uiWebUrl,
        "default_parallelism": sc.defaultParallelism,
    }


def executor_table(spark: SparkSession) -> DataFrame:
    """/ws/containers analogue: one row per executor with resource and
    task counters, from Spark's own REST status API (the same surface
    the reference exposes per container via AMWebServices;
    per-container status maps live at Listener:44-127)."""
    import json
    import urllib.request

    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        raise RuntimeError("Spark UI disabled: no REST status endpoint")
    url = f"{base}/api/v1/applications/{sc.applicationId}/executors"
    with urllib.request.urlopen(url, timeout=10) as r:
        execs = json.load(r)
    rows = [
        (
            e["id"],
            e["hostPort"],
            int(e["totalCores"]),
            int(e["activeTasks"]),
            int(e["completedTasks"]),
            int(e["failedTasks"]),
            int(e["maxMemory"]),
            bool(e["isActive"]),
        )
        for e in execs
    ]
    return spark.createDataFrame(
        rows,
        "executor_id string, host_port string, total_cores int, active_tasks int,"
        " completed_tasks int, failed_tasks int, max_memory long, is_active boolean",
    )


def job_table(spark: SparkSession, groups: list[str] | None = None) -> DataFrame:
    """Active/recent job state (ids + stage ids + status), queryable.

    ``getJobIdsForGroup(None)`` only lists jobs submitted *without* a
    job group, and the public StatusTracker has no all-groups listing —
    so active jobs are always merged in via ``getActiveJobsIds()``, and
    completed grouped jobs appear only when their group ids are passed
    in ``groups``.
    """
    status = spark.sparkContext.statusTracker()
    jids = set(status.getJobIdsForGroup(None)) | set(status.getActiveJobsIds())
    for g in groups or ():
        jids |= set(status.getJobIdsForGroup(g))
    rows = []
    for jid in sorted(jids):
        info = status.getJobInfo(jid)
        if info is None:
            continue
        rows.append((int(jid), str(info.status), list(map(int, info.stageIds))))
    return spark.createDataFrame(
        rows, "job_id int, status string, stage_ids array<int>"
    )


def history_table(spark: SparkSession, log_dir: str) -> DataFrame:
    """§3.3 history surface: completed stages of PAST applications,
    parsed from Spark's JSON event log (written when a session is built
    with ``engine.build_session(event_log_dir=...)``).

    The reference persists a per-app history JSON that its
    JobHistoryServer serves back (history-server/.../JobHistoryServer.java:
    1-262, JHSWebApp rendering the stored app state); Spark's event log
    is the same durable artifact, and this reader answers the post-hoc
    questions (which stages ran, how many tasks, how long) as a
    DataFrame — no server process needed.

    One row per completed stage attempt across every app in ``log_dir``
    (including ``.inprogress`` logs of live apps).
    """
    raw = spark.read.text(f"{log_dir}/*")
    j = F.col("value")
    si = "$['Stage Info']"
    return (
        raw.filter(F.get_json_object(j, "$.Event") == "SparkListenerStageCompleted")
        .select(
            F.input_file_name().alias("log_file"),
            F.get_json_object(j, f"{si}['Stage ID']").cast("int").alias("stage_id"),
            F.get_json_object(j, f"{si}['Stage Attempt ID']")
            .cast("int")
            .alias("attempt"),
            F.get_json_object(j, f"{si}['Stage Name']").alias("stage_name"),
            F.get_json_object(j, f"{si}['Number of Tasks']")
            .cast("int")
            .alias("num_tasks"),
            F.get_json_object(j, f"{si}['Submission Time']")
            .cast("long")
            .alias("submission_time_ms"),
            F.get_json_object(j, f"{si}['Completion Time']")
            .cast("long")
            .alias("completion_time_ms"),
        )
        .withColumn(
            "duration_ms",
            F.col("completion_time_ms") - F.col("submission_time_ms"),
        )
    )


def progress_summary(spark: SparkSession) -> dict:
    """Heartbeat-style progress roll-up: active jobs/stages counts —
    the scalar the reference surfaces per app (Client.java:1184-1236)."""
    status = spark.sparkContext.statusTracker()
    return {
        "active_jobs": len(status.getActiveJobsIds()),
        "active_stages": len(status.getActiveStageIds()),
    }
