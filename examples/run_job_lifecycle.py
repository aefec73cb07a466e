"""Job-lifecycle demo: submit-style batch job with a per-worker
PLACEHOLDER split, shuffled epoch replay, a signal-driven mid-job
save, and a post-hoc history query over the Spark event log.

Reference analogue: the full hbox-submit round trip — client validates
and submits (Client.java:298-374), the AM assigns each container a
private file split (ApplicationMaster.java:971-1041), the user signals
/ws/app/savemodel for a mid-job checkpoint (AMWebServices.java:96-106),
and the JobHistoryServer answers post-hoc questions
(history-server/.../JobHistoryServer.java).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.001"


def main(spark, sf_dir: str = DEFAULT_SF) -> None:
    from pyspark.sql import functions as F

    from xlearning_spark import status, streaming as st
    from xlearning_spark.job import JobSpec, submit

    work = tempfile.mkdtemp(prefix="xls_job_demo_")

    # 1. Batch job: PLACEHOLDER delivery — each child sees ONLY its
    #    private INPUT_FILE_LIST slice (the per-container assignment).
    src = os.path.join(work, "input")
    os.makedirs(src)
    for i in range(4):
        with open(os.path.join(src, f"part{i}.txt"), "w") as fh:
            fh.write(f"payload {i}\n")
    child = [
        sys.executable,
        "-c",
        "import os, sys, json\n"
        "sys.stdin.read()\n"
        "files = json.loads(os.environ['INPUT_FILE_LIST']).get('t', [])\n"
        "print(os.environ['INDEX'] + '\\t' + str(len(files)))",
    ]
    res = submit(
        spark,
        JobSpec(
            inputs={"t": src + "/*.txt"},
            input_strategy="PLACEHOLDER",
            command=child,
            output=os.path.join(work, "out"),
            output_format="parquet",
            workers=2,
        ),
    )
    print("committed:", res.committed, "| per-worker file counts:")
    spark.read.parquet(res.output_path).orderBy("line").show()

    # 1b. Attempt retry with memory autoscale (VERDICT r11 item 5 —
    #     job.RetryPolicy end-to-end, the AM:289-318 app-retry
    #     analogue): the child simulates an OOM kill (exit 137)
    #     whenever its WORKER_MEMORY_MB env is below what the workload
    #     "needs"; attempt 1 runs at the 1024 MB base and dies,
    #     attempt 2 runs at base + ceil(base * 0.5) = 1536 MB and
    #     succeeds — the scaled value visible IN THE CHILD'S ENV, the
    #     same place the reference's container launch context carries
    #     worker memory.
    from xlearning_spark.job import RetryPolicy

    oom_child = [
        sys.executable,
        "-c",
        "import os, sys\n"
        "sys.stdin.read()\n"
        "mem = int(os.environ['WORKER_MEMORY_MB'])\n"
        "if mem < 1536:\n"
        "    sys.exit(137)\n"  # the classic OOM-kill exit code
        "print(os.environ['APP_ATTEMPT_ID'] + '\\t' + str(mem))",
    ]
    res2 = submit(
        spark,
        JobSpec(
            inputs={"t": src + "/*.txt"},
            command=oom_child,
            output=os.path.join(work, "out_retry"),
            output_format="parquet",
            retry=RetryPolicy(max_attempts=2),
        ),
    )
    assert res2.attempts == 2, res2
    assert res2.worker_memory_mb == 1536, res2
    child_lines = {
        r.line for r in spark.read.parquet(res2.output_path).collect()
    }
    assert child_lines == {"2\t1536"}, child_lines
    print(
        "retry recovered: attempts=2 worker_memory_mb=1536 "
        "child_saw=2\\t1536 committed:", res2.committed,
    )

    # 2. Streaming save signal: each request_save drains exactly what
    #    arrived since the previous one into a fresh save_NNNN dir.
    stream_src = os.path.join(work, "stream")
    os.makedirs(stream_src)
    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "start", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    events.write.mode("append").parquet(stream_src)
    ctrl = st.SaveModelController(
        st.read_events_stream(spark, stream_src),
        os.path.join(work, "saves"),
        os.path.join(work, "ckpt"),
    )
    d1, batches = ctrl.request_save()
    print("save signal ->", os.path.basename(d1), "batches:", batches)

    # 3. History surface: the demo session itself may not be event-
    #    logged; point history_table at any log dir produced by
    #    build_session(event_log_dir=...) for stage-level post-mortems.
    log_dir = spark.conf.get("spark.eventLog.dir", None)
    if log_dir and spark.conf.get("spark.eventLog.enabled", "false") == "true":
        status.history_table(spark, log_dir.removeprefix("file:")).select(
            "stage_id", "num_tasks", "duration_ms"
        ).show(5)
    else:
        print("(event log disabled in this session — pass event_log_dir"
              " to build_session to enable the history surface)")


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    main(build_session(app_name="example-job-lifecycle"))
