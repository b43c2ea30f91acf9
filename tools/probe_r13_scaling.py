"""VERDICT r12 #5: attribute the ~1.0 8-vs-32-core scaling ratios of
curate_gated / semdedup / simhash_pairs — is the floor fixed per-query
overhead (fit jobs, plan analysis, stage scheduling) or executor
compute that fails to parallelize (partition geometry)?

Method: per entry and core count, a fresh session with event logging;
run the entry twice (first run warms code paths, second is measured),
then parse the event log: wall, number of jobs, sum of stage walls
(submission->completion), and total executor task run time. The
executor-bound share is task_time / (cores * wall); the scheduling /
driver share is wall - sum(stage walls) plus intra-stage idleness.

Usage: python tools/probe_r13_scaling.py [entry,entry] [cpus,cpus]
"""
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entries_arg = sys.argv[1] if len(sys.argv) > 1 else "curate_gated,semdedup,simhash_pairs"
cpus_arg = sys.argv[2] if len(sys.argv) > 2 else "32,8"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_entry(spark, name):
    from pyspark.sql import functions as F

    from storage_spark.tables import load_all

    t = load_all(spark, sf_dir)
    if name == "curate_gated":
        from storage_spark.operators.pipeline import (
            curate_corpus,
            nb_quality_model,
        )

        docs = t["documents"]

        def fn():
            model = nb_quality_model(
                docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1),
            )
            return curate_corpus(
                docs, min_quality=0.5, min_jaccard=0.01,
                classifier=model, min_logit_1e4=0, materialize="disk",
            ).count()

        return fn
    if name == "semdedup":
        from storage_spark.operators.dedup import semantic_dedup

        vectors = t["embeddings"].select(
            F.col("vec_id").cast("string").alias("key"), "embedding"
        )
        n_vectors = vectors.count()

        def fn():
            return (
                semantic_dedup(vectors, eps=0.65, n_docs=n_vectors)
                .filter(~F.col("kept"))
                .count()
            )

        return fn
    if name == "simhash_pairs":
        from storage_spark.operators.dedup import simhash16, simhash_near_pairs

        def fn():
            sim = simhash16(t["documents"])
            return simhash_near_pairs(sim, max_hamming=3, materialize=True).count()

        return fn
    if name == "fat_jl_index_query":
        from storage_spark.sources.annindex import ann_index_search, build_ann_index

        vecs = (
            spark.range(4096)
            .select(
                F.col("id").cast("string").alias("key"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(767)),
                    lambda i: (
                        F.pmod(
                            F.xxhash64(
                                F.concat_ws(
                                    ":", F.col("id").cast("string"), i.cast("string")
                                )
                            ),
                            F.lit(1000),
                        ).cast("double")
                        / 500.0
                        - 1.0
                    ),
                ).alias("embedding"),
            )
            .localCheckpoint(eager=True)
        )
        qs = vecs.filter(F.col("key").cast("bigint") < 50).select(
            F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
        )
        d = tempfile.mkdtemp(prefix="probe_jlidx_") + "/idx"
        build_ann_index(
            vecs, d, kind="jl_lsh", dim=768, out_dim=64, n_vectors=4096,
            encode_arrow=True,
        )

        def fn():
            return ann_index_search(spark, d, qs, k=10, probe_radius=1).count()

        return fn
    raise ValueError(name)


def parse_log(log_dir):
    jobs, stage_wall, task_time = 0, 0.0, 0.0
    spans = []
    paths = [
        p
        for p in glob.glob(f"{log_dir}/**", recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        with open(path, errors="ignore") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jobs += 1
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    s, c = si.get("Submission Time"), si.get("Completion Time")
                    if s and c:
                        stage_wall += (c - s) / 1000.0
                        spans.append((s, c))
                elif e == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    task_time += (m.get("Executor Run Time") or 0) / 1000.0
    # union of stage spans = time ANY stage was running; the rest of the
    # wall is pure driver/scheduling gap
    spans.sort()
    busy, cur_s, cur_e = 0.0, None, None
    for s, c in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, c
        else:
            cur_e = max(cur_e, c)
    if cur_e is not None:
        busy += cur_e - cur_s
    return jobs, stage_wall, busy / 1000.0, task_time


results = {}
for cpus in [int(c) for c in cpus_arg.split(",")]:
    for name in entries_arg.split(","):
        from pyspark.sql import SparkSession

        log_dir = tempfile.mkdtemp(prefix=f"evlog_{name}_{cpus}_")
        # mirror storage_spark.session.get_spark's confs + event logging
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName(f"scal_{name}_{cpus}")
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.driver.memory", "16g")
            .config(
                "spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g -XX:+UseG1GC",
            )
            .config("spark.ui.enabled", "false")
            .config(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
            .config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
            .config("spark.eventLog.dir", f"file://{log_dir}")
            .getOrCreate()
        )
        fn = build_entry(spark, name)
        fn()  # warm
        spark._jvm.System.gc()
        time.sleep(0.5)
        t0 = time.time()
        fn()
        wall = time.time() - t0
        spark.stop()
        time.sleep(0.5)
        jobs, stage_wall, stage_busy, task_time = parse_log(log_dir)
        shutil.rmtree(log_dir, ignore_errors=True)
        # the log covers warm+measured runs; halve counts for a per-run view
        r = {
            "wall_s": round(wall, 2),
            "jobs_total_2runs": jobs,
            "stage_wall_sum_2runs_s": round(stage_wall, 2),
            "stage_busy_union_2runs_s": round(stage_busy, 2),
            "executor_task_time_2runs_s": round(task_time, 2),
            "est_executor_bound_share": round(
                (task_time / 2) / (cpus * wall), 3
            ),
        }
        results[f"{name}@{cpus}"] = r
        print(name, cpus, json.dumps(r), flush=True)
print(json.dumps(results, indent=1))
