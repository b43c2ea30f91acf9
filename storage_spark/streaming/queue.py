"""Queue/job semantics (T1/T2) in set-oriented form.

The reference runs pg-boss over Postgres: per-queue workers with
``retryLimit: 20`` exponential backoff and dead-letter handling
(src/internal/queue/queue.ts:74,264-352,425). The engine models a queue as
a jobs DataFrame with an ``attempts`` counter; one micro-batch tick is a
pure transform: completed jobs leave, failures re-enqueue with
``attempts + 1``, and jobs past the retry limit move to the dead-letter
set. The streaming layer runs this per trigger; batch tests drive it
synchronously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_RETRY_LIMIT = 20


def claim_batch(
    jobs: DataFrame, queue: str, batch_size: int, singleton_dedup: bool = True
) -> DataFrame:
    """One worker poll: oldest-first page of a queue, optionally keeping a
    single in-flight job per singleton_key (T2)."""
    df = jobs.filter(F.col("queue") == queue)
    if singleton_dedup and "singleton_key" in df.columns:
        from storage_spark.operators.scans import first_per_group

        # NULL singleton_key means "no dedup" (pg-boss semantics) — the
        # window would otherwise collapse ALL null-key jobs into one row
        # and starve the rest of the queue
        keyed = first_per_group(
            df.filter(F.col("singleton_key").isNotNull()),
            ["singleton_key"],
            [F.col("created_at_ms").asc(), F.col("job_id").asc()],
        )
        df = keyed.unionByName(df.filter(F.col("singleton_key").isNull()))
    return df.orderBy("created_at_ms", "job_id").limit(batch_size)


def apply_outcomes(
    jobs: DataFrame,
    outcomes: DataFrame,
    retry_limit: int = DEFAULT_RETRY_LIMIT,
    now_ms: int | None = None,
    retry_delay_ms: int = 1000,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Tick transition given ``outcomes(job_id, ok)``:
    returns (pending, completed, dead_letter).

    - ok=true        → completed
    - ok=false       → attempts+1; re-enqueued while attempts <= limit
    - past the limit → dead-letter (queue.ts dead-letter handling)
    - jobs without an outcome stay pending untouched

    With ``now_ms`` set, re-enqueued failures carry exponential backoff:
    ``next_attempt_at_ms = now + retry_delay * 2^(attempts-1)`` — pg-boss's
    ``retryBackoff: true`` schedule (queue.ts:73-75, :280) as a column, so
    ``due_jobs`` can gate the next claim without any per-job timer state.
    """
    joined = jobs.join(outcomes.select("job_id", "ok"), "job_id", "left")
    completed = joined.filter(F.col("ok") == True).drop("ok")  # noqa: E712
    failed = joined.filter(F.col("ok") == False).drop("ok")  # noqa: E712
    untouched = joined.filter(F.col("ok").isNull()).drop("ok")
    bumped = failed.withColumn("attempts", F.col("attempts") + 1)
    if now_ms is not None:
        bumped = bumped.withColumn(
            "next_attempt_at_ms",
            F.lit(now_ms)
            + F.lit(retry_delay_ms) * F.pow(F.lit(2.0), F.col("attempts") - 1).cast("bigint"),
        )
        if "next_attempt_at_ms" not in untouched.columns:
            untouched = untouched.withColumn(
                "next_attempt_at_ms", F.lit(None).cast("bigint")
            )
    dead = bumped.filter(F.col("attempts") > retry_limit)
    retry = bumped.filter(F.col("attempts") <= retry_limit)
    return untouched.unionByName(retry), completed, dead


def due_jobs(jobs: DataFrame, now_ms: int) -> DataFrame:
    """Jobs eligible to claim now: no backoff stamp, or stamp elapsed."""
    if "next_attempt_at_ms" not in jobs.columns:
        return jobs
    return jobs.filter(
        F.col("next_attempt_at_ms").isNull()
        | (F.col("next_attempt_at_ms") <= now_ms)
    )


def job_state_machine(
    outcomes: DataFrame, retry_limit: int = DEFAULT_RETRY_LIMIT
) -> DataFrame:
    """T1 retry/dead-letter tracking as a TRUE streaming state machine:
    per-job attempt counters live in Spark's state store ACROSS
    micro-batches via ``applyInPandasWithState`` — the
    arbitrary-stateful path (a counter that must survive batches and
    emit one row per transition) that windowed aggregation /
    dropDuplicates can't express. Batch-mode ``apply_outcomes`` above is
    the per-tick pure transform; this is its continuous form (pg-boss
    retryLimit/dead-letter, queue.ts:74,264-352).

    Input (streaming): ``(job_id string, ok boolean, ts long)`` outcome
    events. Output: one row per STATE TRANSITION —
    ``(job_id, attempts, status)``, status ∈ {completed, retrying,
    dead_letter}. Events for a job already terminal are ignored
    (at-least-once outcome delivery stays idempotent). State per key is
    two scalars, so a run's state-store footprint is O(live jobs), not
    O(events); Arrow moves each group's batch columnar.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("job_id", T.StringType()),
            T.StructField("attempts", T.IntegerType()),
            T.StructField("status", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("attempts", T.IntegerType()),
            T.StructField("done", T.BooleanType()),
        ]
    )

    def _track(key, pdf_iter, state):
        attempts, done = state.get if state.exists else (0, False)
        rows = []
        for pdf in pdf_iter:
            for ok in pdf.sort_values("ts")["ok"]:
                if done:
                    continue
                if bool(ok):
                    done = True
                    rows.append((key[0], attempts, "completed"))
                else:
                    attempts += 1
                    if attempts > retry_limit:
                        done = True
                        rows.append((key[0], attempts, "dead_letter"))
                    else:
                        rows.append((key[0], attempts, "retrying"))
        state.update((attempts, done))
        yield pd.DataFrame(rows, columns=["job_id", "attempts", "status"])

    return outcomes.groupBy("job_id").applyInPandasWithState(
        _track,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
