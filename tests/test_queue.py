"""Queue tick semantics: claim, retry counters, dead-letter, singleton."""

from __future__ import annotations

import pytest

from storage_spark.streaming.queue import apply_outcomes, claim_batch, due_jobs

SCHEMA = (
    "job_id long, queue string, singleton_key string, attempts int,"
    " created_at_ms long"
)


@pytest.fixture()
def jobs(spark):
    return spark.createDataFrame(
        [
            (1, "webhooks", "t1/b1", 0, 100),
            (2, "webhooks", "t1/b1", 0, 200),  # same singleton key as 1
            (3, "webhooks", "t1/b2", 19, 300),
            (4, "deletes", "t2/b1", 0, 50),
        ],
        SCHEMA,
    )


def test_claim_batch_singleton_and_order(spark, jobs):
    got = claim_batch(jobs, "webhooks", batch_size=10).collect()
    assert [r.job_id for r in got] == [1, 3]  # job 2 deduped by singleton
    got = claim_batch(jobs, "webhooks", batch_size=10, singleton_dedup=False).collect()
    assert [r.job_id for r in got] == [1, 2, 3]


def test_outcomes_transition(spark, jobs):
    outcomes = spark.createDataFrame(
        [(1, True), (3, False), (4, False)], "job_id long, ok boolean"
    )
    pending, completed, dead = apply_outcomes(jobs, outcomes, retry_limit=19)
    assert {r.job_id for r in completed.collect()} == {1}
    assert {r.job_id for r in dead.collect()} == {3}  # 19+1 > 19
    pend = {r.job_id: r.attempts for r in pending.collect()}
    assert pend == {2: 0, 4: 1}  # 2 untouched, 4 retried with bumped counter


def test_null_singleton_keys_are_not_deduped(spark):
    """pg-boss: no singletonKey means no dedup — NULL keys must all claim,
    not collapse into one window group."""
    jobs = spark.createDataFrame(
        [
            (1, "webhooks", None, 0, 100),
            (2, "webhooks", None, 0, 200),
            (3, "webhooks", None, 0, 300),
            (4, "webhooks", "k1", 0, 50),
            (5, "webhooks", "k1", 0, 60),
        ],
        SCHEMA,
    )
    got = [r.job_id for r in claim_batch(jobs, "webhooks", batch_size=10).collect()]
    assert got == [4, 1, 2, 3]  # all NULL-key jobs + one per singleton key


def test_exponential_backoff_schedule(spark, jobs):
    """pg-boss retryBackoff as a column: delay doubles per attempt and
    due_jobs gates claims until the stamp elapses."""
    outcomes = spark.createDataFrame(
        [(1, False), (4, False)], "job_id long, ok boolean"
    )
    pending, _, _ = apply_outcomes(
        jobs, outcomes, retry_limit=19, now_ms=10_000, retry_delay_ms=1000
    )
    stamps = {r.job_id: r.next_attempt_at_ms for r in pending.collect()}
    assert stamps[1] == 11_000  # attempt 1 -> +1000 * 2^0
    assert stamps[4] == 11_000
    assert stamps[2] is None and stamps[3] is None  # untouched: no stamp
    # second failure doubles the delay
    pending2, _, _ = apply_outcomes(
        pending, outcomes, retry_limit=19, now_ms=11_000, retry_delay_ms=1000
    )
    stamps2 = {r.job_id: r.next_attempt_at_ms for r in pending2.collect()}
    assert stamps2[1] == 13_000  # attempt 2 -> +1000 * 2^1
    # claim gating: nothing with a future stamp is due
    assert {r.job_id for r in due_jobs(pending2, now_ms=11_500).collect()} == {2, 3}
    assert {r.job_id for r in due_jobs(pending2, now_ms=13_000).collect()} == {1, 2, 3, 4}
    # jobs without the column pass through untouched
    assert due_jobs(jobs, now_ms=0).count() == 4


def test_job_state_machine_counts_across_micro_batches(spark, tmp_path):
    """The attempt counter must SURVIVE micro-batch boundaries (state
    store), emit one row per transition, dead-letter past the limit, and
    ignore outcome events after a job is terminal."""
    from storage_spark.streaming.queue import job_state_machine

    src = tmp_path / "outcomes"
    src.mkdir()
    schema = "job_id string, ok boolean, ts long"
    # batch file 1: job-a fails twice; job-b fails once
    spark.createDataFrame(
        [("job-a", False, 1), ("job-a", False, 2), ("job-b", False, 3)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b1"))
    # batch file 2: job-a fails again (3rd > limit=2 -> dead_letter),
    # job-b succeeds, then gets a late duplicate outcome (ignored)
    spark.createDataFrame(
        [("job-a", False, 4), ("job-b", True, 5), ("job-b", True, 6)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    out = job_state_machine(stream, retry_limit=2)
    q = (
        out.writeStream.format("memory")
        .queryName("job_sm")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [
        (r.job_id, r.attempts, r.status)
        for r in spark.table("job_sm").orderBy("job_id", "attempts").collect()
    ]
    assert rows == [
        ("job-a", 1, "retrying"),
        ("job-a", 2, "retrying"),
        ("job-a", 3, "dead_letter"),  # counter carried across batches
        ("job-b", 1, "retrying"),
        ("job-b", 1, "completed"),    # duplicate success ignored
    ]
