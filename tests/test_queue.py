"""Queue tick semantics: claim, retry counters, dead-letter, singleton."""

from __future__ import annotations

import pytest

from storage_spark.streaming.queue import apply_outcomes, claim_batch

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
