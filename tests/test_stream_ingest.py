"""Streaming dedup ingestion (storage_spark/streaming/ingest.py):
stream result == sequential batch recompute; replay is idempotent."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from storage_spark.streaming.ingest import (
    dedup_ingest_batch,
    stream_dedup_ingest,
)

DOCS = [
    # batch 0: 0/1 near-dup (1 rejected — same batch, higher id); 2 unique
    (0, "alpha beta gamma delta epsilon zeta"),
    (1, "alpha beta gamma delta epsilon eta"),
    (2, "one two three four five six"),
    # batch 1: 10 duplicates indexed doc 0 (rejected); 11 unique
    (10, "alpha beta gamma delta epsilon zeta"),
    (11, "seven eight nine ten eleven twelve"),
    # batch 2: 20 duplicates REJECTED doc 10's text → still rejected
    # (matches surviving doc 0's bands), 21 unique
    (20, "alpha beta gamma delta epsilon zeta"),
    (21, "thirteen fourteen fifteen sixteen seventeen eighteen"),
]
KW = dict(n=2, n_hashes=4, band_size=1)
EXPECTED = {0, 2, 11, 21}


def _accepted_ids(spark, path):
    files = glob.glob(path + "/epoch=*/*.parquet")
    if not files:
        return set()
    return {
        r["doc_id"]
        for r in spark.read.parquet(path).select("doc_id").collect()
    }


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batch_ticks_gate_against_persistent_index(spark, tmp_path):
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    batches = [DOCS[0:3], DOCS[3:5], DOCS[5:7]]
    for e, rows in enumerate(batches):
        dedup_ingest_batch(_docs_df(spark, rows), e, idx, acc, **KW)
    assert _accepted_ids(spark, acc) == EXPECTED
    # index holds band rows ONLY for accepted docs
    idx_docs = {r["doc"] for r in spark.read.parquet(idx).select("doc").collect()}
    assert idx_docs == EXPECTED


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    dedup_ingest_batch(_docs_df(spark, DOCS[0:3]), 0, idx, acc, **KW)
    dedup_ingest_batch(_docs_df(spark, DOCS[3:5]), 1, idx, acc, **KW)
    before = _accepted_ids(spark, acc)
    # at-least-once replay of epoch 1 (same data) overwrites its own
    # partition instead of appending duplicates
    dedup_ingest_batch(_docs_df(spark, DOCS[3:5]), 1, idx, acc, **KW)
    assert _accepted_ids(spark, acc) == before
    counts = (
        spark.read.parquet(acc).groupBy("doc_id").count().collect()
    )
    assert all(r["count"] == 1 for r in counts)


def test_stream_matches_sequential_recompute(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for e, rows in enumerate([DOCS[0:3], DOCS[3:5], DOCS[5:7]]):
        _docs_df(spark, rows).coalesce(1).write.parquet(
            str(src / f"b{e}"), mode="overwrite"
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    q = stream_dedup_ingest(
        stream, idx, acc, str(tmp_path / "ckpt"), **KW
    )
    q.awaitTermination(120)
    # file-source micro-batch boundaries differ from the hand-fed ticks,
    # but every expected unique text survives and every duplicate text is
    # represented exactly once
    got = _accepted_ids(spark, acc)
    texts = {
        r["text"]
        for r in spark.read.parquet(acc).select("text").collect()
    }
    assert len(got) == len(texts) == 4
    assert {t.split()[0] for t in texts} == {"alpha", "one", "seven", "thirteen"}


def test_intra_batch_id_discipline(spark, tmp_path):
    """ADVICE r6: within ONE batch, exact (id, text) repeats collapse
    idempotently (accepted exactly once — the row-preserving guarantee
    compaction relies on), but the same id with DIFFERENT text is a
    collision the near-dup gate cannot canonicalize → raise."""
    import pytest

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    # exact repeat of doc 2 inside the batch: accepted once, no raise
    repeats = [DOCS[0], DOCS[2], DOCS[2]]
    dedup_ingest_batch(_docs_df(spark, repeats), 0, idx, acc, **KW)
    assert _accepted_ids(spark, acc) == {0, 2}
    counts = spark.read.parquet(acc).groupBy("doc_id").count().collect()
    assert all(r["count"] == 1 for r in counts)
    # same id, different text, same batch → collision → raise
    clash = [(40, "first version of the text"), (40, "second disagreeing text")]
    with pytest.raises(ValueError, match="intra-batch id collision"):
        dedup_ingest_batch(_docs_df(spark, clash), 1, idx, acc, **KW)


def test_id_reuse_across_epochs_raises(spark, tmp_path):
    """An id already in the index is the one thing the gate cannot judge
    (same-id index-vs-batch pairs are canonicalization-filtered), so it
    must RAISE, not silently append a second band-row set. Replay of the
    SAME epoch stays exempt (its own partial write is excluded)."""
    import pytest

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    dedup_ingest_batch(_docs_df(spark, DOCS[0:3]), 0, idx, acc, **KW)
    # doc id 0 again, different text, NEW epoch → id reuse → raise
    reused = [(0, "totally different words here now indeed")]
    with pytest.raises(ValueError, match="reuses doc id"):
        dedup_ingest_batch(_docs_df(spark, reused), 1, idx, acc, **KW)
    # same ids, SAME epoch (replay) → fine
    dedup_ingest_batch(_docs_df(spark, DOCS[0:3]), 0, idx, acc, **KW)
    assert _accepted_ids(spark, acc) == {0, 2}


def test_skip_exact_mode_tolerates_at_least_once_redelivery(spark, tmp_path):
    """ADVICE r5: an at-least-once upstream may redeliver an ALREADY
    ACCEPTED document verbatim under a new epoch. on_id_reuse='skip_exact'
    drops the exact (id, text) redelivery idempotently and still raises
    when the content under a reused id actually differs."""
    import pytest

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    dedup_ingest_batch(_docs_df(spark, DOCS[0:3]), 0, idx, acc, **KW)
    assert _accepted_ids(spark, acc) == {0, 2}
    # identical doc 0 redelivered in a NEW epoch alongside a fresh doc:
    # redelivery skipped, fresh doc gated normally, no raise
    redeliver = [DOCS[0], (30, "brand new unique words for epoch one")]
    dedup_ingest_batch(
        _docs_df(spark, redeliver), 1, idx, acc, on_id_reuse="skip_exact", **KW
    )
    assert _accepted_ids(spark, acc) == {0, 2, 30}
    # same id, DIFFERENT content → still a real collision → raise
    with pytest.raises(ValueError, match="reuses doc id"):
        dedup_ingest_batch(
            _docs_df(spark, [(0, "mutated content under a reused id")]),
            2, idx, acc, on_id_reuse="skip_exact", **KW,
        )
    # default mode unchanged: exact redelivery in a new epoch raises
    with pytest.raises(ValueError, match="reuses doc id"):
        dedup_ingest_batch(_docs_df(spark, [DOCS[0]]), 3, idx, acc, **KW)


def test_compact_ingest_tables_preserves_gate_and_fails_replay_loudly(
    spark, tmp_path
):
    """Epoch compaction (the streaming analogue of ann_index_compact):
    consolidating epochs < before_epoch into one negative partition must
    leave the gate's view identical — same accepted ids, same band-row
    set, same decisions on the next batch — while removing the per-epoch
    partitions. A replay of a COMPACTED epoch cannot be idempotent any
    more, so it must fail loudly (id-reuse gate). Re-running compaction
    is idempotent."""
    import glob as _glob

    import pytest

    from storage_spark.streaming.ingest import compact_ingest_tables

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    idx2, acc2 = str(tmp_path / "idx2"), str(tmp_path / "acc2")
    batches = [DOCS[0:3], DOCS[3:5], DOCS[5:7]]
    for e, rows in enumerate(batches):
        dedup_ingest_batch(_docs_df(spark, rows), e, idx, acc, **KW)
        dedup_ingest_batch(_docs_df(spark, rows), e, idx2, acc2, **KW)
    assert _accepted_ids(spark, acc) == EXPECTED
    before_bands = sorted(
        map(tuple, spark.read.parquet(idx).drop("epoch").collect())
    )
    report = compact_ingest_tables(spark, idx, acc, before_epoch=2)
    assert report["index"]["epochs_removed"] == [0, 1]
    assert report["accepted"]["epochs_removed"] == [0, 1]
    # partitions: consolidated + the uncompacted epoch 2 only
    eps = sorted(
        int(d.split("=")[1]) for d in
        (p.split("/")[-1] for p in _glob.glob(idx + "/epoch=*"))
    )
    assert eps == [-1, 2]
    # gate view identical
    assert _accepted_ids(spark, acc) == EXPECTED
    assert sorted(
        map(tuple, spark.read.parquet(idx).drop("epoch").collect())
    ) == before_bands
    # next batch gates identically vs the uncompacted clone
    nxt = [(30, "alpha beta gamma delta epsilon zeta"),  # dup of doc 0
           (31, "completely fresh words nineteen twenty twentyone")]
    dedup_ingest_batch(_docs_df(spark, nxt), 3, idx, acc, **KW)
    dedup_ingest_batch(_docs_df(spark, nxt), 3, idx2, acc2, **KW)
    assert _accepted_ids(spark, acc) == _accepted_ids(spark, acc2)
    assert 31 in _accepted_ids(spark, acc) and 30 not in _accepted_ids(spark, acc)
    # replay of a compacted epoch -> loud failure, not silent duplication
    with pytest.raises(ValueError, match="reuses doc id"):
        dedup_ingest_batch(_docs_df(spark, batches[0]), 0, idx, acc, **KW)
    # replay of the NOT-compacted epoch 2 stays idempotent
    dedup_ingest_batch(_docs_df(spark, batches[2]), 2, idx, acc, **KW)
    # idempotent re-run (heals a hypothetical crash between write+delete)
    again = compact_ingest_tables(spark, idx, acc, before_epoch=2)
    assert again["index"]["epochs_removed"] == []
    assert _accepted_ids(spark, acc) == _accepted_ids(spark, acc2)
    with pytest.raises(ValueError, match="negative"):
        compact_ingest_tables(spark, idx, acc, before_epoch=2, compacted_epoch=0)


def test_compact_crash_leftover_heals_without_duplicates(spark, tmp_path):
    """Review-r6: a crash between the consolidated write and the epoch
    deletes leaves leftover epoch dirs whose rows ALSO live in the
    consolidated partition. Re-running compaction must restore the
    exact row multiset (whole-row dedupe), not bake the duplicates in."""
    import shutil

    from storage_spark.streaming.ingest import compact_ingest_tables

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    for e, rows in enumerate([DOCS[0:3], DOCS[3:5], DOCS[5:7]]):
        dedup_ingest_batch(_docs_df(spark, rows), e, idx, acc, **KW)
    compact_ingest_tables(spark, idx, acc, before_epoch=2)
    acc_rows = sorted(map(tuple, spark.read.parquet(acc).drop("epoch").collect()))
    idx_rows = sorted(map(tuple, spark.read.parquet(idx).drop("epoch").collect()))
    # simulate the crash: a leftover epoch dir holding byte-identical
    # copies of consolidated rows
    shutil.copytree(acc + "/epoch=-1", acc + "/epoch=0")
    shutil.copytree(idx + "/epoch=-1", idx + "/epoch=0")
    assert len(spark.read.parquet(acc).collect()) > len(acc_rows)  # duplicated now
    compact_ingest_tables(spark, idx, acc, before_epoch=2)
    assert sorted(map(tuple, spark.read.parquet(acc).drop("epoch").collect())) == acc_rows
    assert sorted(map(tuple, spark.read.parquet(idx).drop("epoch").collect())) == idx_rows


# ---------------------------------------------------------------------------
# streaming line scrub (line_scrub_ingest_batch / compact_line_stats_table)
# ---------------------------------------------------------------------------

LINE_DOCS = [
    # batch 0: doc 0 plants the boilerplate lines
    (0, "Home\nFirst original body\nContact"),
    (1, "Second original body\nHome"),
    # batch 1: boilerplate from batch 0 must vanish
    (10, "Home\nThird body\nContact"),
    (11, "Fourth body"),
    # batch 2: lines from batches 0 AND 1 scrub
    (20, "Contact\nSecond original body\nFifth body"),
]
_BATCHES = [
    [d for d in LINE_DOCS if d[0] < 10],
    [d for d in LINE_DOCS if 10 <= d[0] < 20],
    [d for d in LINE_DOCS if d[0] >= 20],
]


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _accepted_texts(spark, path):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(path).select("doc_id", "text").collect()
    }


def test_line_scrub_ticks_and_forward_equivalence(spark, tmp_path):
    from storage_spark.operators.dedup import line_dedup
    from storage_spark.streaming.ingest import line_scrub_ingest_batch

    idx = str(tmp_path / "lidx")
    acc = str(tmp_path / "lacc")
    for ep, rows in enumerate(_BATCHES):
        line_scrub_ingest_batch(_mkdf(spark, rows), ep, idx, acc)
    got = _accepted_texts(spark, acc)
    assert got[0] == "Home\nFirst original body\nContact"
    assert got[1] == "Second original body"          # Home seen in epoch 0
    assert got[10] == "Third body"                    # both boilerplate gone
    assert got[11] == "Fourth body"
    assert got[20] == "Fifth body"                    # epoch-0 AND epoch-1 lines
    # forward-only contract: stream result == one-shot keep-first
    full = {
        r.doc_id: r.text
        for r in line_dedup(_mkdf(spark, LINE_DOCS)).collect()
    }
    assert got == full


def test_line_scrub_replay_is_idempotent(spark, tmp_path):
    from storage_spark.streaming.ingest import line_scrub_ingest_batch

    idx = str(tmp_path / "lidx2")
    acc = str(tmp_path / "lacc2")
    for ep, rows in enumerate(_BATCHES):
        line_scrub_ingest_batch(_mkdf(spark, rows), ep, idx, acc)
    before = _accepted_texts(spark, acc)
    # replay epoch 1: own-epoch exclusion + per-epoch overwrite
    line_scrub_ingest_batch(_mkdf(spark, _BATCHES[1]), 1, idx, acc)
    assert _accepted_texts(spark, acc) == before


def test_line_scrub_stream_wrapper_drains(spark, tmp_path):
    from storage_spark.streaming.ingest import stream_line_scrub_ingest

    src = str(tmp_path / "src")
    _mkdf(spark, LINE_DOCS).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = stream_line_scrub_ingest(
        stream, str(tmp_path / "sidx"), str(tmp_path / "sacc"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = _accepted_texts(spark, str(tmp_path / "sacc"))
    # one batch (availableNow over one parquet dir) == plain keep-first
    from storage_spark.operators.dedup import line_dedup

    full = {
        r.doc_id: r.text
        for r in line_dedup(_mkdf(spark, LINE_DOCS)).collect()
    }
    assert got == full


def test_compact_line_stats_preserves_scrub_decisions(spark, tmp_path):
    from storage_spark.streaming.ingest import (
        compact_line_stats_table,
        line_scrub_ingest_batch,
    )

    idx = str(tmp_path / "lidx3")
    acc = str(tmp_path / "lacc3")
    for ep, rows in enumerate(_BATCHES[:2]):
        line_scrub_ingest_batch(_mkdf(spark, rows), ep, idx, acc)
    n = compact_line_stats_table(spark, idx, before_epoch=2)
    assert n > 0
    # epoch dirs 0/1 gone, compacted partition present
    import os

    eps = sorted(e for e in os.listdir(idx) if e.startswith("epoch="))
    assert eps == ["epoch=-1"]
    # the NEXT batch scrubs identically against the compacted index
    line_scrub_ingest_batch(_mkdf(spark, _BATCHES[2]), 2, idx, acc)
    got = _accepted_texts(spark, acc)
    assert got[20] == "Fifth body"
    # re-running compaction over the same boundary is a no-op
    assert compact_line_stats_table(spark, idx, before_epoch=2) == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_line_stats_table(spark, idx, before_epoch=3,
                                 compacted_epoch=5)
