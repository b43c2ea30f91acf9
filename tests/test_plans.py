"""Physical-plan audits: the properties that make these operators survive a
100x scale-up. Each assertion reads the executed/optimized plan text:

- prefix listings push a sargable name range into the parquet scan;
- dimension joins broadcast (no shuffle of the big side);
- aggregations are partial (map-side combine) before the shuffle;
- top-k lowers to TakeOrderedAndProject (no global sort);
- reconciliation anti-joins never collect to the driver.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from storage_spark.tables import load_all


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def objects_parquet(spark, sf_dir, tmp_path_factory):
    """Materialized objects table — the production layout (bucket-partitioned
    files with physical name column) where pushdown applies; the in-memory
    derived view computes name, which no engine could push."""
    path = str(tmp_path_factory.mktemp("objstore") / "objects")
    load_all(spark, sf_dir)["objects"].write.partitionBy("bucket_id").parquet(path)
    return spark.read.parquet(path)


def test_prefix_range_pushdown(spark, objects_parquet):
    from storage_spark.operators.listing import list_objects_flat

    df = list_objects_flat(objects_parquet, bucket_id="Brand#13", prefix="ECONOMY/")
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(name,ECONOMY/)" in plan
    assert "LessThan(name,ECONOMY0)" in plan
    # partition pruning on the bucket directory
    assert "PartitionFilters" in plan


def test_search_v1_lower_range_reaches_filter(spark, objects_parquet):
    """search-v1's case-insensitive match compiles to a sargable
    lower(name) range (the 0051 expression-index rewrite), not a
    per-row ILIKE — the range sits in the scan-side Filter so a layout
    with a lower(name)-derived column (or Delta min/max on it) can
    skip files; no regex/contains anywhere in the plan."""
    from storage_spark.operators.listing import search_objects_v1

    df = search_objects_v1(
        objects_parquet, bucket_id="Brand#13", search="promo", levels=1
    )
    plan = plan_of(df)
    assert "lower(name" in plan and ">= promo" in plan and "< promp" in plan
    assert "RLike" not in plan and "Contains" not in plan


def test_dimension_join_broadcasts(spark, sf_dir):
    t = load_all(spark, sf_dir)
    df = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .count()
    )
    assert "BroadcastHashJoin" in plan_of(df)


def test_aggregation_is_partial(spark, objects_parquet):
    from storage_spark.operators.aggregates import bucket_usage

    plan = plan_of(bucket_usage(objects_parquet))
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_topk_lowering(spark, objects_parquet):
    from storage_spark.operators.listing import top_k_merge

    a = objects_parquet.filter(F.col("bucket_id") == "Brand#13").select("name")
    b = objects_parquet.filter(F.col("bucket_id") == "Brand#22").select("name")
    plan = plan_of(top_k_merge([a, b], [F.col("name").asc()], 20))
    assert "TakeOrderedAndProject" in plan


#: Queries where a BroadcastNestedLoopJoin is the intended physical op:
#: bounded all-pairs generation (docstrings point at the LSH/banded/IVF
#: alternatives for scale) or a 1-row x 1-row scalar combine.
_BNLJ_ALLOWED = {
    "vector_knn_join",
    "vector_projected_rerank",  # knn_join over the 16-dim projection
    "vector_ivf_ann",
    "ann_index_ivf_query",  # same broadcast centroid ranking, persisted index
    "vector_filtered_ivf",
    "key_validation",
    # PQ ADC intentionally scans every CODE word per query (that scan of
    # m-byte codes is the whole point — the corpus vectors themselves are
    # never touched until the rerank's candidate semi-join)
    "vector_pq_topk",
    "vector_pq_rerank",
    "vector_ivfpq",  # broadcast centroid ranking, like vector_ivf_ann
    "vector_ivfpq_residual",  # same shape; codes/query on residuals
    # SQ8 reconstruction ranking is the same exact-knn broadcast shape
    # as vector_knn_join (1 byte/coordinate scanned instead of 4 — the
    # compression changes the bytes, not the join); ivfsq adds the
    # broadcast centroid ranking like vector_ivf_ann
    "vector_sq8",
    "vector_ivfsq",
    # semantic dedup's cell assignment is the same broadcast centroid
    # ranking as vector_ivf_ann; the pair stage itself is an equi-join
    # on cell, never a product
    "semantic_dedup",
    "semantic_dedup_components",
    "semantic_dedup_incremental",
    "semantic_cluster_stats",
    # the (N, V) totals table is ONE row crossJoined broadcast onto the
    # scored tokens — the 1-row scalar-combine BNLJ class, like
    # key_validation; the vocabulary/pair joins themselves are equi-joins
    "unigram_logprob",
    "bigram_logprob",
    # same 1-row totals crossJoin (NB class totals / DSIR model totals);
    # the model joins are equi-joins on tok / bucket
    "classifier_score",
    "curate_corpus_gated",  # same classifier 1-row totals crossJoin gate
    "dsir_select",
    "dsir_select_per_lang",  # same DSIR 1-row model-totals crossJoin
    "perplexity_buckets",  # totals + 1-row threshold crossJoins
    # 1-row exact-count x 1-row HLL-estimate scalar combine — the same
    # key_validation class; the sketch itself is one groupBy(bucket)
    "hll_distinct_tokens",
    # chain of 1-row scalar combines (resemblance, two estimates, exact
    # intersection/union counts); the sketches are bounded TakeOrdereds
    "kmv_resemblance",
    # 1-row (T, V) totals crossJoin onto the scored pairs — the
    # unigram/bigram_logprob class; model joins are equi-joins
    "kn_bigram",
    "kn_trigram",  # same 1-row totals crossJoin, five equi-join models
    "kn_quadgram",  # same 1-row totals crossJoin, seven equi-join models
    # |langs|-row broadcast cross (per-doc scores need every language
    # row even with zero matched grams) + the fit's 1-row gram-count
    # cross — both bounded by model geometry, never by the corpus
    "langid_trained",
    "langid_word_confusables",  # same scoring cross, tagged word features
    "line_dedup_trained_lang",  # same langid scoring shape upstream
    # the cumulative quantile walk: a |quantiles|-row × ≤512-bucket
    # inequality join — geometry-bounded like the HLL register scan
    # (the exact-quantile comparison column's global row_number is the
    # error-visibility leg, not the sketch)
    "quantile_sketch",
    "quantile_per_bucket",  # same walk, range condition beside the
    # group equi key — bounded by groups × buckets
    "quantile_per_trained_lang",  # langid scoring cross + the grouped
    # walk — both geometry-bounded
}


def test_no_bad_physical_operators_in_any_query(spark, sf_dir):
    """Sweep every driver query's physical plan: no CartesianProduct, no
    row-at-a-time Python evaluation, and nested-loop joins only where the
    operator is intentionally all-pairs."""
    import __spark_entry__ as entry_mod

    offenders = {}
    for name, fn in sorted(entry_mod.queries().items()):
        plan = plan_of(fn(spark, sf_dir))
        hits = []
        if "CartesianProduct" in plan:
            hits.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            hits.append("row-Python-UDF")
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_ALLOWED:
            hits.append("BroadcastNestedLoopJoin")
        if hits:
            offenders[name] = hits
    assert not offenders, offenders


# Queries allowed to carry a PARTITION-LESS window (Spark plans those as a
# single-partition WindowExec — the textbook scale-killer when the window
# input is corpus-sized). Every entry here is bounded by operator GEOMETRY,
# not by the corpus: the window's input frame is already reduced to a
# constant- or group-count-sized relation before the window runs.
_GLOBAL_WINDOW_ALLOWED = {
    # rank over the k-row frame produced by TakeOrderedAndProject (the
    # r11-verdict fix: top-k FIRST, then row_number over k rows);
    # test_heavy_hitters_ranks_after_takeordered pins the lowering
    "cms_heavy_hitters",
    # the grouped prefix-sum pattern (ordering.py): per-group windows do
    # the corpus-sized work; the global window runs over the #groups-row
    # broadcast offset table only
    "corpus_mixture",
    "global_ids",
    "webdataset_export",
    # largest-remainder seat assignment: the global _rem ranking runs over
    # one row per group/lang (the allocation table), never the corpus
    "proportional_sample",
    "temperature_sample",
    # the cumulative sketch walk is bounded at <=512 buckets; the exact
    # side's global row_number is the error-visibility audit leg the row
    # exists to publish (the production shape keeps only the sketch)
    "quantile_sketch",
}


def test_no_unbounded_global_window_in_any_query(spark, sf_dir):
    """Sweep every driver query's physical plan for partition-less window
    specs (first windowspecdefinition argument is a sort column, i.e. no
    partition key). Those plan as single-partition WindowExec; each one in
    the registry must be on the documented geometry-bounded allowlist."""
    import re

    import __spark_entry__ as entry_mod

    offenders = {}
    for name, fn in sorted(entry_mod.queries().items()):
        plan = plan_of(fn(spark, sf_dir))
        firsts = re.findall(r"windowspecdefinition\(([^,]+),", plan)
        hits = [a for a in firsts if " ASC" in a or " DESC" in a]
        if hits and name not in _GLOBAL_WINDOW_ALLOWED:
            offenders[name] = hits
    assert not offenders, offenders


def test_heavy_hitters_ranks_after_takeordered(spark, sf_dir):
    """heavy_hitters_cms must take the exact top-k via
    TakeOrderedAndProject BEFORE ranking (the r11 verdict scale-killer:
    ranking the full vocabulary through one window task)."""
    from storage_spark.operators.analytics import heavy_hitters_cms

    t = load_all(spark, sf_dir)
    plan = plan_of(heavy_hitters_cms(t["documents"], k=20))
    assert "TakeOrderedAndProject" in plan


def test_ivf_centroid_pass_is_distributed(spark, sf_dir):
    """The corpus pass behind ivf_centroids must lower to
    TakeOrderedAndProject (per-partition local top-n), never a
    single-partition Window/Sort over the whole corpus."""
    from storage_spark.functions.vectors import _first_n_by_key

    t = load_all(spark, sf_dir)
    v = t["embeddings"].select(
        F.col("vec_id").cast("string").alias("key"), "embedding"
    )
    plan = plan_of(_first_n_by_key(v, 8, "key", "embedding"))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_ivf_layout_prunes_cells(spark, sf_dir, tmp_path_factory):
    """The cell-partitioned vector layout turns a probe into a
    partition-pruned scan: filtering 2 of 8 cells shows PartitionFilters
    on cell and skips the other partitions' files."""
    from storage_spark.functions.vectors import ivf_assign, ivf_centroids
    from storage_spark.sources.layout import write_ivf_layout

    t = load_all(spark, sf_dir)
    v = t["embeddings"].select(
        F.col("vec_id").cast("string").alias("key"), "embedding"
    )
    cents = ivf_centroids(v, n_cells=8)
    path = str(tmp_path_factory.mktemp("ivf") / "corpus")
    write_ivf_layout(ivf_assign(v, cents), path)
    mat = spark.read.parquet(path)
    probed = mat.filter(F.col("cell").isin(2, 5))
    plan = plan_of(probed)
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]
    # pruned read returns exactly the probed cells' rows
    expect = ivf_assign(v, cents).filter(F.col("cell").isin(2, 5)).count()
    assert probed.count() == expect > 0


def test_banded_pairing_has_no_crossjoin(spark, sf_dir):
    """simhash_near_pairs and embedding_near_dup_pairs left the BNLJ
    allowlist: their candidate generation is a (band, value) equi-join."""
    from storage_spark.operators.dedup import (
        embedding_near_dup_pairs,
        simhash16,
        simhash_near_pairs,
    )

    t = load_all(spark, sf_dir)
    sim = simhash16(t["documents"].filter(F.col("doc_id") < 40))
    p1 = plan_of(simhash_near_pairs(sim, max_hamming=6))
    v = t["embeddings"].select(F.col("vec_id").cast("string").alias("key"), "embedding")
    p2 = plan_of(embedding_near_dup_pairs(v, max_distance=0.6))
    for plan in (p1, p2):
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_reconcile_plans(spark, sf_dir):
    from storage_spark.operators.reconcile import consistency_report, s3_orphans

    t = load_all(spark, sf_dir)
    # directional orphan scans stay anti-joins…
    assert "LeftAnti" in plan_of(s3_orphans(t["objects"], t["s3_keys"]))
    # …while the both-directions report is ONE full-outer pass (each side
    # scanned/shuffled once, not twice)
    plan = plan_of(consistency_report(t["objects"], t["s3_keys"]))
    assert "FullOuter" in plan
    assert "LeftAnti" not in plan


def test_compaction_restores_file_invariant(spark, sf_dir, tmp_path_factory):
    """Fragmented layout (many files per bucket) compacts back to one
    sorted file per bucket partition with rows preserved and the prefix
    pushdown still reaching the scan."""
    import glob

    from storage_spark.sources.layout import compact_listing_layout

    t = load_all(spark, sf_dir)
    base = tmp_path_factory.mktemp("compact")
    frag, tidy = str(base / "frag"), str(base / "tidy")
    # simulate many incremental commits: 8 files per bucket
    t["objects"].repartition(8).write.partitionBy("bucket_id").parquet(frag)
    assert len(glob.glob(f"{frag}/bucket_id=Brand%2313/*.parquet")) > 1
    compact_listing_layout(spark, frag, tidy)
    assert len(glob.glob(f"{tidy}/bucket_id=Brand%2313/*.parquet")) == 1
    assert spark.read.parquet(tidy).count() == t["objects"].count()
    from storage_spark.operators.listing import list_objects_flat

    plan = plan_of(
        list_objects_flat(spark.read.parquet(tidy), bucket_id="Brand#13", prefix="ECONOMY/")
    )
    assert "PushedFilters" in plan and "PartitionFilters" in plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path_factory):
    """Join layout: bucketing both sides on the join key removes every
    Exchange from the reconcile-shaped equi-join."""
    from storage_spark.operators.reconcile import clean_s3_keys, object_keys
    from storage_spark.sources.layout import write_bucketed_table

    t = load_all(spark, sf_dir)
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    db = object_keys(t["objects"]).select("key")
    s3 = clean_s3_keys(t["s3_keys"]).select("key")
    import shutil

    for name in ("db_keys_bkt", "s3_keys_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"spark-warehouse/{name}", ignore_errors=True)
    write_bucketed_table(db, "db_keys_bkt", "key", 8)
    write_bucketed_table(s3, "s3_keys_bkt", "key", 8)
    joined = (
        spark.table("db_keys_bkt")
        .hint("merge")
        .join(spark.table("s3_keys_bkt").hint("merge"), "key")
    )
    plan = plan_of(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: no shuffle on either side
    assert joined.count() > 0


def test_spread_is_conditional(spark, tmp_path_factory):
    """_spread() fans a single-file corpus out to full parallelism, but a
    well-partitioned input passes through with NO added Exchange — at 100 TB
    an unconditional repartition is a gratuitous full shuffle."""
    from storage_spark.operators.dedup import _spread

    par = spark.sparkContext.defaultParallelism
    path = str(tmp_path_factory.mktemp("spread") / "docs")
    spark.range(1000).withColumnRenamed("id", "doc_id").repartition(
        par * 2
    ).write.parquet(path)
    wide = spark.read.parquet(path)
    assert wide.rdd.getNumPartitions() >= par
    assert _spread(wide) is wide  # identity: no new plan node at all
    assert "Exchange" not in plan_of(_spread(wide).select("doc_id"))
    narrow = spark.range(10).coalesce(1)
    spread = _spread(narrow)
    assert spread is not narrow
    narrow_plan = plan_of(spread)
    assert "Exchange" in narrow_plan and "RoundRobinPartitioning" in narrow_plan


def test_dynamic_partition_pruning_on_dim_filter(spark, objects_parquet, sf_dir):
    """The 100 TB join shape: fact (bucket-partitioned objects) joined to a
    FILTERED dimension must prune fact partitions at runtime (DPP) — the
    scan reads only partitions whose bucket survives the dim filter,
    instead of all of them. The plan carries a dynamicpruning subquery in
    the fact scan's partition filters."""
    buckets = load_all(spark, sf_dir)["buckets"]
    dim = buckets.filter(F.col("owner_id") == buckets.select("owner_id").first()[0])
    joined = objects_parquet.join(
        dim.select(F.col("name").alias("bucket_id")), "bucket_id"
    )
    plan = plan_of(joined, "formatted").lower()
    assert "dynamicpruning" in plan, plan


def test_global_id_offsets_broadcast(spark, sf_dir):
    """assign_global_ids' offset table joins by BROADCAST (it is #groups
    rows); the data never shuffles for the join, only for the per-group
    window."""
    from storage_spark.operators.ordering import assign_global_ids

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = assign_global_ids(
        docs, [F.col("lang"), F.col("doc_id")], group_col="lang"
    )
    plan = plan_of(out, "formatted")
    assert "BroadcastHashJoin" in plan, plan


def test_olap_queries_broadcast_dimensions(spark, sf_dir):
    """TPC-H-shaped analytics: every dimension side broadcasts; no
    SortMergeJoin on a dim, no cartesian anywhere."""
    import __spark_entry__ as entry_mod

    for name in ("unshipped_orders", "region_revenue"):
        plan = plan_of(entry_mod.queries()[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
    # region_revenue: the ONLY sort-merge-eligible join is fact-fact
    # (lineitem ⋈ orders); all four dims must come in as broadcasts
    plan = plan_of(entry_mod.queries()["region_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3, plan.count("BroadcastHashJoin")


def test_lm_fit_model_tables_are_pinned(spark, sf_dir):
    """The r12 optimization: inline-fit model/type tables are
    localCheckpoint-ed (pipeline._pin_model), so a scorer's final plan
    re-reads the small pinned table instead of replaying the corpus fit
    aggregation once per reference. The pin shows up as parquet-scan /
    Generate counts: before it, bigram_logprob's inline-fit plan carried
    10 corpus scans + 10 explodes (plans/r12/lm_bigram_before.txt),
    kn_trigram_score 18 + 18."""
    from storage_spark.operators.pipeline import (
        bigram_logprob,
        dsir_sample,
        kn_bigram_score,
        kn_trigram_score,
        unigram_logprob,
    )

    docs = load_all(spark, sf_dir)["documents"]
    # scorer plan = ONE corpus scan (the scoring explode); fit tables
    # come back as checkpoint RDD scans, not parquet re-scans
    for name, df, max_scans in [
        ("unigram", unigram_logprob(docs), 1),
        ("bigram", bigram_logprob(docs), 1),
        # kn: scoring explode + pair fit + vocab pass (type tables pinned)
        ("kn2", kn_bigram_score(docs), 3),
        # kn3: trigram explode x2 (tri3 fit ran at pin time; the scored
        # side re-explodes) + pairs + vocab
        ("kn3", kn_trigram_score(docs), 4),
        (
            "dsir",
            dsir_sample(
                docs.filter(F.col("doc_id") % 5 != 0),
                docs.filter(F.col("doc_id") % 5 == 0),
                k=10,
            ),
            1,
        ),
    ]:
        import re

        plan = plan_of(df)
        # count the detail-section headers — formatted mode prints each
        # node twice (tree line + "(n) Scan parquet" detail header)
        n = len(re.findall(r"\(\d+\) Scan parquet", plan))
        assert n <= max_scans, (name, n, max_scans)


def test_fat_dim_distance_math_routes_to_arrow(spark, sf_dir, tmp_path_factory):
    """ARROW_AUTO_DIM routing: a dim-768 jl_lsh search's BOUNDED exact
    rerank runs vectorized (ArrowEvalPython in the plan); the dim-64
    index — and the unbounded pre-top-k rank stage at ANY dim — keep
    the JVM expression path. Same results either way (bitwise-identical
    folds, tested in test_vectors)."""
    from storage_spark.sources.annindex import ann_index_search, build_ann_index

    d64 = str(tmp_path_factory.mktemp("annauto") / "idx64")
    vectors = load_all(spark, sf_dir)["embeddings"].select(
        F.col("vec_id").cast("string").alias("key"), "embedding"
    )
    build_ann_index(vectors, d64, kind="lsh", dim=64, n_planes=4, n_tables=2)
    queries = vectors.limit(5).select(
        F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
    )
    plan64 = plan_of(ann_index_search(spark, d64, queries, k=3, probe_radius=1))
    assert "ArrowEvalPython" not in plan64 and "BatchEvalPython" not in plan64

    # dim-768 keys-only lsh: the SIGNATURE computation routes to Arrow
    # (plan-size relief — lsh_signature_arrow), but the pre-top-k
    # distance math stays on the expression path (unbounded candidate
    # volume loses the Python-transfer trade): exactly ONE Arrow node
    fat = vectors.limit(64).select(
        "key",
        F.flatten(F.array_repeat(F.col("embedding"), 12)).alias("embedding"),
    )
    dko = str(tmp_path_factory.mktemp("annauto") / "idxko768")
    build_ann_index(
        fat, dko, kind="lsh", dim=768, n_planes=3, store_vectors=False,
        n_vectors=64,
    )
    fq = fat.limit(3).select(
        F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
    )
    import re

    planko = plan_of(ann_index_search(spark, dko, fq, k=3))
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", planko)) == 1, planko
    assert "BatchEvalPython" not in planko

    # dim-768 jl_lsh: candidate rank runs in the 64-dim projection
    # (expression) but the FULL-dim exact rerank auto-routes to Arrow
    djl = str(tmp_path_factory.mktemp("annauto") / "idxjl768")
    build_ann_index(
        fat, djl, kind="jl_lsh", dim=768, out_dim=32, n_planes=3,
        n_vectors=64, encode_arrow=True,
    )
    planjl = plan_of(ann_index_search(spark, djl, fq, k=3))
    assert "ArrowEvalPython" in planjl, planjl
