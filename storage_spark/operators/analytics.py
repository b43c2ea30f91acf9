"""General OLAP analytics over the TPC-H-shaped base tables.

The engine's §2 surface is storage-domain; these operators prove the
same Spark-first machinery runs classic warehouse shapes (multi-way
dimension joins + grouped rollups — TPC-H Q3/Q5 patterns) with the
plans you'd want at 100 TB:

- dimension tables (region/nation/customer/supplier) broadcast; the only
  shuffles touch fact-table keys (orders → lineitem join, final groupBy);
- revenue carried as INTEGER CENTS: ``round(price·(1−discount)·100)``
  is computed per row (both engines execute the identical IEEE double
  product before the round) and summed as longs — distributed float
  summation would be partition-order-dependent and can't hash-match an
  oracle, integer sums can;
- date predicates push into the parquet scan before any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _revenue_cents() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")


def unshipped_order_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k orders by open revenue — ordered before the
    cutoff, with lines still shipping after it, for one market segment.
    customer (filtered, tiny) broadcasts into orders; the only real
    shuffle is lineitem→orders and the per-order aggregation."""
    cut = F.to_timestamp(F.lit(cutoff))
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    lines = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", _revenue_cents().alias("_rev")
    )
    return (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(lines, ords.o_orderkey == lines.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("_rev").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def regional_nation_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue where the supplier and the
    customer share the nation, for one region and one order-date year.
    All four dimension inputs collapse to broadcasts; the fact-side plan
    is orders⋈lineitem (one key shuffle) then the tiny nation groupBy."""
    lo, hi = F.to_timestamp(F.lit(date_from)), F.to_timestamp(F.lit(date_to))
    nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nations), customer.c_nationkey == nations.n_nationkey
    ).select("c_custkey", F.col("n_nationkey").alias("_c_nat"), "n_name")
    supp = supplier.select("s_suppkey", F.col("s_nationkey").alias("_s_nat"))
    ords = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey")
    lines = lineitem.select(
        "l_orderkey", "l_suppkey", _revenue_cents().alias("_rev")
    )
    return (
        lines.join(ords, lines.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), lines.l_suppkey == supp.s_suppkey)
        .filter(F.col("_c_nat") == F.col("_s_nat"))
        .groupBy("n_name")
        .agg(F.sum("_rev").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("n_name").asc())
    )


def pricing_summary(
    lineitem: DataFrame,
    ship_before: str = "1998-12-01",
) -> DataFrame:
    """TPC-H Q1 shape: the one-scan grouped pricing rollup. Every
    aggregate is map-side partial over integer-exact inputs (quantities
    are integral doubles → longs; money in rounded cents; charge =
    price·(1−disc)·(1+tax) rounded per row). Averages are left to the
    consumer (sums + count) — a distributed float mean is
    partition-order-dependent, sums and counts are not."""
    cut = F.to_timestamp(F.lit(ship_before))
    charge = F.round(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
        * 100
    ).cast("long")
    return (
        lineitem.filter(F.col("l_shipdate") <= cut)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_cents"
            ),
            F.sum(_revenue_cents()).alias("sum_disc_cents"),
            F.sum(charge).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def orders_above_customer_average(orders: DataFrame) -> DataFrame:
    """Decorrelated "above my customer's average" filter — the classic
    correlated subquery (``o_totalprice > (SELECT avg(...) WHERE same
    customer)``) rewritten as one aggregate + a join back, with the
    comparison cross-multiplied into integers: keep order iff
    ``price_cents · n > sum_cents`` — no division, no float average, so
    the cut is engine-exact even for customers whose average lands
    exactly on an order's price. Two shuffles total (per-customer agg,
    join back on the customer key); the agg side is one row per
    customer, broadcastable when the customer dimension fits."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = (
        orders.select("o_custkey", cents.alias("_c"))
        .groupBy("o_custkey")
        .agg(F.sum("_c").alias("_sum"), F.count(F.lit(1)).alias("_n"))
    )
    return (
        orders.withColumn("_c", cents)
        .join(per_cust, "o_custkey")
        .filter(F.col("_c") * F.col("_n") > F.col("_sum"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("_c").alias("totalprice_cents"),
            F.col("_n").alias("n_orders"),
        )
    )


def cms_sketch(
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over a term
    column, as a ``(row, col, cnt)`` cell table of at most depth×width
    rows. Hashes are the engine-portable md5 idiom
    (``conv(substr(md5(row ':' term), 1, 6), 16, 10) % width`` — the
    same construction every sampler/DSIR oracle replays digit-by-digit
    in SQL), so the sketch is DETERMINISTIC: any engine building it
    from the same terms produces identical cells.

    100 TB story: ONE map-side-combined groupBy on (row, col) — the
    Zipf head collapses in the combiner exactly like a word count; the
    result is bounded by the sketch geometry (not the corpus), always
    broadcastable, and mergeable across batches/streams by cell-wise
    sum (linearity of the sketch — the incremental/streaming story is
    free by construction)."""
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    w = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    rows = terms.select(
        F.col(term_col).alias("_t"), w.alias("_w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    col = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row").cast("string"), F.lit(":"),
                               F.col("_t"))),
                1, 6,
            ),
            16, 10,
        ).cast("bigint") % width
    )
    return (
        rows.withColumn("col", col)
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch: ``est(t) = min_i cnt[i, h_i(t)]`` with
    absent cells read as 0. The classic CMS guarantee holds exactly:
    est ≥ true count, with overestimates only from hash collisions.
    The probe side is terms×depth rows joined on the (row, col) cell —
    the sketch is bounded, so Spark broadcasts it."""
    probes = terms.select(F.col(term_col).alias("term")).distinct().select(
        "term",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    col = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row").cast("string"), F.lit(":"),
                               F.col("term"))),
                1, 6,
            ),
            16, 10,
        ).cast("bigint") % width
    )
    probes = probes.withColumn("col", col)
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def heavy_hitters_cms(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Heavy hitters with a sketch audit: exact top-k tokens (count
    desc, token asc — deterministic ties) side by side with their CMS
    estimates from a sketch of the WHOLE token stream. The production
    shape at 100 TB keeps only the bounded sketch; this operator
    returns the audit view that quantifies its overestimate on the
    head, where CMS is at its best."""
    from pyspark.sql.window import Window

    from storage_spark.functions.partitioning import spread_small_input

    toks = spread_small_input(docs).select(
        F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # Take the top k FIRST (lowers to TakeOrderedAndProject — per-partition
    # heaps + a k-row driver merge, never a global sort), then rank the
    # k-row frame. The single-partition row_number window is bounded at k
    # rows; ranking the full vocabulary through one window task was the
    # r11 verdict's one scale-killer (10^8-10^9 rows through one task at
    # corpus scale).
    top = (
        exact.orderBy(F.col("exact_cnt").desc(), F.col("term"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("exact_cnt").desc(), F.col("term"))
            ),
        )
    )
    sketch = cms_sketch(toks, "term", depth, width)
    est = cms_lookup(sketch, top.select("term"), "term", depth, width)
    return (
        top.join(est, "term")
        .select("rank", "term", "exact_cnt", F.col("cms_est").cast("long"))
        .orderBy("rank")
    )


def hll_sketch(
    terms: DataFrame,
    term_col: str = "term",
    precision_bits: int = 8,
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) over a term
    column: ``(bucket, rho)`` with one row per non-empty bucket, rho =
    the max first-one position of the 48-bit md5 remainder. Fully
    DETERMINISTIC (md5, not a salted hash) so any engine derives
    identical registers — the driver oracle replays bucket and rho
    (via length(bin(v))) digit-for-digit.

    100 TB story: one map-side-combined groupBy(bucket).max(rho) —
    2^precision_bits rows regardless of corpus; merging two sketches
    is register-wise MAX (union + the same groupBy), so the
    incremental/streaming story is free, same as the CMS's linearity."""
    if not (4 <= precision_bits <= 12):
        raise ValueError("precision_bits must be in [4, 12]")
    hex_digits = precision_bits // 4 + (1 if precision_bits % 4 else 0)
    if precision_bits % 4:
        raise ValueError("precision_bits must be a multiple of 4 "
                         "(hex-aligned buckets keep the oracle exact)")
    h = F.md5(F.col(term_col))
    bucket = F.conv(F.substring(h, 1, hex_digits), 16, 10).cast("bigint")
    v = F.conv(
        F.substring(h, hex_digits + 1, 12), 16, 10
    ).cast("bigint")  # 48-bit remainder
    rho = F.when(v == 0, F.lit(49)).otherwise(
        F.lit(48) - F.length(F.bin(v)) + 1
    ).cast("int")
    from storage_spark.functions.partitioning import spread_small_input

    return (
        spread_small_input(terms).select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(sketches: DataFrame) -> DataFrame:
    """Register-wise max over appended sketch rows — the union of the
    underlying sets, exactly (HLL's defining merge property)."""
    return sketches.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame,
    precision_bits: int = 8,
) -> DataFrame:
    """One-row cardinality estimate: ``(n_buckets_hit, s52, est_x1000)``
    where ``s52 = Σ_j 2^(52-M_j)`` over ALL m buckets (absent → M=0) is
    an EXACT integer (every addend a power of two ≤ 2^52, total ≤ 2^60)
    and ``est_x1000 = floor(α_m · m² · 2^52 / s52 · 1000)`` uses only
    IEEE multiply/divide — no transcendentals — so both engines compute
    the identical double and the floor is hash-stable. This is the raw
    HLL estimator (no small/large-range corrections: those need ln(),
    which is libm-dependent across engines; callers wanting corrected
    small-range counts should read n_buckets_hit and linear-count
    driver-side)."""
    m = 1 << precision_bits
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_buckets_hit"),
        F.sum(F.pow(F.lit(2.0), F.lit(52) - F.col("rho")).cast("bigint"))
        .alias("_s_hit"),
    )
    s52 = (
        F.col("_s_hit")
        + (F.lit(m) - F.col("n_buckets_hit")) * F.lit(1 << 52).cast("bigint")
    )
    est = (
        F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(1 << 52))
        / s52.cast("double")
    )
    return agg.select(
        F.col("n_buckets_hit").cast("int").alias("n_buckets_hit"),
        s52.cast("bigint").alias("s52"),
        F.floor(est * 1000).cast("bigint").alias("est_x1000"),
    )


def kmv_sketch(
    terms: DataFrame,
    term_col: str = "term",
    k: int = 256,
) -> DataFrame:
    """K-minimum-values (bottom-k) sketch (Bar-Yossef et al. 2002): the
    k smallest md5 hashes of the DISTINCT terms. Fully deterministic —
    unlike HLL's register estimate this sketch IS a set of concrete
    hashes, so any engine derives the identical table, and unlike HLL
    it supports INTERSECTION estimates (resemblance/Jaccard — the
    sketch-level analogue of the dedup family's shingle resemblance).

    100 TB story: distinct + TakeOrdered(k) — one shuffle bounded by k
    output rows; merging sketches = union → re-take bottom k."""
    if k < 2:
        raise ValueError("k must be >= 2")
    # pinned (<= k rows): a sketch is built to be probed several times
    # (estimate + merge + resemblance each reference it), and every
    # unpinned reference replayed the corpus-wide distinct+TakeOrdered —
    # q_kmv_resemblance's plan carried 12 corpus scans before this
    # (r12 sweep; the _pin_model rationale). NOTE the eager-evaluation
    # contract: constructing a sketch runs the bottom-k job NOW (ADVICE
    # r12); wrap in materialize_scope to release the pinned rows.
    from storage_spark.operators.dedup import pin_bounded

    return pin_bounded(
        terms.select(F.md5(F.col(term_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(int(k))
    )


def kmv_merge(sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union of KMV sketches = bottom k of the union of their hash
    sets — exactly the sketch of the underlying set union."""
    return sketches.select("h").distinct().orderBy("h").limit(int(k))


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate ``(n_hashes, kth_hex16, est)``: when the
    sketch saturates (n = k), est = floor((k-1) * 2^64 / kth-hash-value)
    using the first 16 hex digits — INTEGER arithmetic end to end (the
    2002 unbiased bottom-k estimator); below saturation the sketch is
    the exact distinct set and est = n. Engine-identical by
    construction: no float appears anywhere."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max(F.substring("h", 1, 16)).alias("kth_hex16"),
    )
    kth = F.conv(F.col("kth_hex16"), 16, 10).cast("decimal(38,0)")
    num = F.lit(str((k - 1) * 2 ** 64)).cast("decimal(38,0)")
    # exact integer floor-division: subtract the decimal remainder first
    # so the decimal divide is of an exact multiple (no scale rounding
    # can cross an integer boundary — the oracle's // must agree)
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("decimal(38,0)")
    ).otherwise((num - num % kth) / kth)
    return agg.select(
        F.col("n_hashes").cast("int"),
        "kth_hex16",
        est.cast("bigint").alias("est"),
    )


def kmv_resemblance(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 256,
) -> DataFrame:
    """Jaccard resemblance estimate between two KMV sketches: the
    fraction of the bottom-k of the UNION that lands in both sketches
    (Broder's minwise argument, the same one MinHash banding relies
    on). Output ``(n_union_sample, n_both, jaccard_x10000)`` — integer
    scaled, no float."""
    u = kmv_merge(sketch_a.unionByName(sketch_b), k)
    both = sketch_a.join(sketch_b, "h", "inner").select("h")
    hits = u.join(both, "h", "left_semi")
    return (
        u.agg(F.count(F.lit(1)).alias("n_union_sample"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_both")))
        .select(
            F.col("n_union_sample").cast("int"),
            F.col("n_both").cast("int"),
            # integral DIV, not double divide + cast: Spark's double→long
            # cast truncates while DuckDB's ROUNDS — div sidesteps the
            # whole mismatch class
            F.expr("CAST((n_both * 10000) DIV n_union_sample AS BIGINT)")
            .alias("jaccard_x10000"),
        )
    )


def qlog_histogram(
    df: DataFrame,
    value_col: str,
    step_milli: int = 125,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile sketch — the RANK member of the sketch family (CMS =
    frequency, HLL = cardinality, KMV = resemblance): a log-bucketed
    histogram in the DDSketch shape (Masson et al., VLDB 2019) built on
    the repo's qlog2-milli idiom instead of log_gamma, so every bucket
    boundary is integer/IEEE-exact and a SQL oracle replays the sketch
    digit-for-digit. Bucket = qlog2_milli(v) // step_milli for v ≥ 1
    (bucket −1 collects v ≤ 0); at the default 125 milli-bits the
    relative error bound is 2^0.125 − 1 ≈ 9%.

    Output ``(bucket, cnt)`` — or ``(*group_cols, bucket, cnt)`` with
    ``group_cols`` (per-language/per-source length distributions, the
    corpus-stats shape). 100 TB story: ONE map-side-combined groupBy
    into ≤ 64·1000/step ≈ 512 buckets per group regardless of corpus
    size; merge = cell-wise sum (``merge_qlog_histograms``), so the
    incremental/streaming story is linearity, free by construction —
    same as the CMS."""
    from storage_spark.functions.bpe import _qlog2_milli

    if not (1 <= step_milli <= 1000):
        raise ValueError("step_milli must be in [1, 1000]")
    v = F.col(value_col).cast("bigint")
    bucket = F.when(v <= 0, F.lit(-1)).otherwise(
        F.floor(_qlog2_milli(v) / step_milli).cast("bigint")
    )
    g = list(group_cols or [])
    return (
        df.select(*g, bucket.alias("bucket"))
        .groupBy(*g, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_qlog_histograms(*hists: DataFrame) -> DataFrame:
    """Cell-wise sum — merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B)
    exactly (counts are linear). Grouped histograms merge the same way
    (every non-cnt column is part of the cell key)."""
    if not hists:
        raise ValueError("need at least one histogram")
    u = hists[0]
    for h in hists[1:]:
        u = u.unionByName(h)
    keys = [c for c in u.columns if c != "cnt"]
    return u.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame,
    qs_x1000: list[int],
    step_milli: int = 125,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a qlog histogram: for each q (scaled
    ×1000), the smallest bucket whose cumulative count reaches rank
    ``ceil(q·n/1000)`` and that bucket's integer LOWER-BOUND value
    ``v_lo = 2^bl·(1000+frac)//1000`` (bl = milli-log // 1000, frac =
    remainder) — pure integer arithmetic both engines floor
    identically. Output ``(q_x1000, rank, bucket, v_lo)`` — prefixed
    by ``group_cols`` when given (quantiles computed independently
    per group).

    The cumulative walk runs over the BUCKET TABLE (≤ ~512 rows at any
    corpus size — geometry-bounded, like the HLL register scan), so
    the single-partition window and the tiny inequality join are
    constant-size regardless of input rows."""
    from pyspark.sql.window import Window

    if not qs_x1000 or not all(1 <= q <= 1000 for q in qs_x1000):
        raise ValueError("quantiles must be integer permille in [1, 1000]")
    g = list(group_cols or [])
    spark = hist.sparkSession
    # materialize the (geometry-bounded, ≤512×groups rows) histogram
    # once: the walk reads it three times (cumulative window, totals,
    # the range join), and without this each read re-runs the BASE
    # SCAN behind the histogram — measured 17 s → ~1 s at sf1 on a
    # doc-length sketch (tools/probe_r10_sf1.py); scope-releasable (r13)
    from storage_spark.operators.dedup import pin_bounded

    hist = pin_bounded(hist)
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy(*g).orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    n = hist.groupBy(*g).agg(F.sum("cnt").alias("n")) if g else (
        hist.agg(F.sum("cnt").alias("n"))
    )
    qdf = spark.createDataFrame(
        [(int(q),) for q in sorted(set(qs_x1000))], "q_x1000 bigint"
    )
    # integral DIV, not double divide + cast (the kmv lesson: Spark's
    # double→long cast truncates, DuckDB's rounds)
    ranks = qdf.crossJoin(F.broadcast(n)).select(
        *g, "q_x1000",
        F.expr("CAST((q_x1000 * n + 999) DIV 1000 AS BIGINT)").alias("rank"),
    )
    cond = F.col("cum") >= F.col("rank")
    if g:
        # equi component on RENAMED group keys + the range condition
        # (both frames descend from `hist`, so same-name column refs
        # would resolve trivially-true — the classic self-join trap)
        cum2 = cum.select(
            *[F.col(c).alias(f"_g_{c}") for c in g], "bucket", "cum"
        )
        join_on = [F.col(f"_g_{c}") == F.col(c) for c in g] + [cond]
        hit = (
            ranks.join(F.broadcast(cum2), join_on, "inner")
            .groupBy(*g, "q_x1000", "rank")
            .agg(F.min("bucket").alias("bucket"))
        )
    else:
        hit = (
            ranks.join(F.broadcast(cum), cond, "inner")
            .groupBy("q_x1000", "rank")
            .agg(F.min("bucket").alias("bucket"))
        )
    # v_lo = 2^bl · (1000 + frac) // 1000 with bl = m // 1000,
    # frac = m % 1000, m = bucket·step — all integral DIV/%
    withm = hit.withColumn("_m", F.col("bucket") * F.lit(step_milli))
    v_lo = F.when(F.col("bucket") < 0, F.lit(0).cast("bigint")).otherwise(
        F.expr(
            "CAST((shiftleft(CAST(1 AS BIGINT), CAST(_m DIV 1000 AS INT))"
            " * (1000 + _m % 1000)) DIV 1000 AS BIGINT)"
        )
    )
    return withm.select(
        *g, "q_x1000", "rank", "bucket", v_lo.alias("v_lo")
    ).orderBy(*g, "q_x1000")
