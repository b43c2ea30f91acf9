"""CCNet-style line/paragraph dedup (operators.dedup.line_dedup)."""

from __future__ import annotations

import pytest

from storage_spark.operators.dedup import line_dedup


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "Home\nWelcome to my site\nContact us", "en"),
        (2, "Home\nSomething original\nContact us", "en"),
        (3, "HOME\nAnother thing\nPrice: 42 dollars", "en"),
        (4, "Price: 99 dollars\nhome", "en"),
        (5, "", "en"),
        (6, "Home\nHome\nHome", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _by_id(df):
    return {r.doc_id: r for r in df.collect()}


def test_keep_first_keeps_global_first_occurrence(corpus):
    got = _by_id(line_dedup(corpus))
    # doc 1 is globally first for Home/Contact us → intact
    assert got[1].text == "Home\nWelcome to my site\nContact us"
    assert got[1].n_lines_removed == 0
    # doc 2 loses both boilerplate lines, keeps its original one
    assert got[2].text == "Something original"
    assert (got[2].n_lines, got[2].n_lines_kept) == (3, 1)
    # normalization: HOME ≡ Home (lowercase), Price: 99 ≡ Price: 42
    # (digit fold) — later occurrences dropped
    assert got[3].text == "Another thing\nPrice: 42 dollars"
    assert got[4].text == "" and got[4].n_lines_kept == 0
    # within-doc repeats: doc 6's Home x3 are all later than doc 1's
    assert got[6].text == "" and got[6].n_lines_removed == 3
    # empty doc = one empty line, globally unique here → kept
    assert got[5].n_lines_kept == 1


def test_drop_all_removes_every_copy(corpus):
    got = _by_id(line_dedup(corpus, mode="drop_all"))
    assert got[1].text == "Welcome to my site"
    assert got[2].text == "Something original"
    assert got[3].text == "Another thing"
    assert got[4].text == "" and got[4].n_lines_removed == 2
    # within-doc-only duplicates are still duplicates
    assert got[6].text == "" and got[6].n_lines_removed == 3


def test_min_len_exempts_short_lines(corpus):
    got = _by_id(line_dedup(corpus, min_len=5))
    # 'home'/'HOME'/'Home' are 4 chars normalized → exempt, all kept
    assert got[3].text.startswith("HOME\n")
    assert got[4].text == "home"
    assert got[6].text == "Home\nHome\nHome"
    # long lines still dedup: doc 4's Price line lost to doc 3's
    assert "Price" not in got[4].text


def test_no_normalize_is_byte_exact(corpus):
    got = _by_id(line_dedup(corpus, normalize=False))
    # HOME != Home byte-wise → doc 3 keeps its variant
    assert got[3].text.startswith("HOME\n")
    # Price: 42 != Price: 99 → doc 4 keeps its Price line (but loses
    # 'home'? no — 'home' != 'Home' byte-wise, kept too)
    assert got[4].text == "Price: 99 dollars\nhome"


def test_row_count_and_columns_preserved(corpus):
    out = line_dedup(corpus)
    assert out.count() == corpus.count()
    assert set(out.columns) == {
        "doc_id", "lang", "text",
        "n_lines", "n_lines_kept", "n_lines_removed",
    }
    # accounting identity holds on every row
    for r in out.collect():
        assert r.n_lines == r.n_lines_kept + r.n_lines_removed


def test_custom_separator_and_bad_mode(spark):
    df = spark.createDataFrame(
        [(1, "a|b|a"), (2, "b|c")], "doc_id long, text string"
    )
    got = _by_id(line_dedup(df, sep="|"))
    assert got[1].text == "a|b"
    assert got[2].text == "c"
    with pytest.raises(ValueError):
        line_dedup(df, mode="nope")


def test_plan_has_no_window_or_join_on_lines(corpus):
    # the scale contract: winner selection is an aggregation, not a
    # window/self-join — the plan must contain no Window node at all
    plan = line_dedup(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# count-min sketch (operators.analytics) — shares this file's corpus style
# ---------------------------------------------------------------------------


def test_cms_estimate_never_below_exact_and_collides_when_narrow(spark):
    from pyspark.sql import functions as F

    from storage_spark.operators.analytics import (
        cms_lookup,
        cms_sketch,
        heavy_hitters_cms,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * (i % 3 + 1)) for i in range(30)],
        "doc_id long, text string",
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("term"))
    toks = toks.filter(F.col("term") != "")
    exact = {
        r.term: r.c
        for r in toks.groupBy("term").agg(F.count("*").alias("c")).collect()
    }

    # narrow sketch: depth 2, width 2 → collisions guaranteed
    sk = cms_sketch(toks, depth=2, width=2)
    est = {
        r.term: r.cms_est
        for r in cms_lookup(sk, toks, depth=2, width=2).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)      # CMS guarantee
    assert any(est[t] > exact[t] for t in exact)       # width 2 must collide

    # wide sketch: head estimates exact, audit view ranks deterministically
    hh = heavy_hitters_cms(docs, k=3, depth=4, width=1024).collect()
    assert [r.rank for r in hh] == [1, 2, 3]
    assert all(r.cms_est == r.exact_cnt for r in hh)


def test_cms_sketch_is_mergeable_by_cell_sum(spark):
    from pyspark.sql import functions as F

    from storage_spark.operators.analytics import cms_sketch

    docs = spark.createDataFrame(
        [(i, "x y z w v " * (i % 4 + 1)) for i in range(20)],
        "doc_id long, text string",
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("term"))
    whole = {
        (r.row, r.col): r.cnt
        for r in cms_sketch(toks, depth=3, width=16).collect()
    }
    half_a = cms_sketch(
        docs.filter("doc_id < 10").select(
            F.explode(F.split("text", " ")).alias("term")
        ),
        depth=3, width=16,
    )
    half_b = cms_sketch(
        docs.filter("doc_id >= 10").select(
            F.explode(F.split("text", " ")).alias("term")
        ),
        depth=3, width=16,
    )
    merged = {
        (r.row, r.col): r.cnt
        for r in half_a.unionByName(half_b)
        .groupBy("row", "col").agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert merged == whole  # linearity: batch/stream merge is cell-wise sum


def test_cms_rejects_degenerate_geometry(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from storage_spark.operators.analytics import cms_sketch

    toks = spark.createDataFrame([("a",)], "term string")
    with _pytest.raises(ValueError):
        cms_sketch(toks, depth=0, width=16)
    with _pytest.raises(ValueError):
        cms_sketch(toks, depth=2, width=1)


# ---------------------------------------------------------------------------
# incremental line dedup (index = line_stats, probe = one anti-join)
# ---------------------------------------------------------------------------


def _line_corpus(spark, n=14):
    # letters only: _ccnet_normalize folds digits, which would collapse
    # planted variety into one line
    rows = [
        (
            i,
            "\n".join(
                f"w{'abcdefghijk'[(i * 7 + j * 3) % 11]} common{'xy'[j % 2]}"
                for j in range(4)
            ),
            "en",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_incremental_equals_full_when_forward_only(spark):
    from storage_spark.operators.dedup import (
        incremental_line_dedup,
        line_dedup,
        line_stats,
    )

    df = _line_corpus(spark)
    corpus, batch = df.filter("doc_id < 9"), df.filter("doc_id >= 9")
    idx = line_stats(corpus)
    inc, _ = incremental_line_dedup(idx, batch)
    full = line_dedup(df).filter("doc_id >= 9")
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_merge_line_stats_equals_whole_corpus_stats(spark):
    from storage_spark.operators.dedup import (
        incremental_line_dedup,
        line_stats,
        merge_line_stats,
    )

    df = _line_corpus(spark)
    corpus, batch = df.filter("doc_id < 9"), df.filter("doc_id >= 9")
    idx = line_stats(corpus)
    _, bstats = incremental_line_dedup(idx, batch)
    merged = merge_line_stats(idx.unionByName(bstats))
    whole = line_stats(df)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # idempotent: compacting a compacted index is a no-op
    again = merge_line_stats(merged)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_capped_count_saturates_not_doublecounts(spark):
    from storage_spark.operators.dedup import line_stats, merge_line_stats

    a = spark.createDataFrame(
        [(1, "same\nsame\nsame")], "doc_id long, text string"
    )
    b = spark.createDataFrame([(2, "same")], "doc_id long, text string")
    sa, sb = line_stats(a), line_stats(b)
    assert sa.collect()[0].n_occ == 2  # capped, not 3
    m = merge_line_stats(sa.unionByName(sb)).collect()[0]
    assert m.n_occ == 2 and m.first_doc == 1 and m.first_pos == 0


def test_hll_registers_match_reference_python(spark):
    import hashlib

    from pyspark.sql import functions as F

    from storage_spark.operators.analytics import hll_estimate, hll_sketch

    terms = [f"t{i}" for i in range(500)]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {r.bucket: r.rho for r in hll_sketch(df).collect()}

    # independent pure-Python replay of the register derivation
    regs: dict[int, int] = {}
    for t in terms:
        h = hashlib.md5(t.encode()).hexdigest()
        b = int(h[:2], 16)
        v = int(h[2:14], 16)
        rho = 49 if v == 0 else 48 - v.bit_length() + 1
        regs[b] = max(regs.get(b, 0), rho)
    assert got == regs

    est = hll_estimate(hll_sketch(df)).collect()[0]
    # 256 registers → standard error 1.04/16 ≈ 6.5%; allow 3σ
    assert abs(est.est_x1000 / 1000.0 - 500) < 500 * 0.2


def test_hll_merge_is_union(spark):
    from pyspark.sql import functions as F

    from storage_spark.operators.analytics import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    df = spark.range(2000).select(
        F.concat(F.lit("u"), F.col("id")).alias("term")
    )
    whole = hll_estimate(hll_sketch(df)).collect()[0]
    a = hll_sketch(df.filter("id % 2 = 0"))
    b = hll_sketch(df.filter("id % 3 != 1"))  # OVERLAPPING halves
    merged = hll_estimate(hll_merge(a.unionByName(b)))
    # merge of overlapping sketches == sketch of the union of the sets
    union_df = df.filter("id % 2 = 0 OR id % 3 != 1")
    direct = hll_estimate(hll_sketch(union_df)).collect()[0]
    got = merged.collect()[0]
    assert (got.s52, got.est_x1000) == (direct.s52, direct.est_x1000)
    assert got.s52 >= whole.s52 - 0  # subset of full corpus → s52 no smaller


def test_hll_rejects_unaligned_precision(spark):
    import pytest as _pytest

    from storage_spark.operators.analytics import hll_sketch

    df = spark.createDataFrame([("a",)], "term string")
    with _pytest.raises(ValueError):
        hll_sketch(df, precision_bits=6)  # not hex-aligned
    with _pytest.raises(ValueError):
        hll_sketch(df, precision_bits=16)


def test_kmv_sketch_estimate_and_resemblance(spark):
    import hashlib

    from pyspark.sql import functions as F

    from storage_spark.operators.analytics import (
        kmv_estimate,
        kmv_merge,
        kmv_resemblance,
        kmv_sketch,
    )

    a = spark.range(5000).select(
        F.concat(F.lit("x"), F.col("id")).alias("term")
    )
    b = spark.range(2500, 7500).select(
        F.concat(F.lit("x"), F.col("id")).alias("term")
    )
    sa, sb = kmv_sketch(a), kmv_sketch(b)
    ea = kmv_estimate(sa).collect()[0]
    # independent python replay: bottom-256 md5s, integer estimator
    hs = sorted(
        hashlib.md5(f"x{i}".encode()).hexdigest() for i in range(5000)
    )[:256]
    kth = int(hs[-1][:16], 16)
    assert ea.n_hashes == 256
    assert ea.est == (255 * (1 << 64)) // kth
    assert abs(ea.est - 5000) < 5000 * 0.2  # 3σ at k=256

    r = kmv_resemblance(sa, sb).collect()[0]
    assert abs(r.jaccard_x10000 / 10000.0 - 1 / 3) < 0.08
    assert r.jaccard_x10000 == (r.n_both * 10000) // r.n_union_sample

    # merge = sketch of the union, exactly
    merged = sorted(
        x.h for x in kmv_merge(sa.unionByName(sb)).collect()
    )
    direct = sorted(
        x.h for x in kmv_sketch(a.unionByName(b)).collect()
    )
    assert merged == direct

    # below saturation the sketch IS the set
    small = spark.range(100).select(
        F.concat(F.lit("y"), F.col("id")).alias("term")
    )
    es = kmv_estimate(kmv_sketch(small)).collect()[0]
    assert (es.n_hashes, es.est) == (100, 100)


def test_boilerplate_ratio_exact_fractions(spark):
    from storage_spark.operators.dedup import boilerplate_ratio

    rows = [
        (1, "Home\nUnique one\nContact"),
        (2, "Home\nUnique two\nContact"),
        (3, "All original\nNothing shared"),
        (4, "home"),  # normalization: ≡ Home → boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in boilerplate_ratio(df).collect()}
    assert (got[1].n_lines, got[1].n_boilerplate) == (3, 2)
    assert got[1].ratio_x10000 == 6666  # integral DIV, not rounding
    assert got[3].n_boilerplate == 0 and got[3].ratio_x10000 == 0
    assert got[4].ratio_x10000 == 10000
    # within-doc repeats alone are NOT boilerplate (distinct-doc count)
    solo = spark.createDataFrame(
        [(9, "same\nsame\nsame")], "doc_id long, text string"
    )
    r9 = boilerplate_ratio(solo).collect()[0]
    assert r9.n_boilerplate == 0


def test_group_scoped_line_dedup(spark):
    from storage_spark.operators.dedup import line_dedup

    rows = [
        (1, "Home\nBody one", "en"),
        (2, "Home\nBody two", "en"),
        (3, "Home\nBody three", "fr"),  # same line, other group → kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r.text for r in line_dedup(df, group_col="lang").collect()}
    assert got[1] == "Home\nBody one"
    assert got[2] == "Body two"          # en-scoped duplicate
    assert got[3] == "Home\nBody three"  # fr sees its own first Home
    # global mode still collapses across groups
    g = {r.doc_id: r.text for r in line_dedup(df).collect()}
    assert g[3] == "Body three"


def test_qlog_histogram_buckets_and_quantiles_hand_math(spark):
    """Hand-checked qlog buckets + the cumulative quantile walk."""
    import math

    from storage_spark.operators.analytics import (
        histogram_quantiles,
        qlog_histogram,
    )

    def qlog(c):
        bl = c.bit_length()
        return (bl - 1) * 1000 + math.floor((c / (1 << (bl - 1)) - 1) * 1000)

    vals = [1, 2, 3, 4, 8, 100, 1000, 10_000, 0, -5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    hist = qlog_histogram(df, "v", step_milli=125)
    got = {r.bucket: r.cnt for r in hist.collect()}
    want = {}
    for v in vals:
        b = -1 if v <= 0 else qlog(v) // 125
        want[b] = want.get(b, 0) + 1
    assert got == want

    out = {r.q_x1000: r for r in histogram_quantiles(
        hist, [500, 900, 1000], step_milli=125
    ).collect()}
    # n=10; rank(500)=5, rank(900)=9, rank(1000)=10; cumulative over
    # buckets sorted ascending (bucket -1 holds the two non-positives)
    buckets = sorted(want)
    cum, ranks = 0, {}
    for b in buckets:
        lo = cum + 1
        cum += want[b]
        for q, r in ((500, 5), (900, 9), (1000, 10)):
            if q not in ranks and lo <= r <= cum:
                ranks[q] = b
    for q in (500, 900, 1000):
        assert out[q].bucket == ranks[q], q
        m = out[q].bucket * 125
        exp_vlo = 0 if out[q].bucket < 0 else (
            (1 << (m // 1000)) * (1000 + m % 1000) // 1000
        )
        assert out[q].v_lo == exp_vlo
        # the lower bound never exceeds the true discrete quantile
        true_q = sorted(vals)[out[q].rank - 1]
        assert out[q].v_lo <= max(true_q, 0) or out[q].bucket == -1


def test_qlog_histogram_merge_equals_whole(spark):
    from pyspark.sql import functions as F

    from storage_spark.operators.analytics import (
        merge_qlog_histograms,
        qlog_histogram,
    )

    a = spark.range(1, 500).select((F.col("id") * 7 % 5000 + 1).alias("v"))
    b = spark.range(1, 300).select((F.col("id") * 13 % 900 + 1).alias("v"))
    whole = qlog_histogram(a.unionByName(b), "v")
    merged = merge_qlog_histograms(
        qlog_histogram(a, "v"), qlog_histogram(b, "v")
    )
    assert {tuple(r) for r in whole.collect()} == {
        tuple(r) for r in merged.collect()
    }


def test_qlog_quantile_relative_error_bound(spark):
    """The sketch's defining guarantee: v_lo <= true quantile and
    true/v_lo < 2^(2*step/1000) (the value lies in [v_lo, next bucket
    bound); qlog's own <=0.086-bit error folds into one extra step)."""
    from storage_spark.operators.analytics import (
        histogram_quantiles,
        qlog_histogram,
    )

    from pyspark.sql import functions as F

    df = spark.range(1, 20_001).select((F.col("id") % 97_000 + 1).alias("v"))
    vals = sorted(r.v for r in df.collect())
    hist = qlog_histogram(df, "v", step_milli=125)
    for r in histogram_quantiles(hist, [500, 950, 990]).collect():
        true_q = vals[r.rank - 1]
        assert r.v_lo <= true_q
        assert true_q / r.v_lo < 2 ** (2 * 125 / 1000 + 0.086)


def test_qlog_histogram_rejects_bad_params(spark):
    import pytest as _pytest

    from storage_spark.operators.analytics import (
        histogram_quantiles,
        qlog_histogram,
    )

    df = spark.createDataFrame([(1,)], "v long")
    with _pytest.raises(ValueError):
        qlog_histogram(df, "v", step_milli=0)
    with _pytest.raises(ValueError):
        histogram_quantiles(qlog_histogram(df, "v"), [])
    with _pytest.raises(ValueError):
        histogram_quantiles(qlog_histogram(df, "v"), [1001])


def test_qlog_grouped_quantiles_match_per_group_ungrouped(spark):
    """Grouped quantiles ≡ running the ungrouped sketch per group."""
    from pyspark.sql import functions as F

    from storage_spark.operators.analytics import (
        histogram_quantiles,
        qlog_histogram,
    )

    df = spark.range(1, 2001).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") * 17 % 9000 + 1).alias("v"),
    )
    grouped = histogram_quantiles(
        qlog_histogram(df, "v", group_cols=["grp"]),
        [500, 900], group_cols=["grp"],
    )
    got = {(r.grp, r.q_x1000): (r.rank, r.bucket, r.v_lo)
           for r in grouped.collect()}
    for grp in ("0", "1", "2"):
        solo = histogram_quantiles(
            qlog_histogram(df.filter(F.col("grp") == grp), "v"),
            [500, 900],
        )
        for r in solo.collect():
            assert got[(grp, r.q_x1000)] == (r.rank, r.bucket, r.v_lo), grp
