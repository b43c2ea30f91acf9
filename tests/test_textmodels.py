"""Persisted text models must score IDENTICALLY to an inline refit — the
save/load layer adds no math (the annindex equality discipline)."""

from __future__ import annotations

import pytest

from storage_spark.operators.pipeline import (
    bigram_logprob,
    bigram_model,
    classifier_score,
    dsir_model,
    dsir_sample,
    dsir_weights,
    nb_quality_model,
    unigram_logprob,
    unigram_model,
)
from storage_spark.sources.textmodels import (
    MODEL_COLUMNS,
    load_text_model,
    save_text_model,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the slow green turtle walks under the busy bridge"),
    (3, "quick brown dog and lazy fox share the bridge"),
    (4, "colorless green ideas sleep furiously tonight again"),
    (5, "the the the of of and and to be or not"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_unigram_roundtrip_scores_equal(spark, docs, tmp_path):
    m = unigram_model(docs)
    save_text_model(m, str(tmp_path / "uni"), "unigram", {"smoothing": 1.0})
    loaded, cfg = load_text_model(spark, str(tmp_path / "uni"))
    assert cfg["kind"] == "unigram" and cfg["n_rows"] == m.count()
    assert _rows(unigram_logprob(docs, loaded)) == _rows(unigram_logprob(docs, m))


def test_bigram_roundtrip_scores_equal(spark, docs, tmp_path):
    bi, uni = bigram_model(docs), unigram_model(docs)
    save_text_model(bi, str(tmp_path / "bi"), "bigram")
    save_text_model(uni, str(tmp_path / "uni"), "unigram")
    lbi, _ = load_text_model(spark, str(tmp_path / "bi"))
    luni, _ = load_text_model(spark, str(tmp_path / "uni"))
    assert _rows(bigram_logprob(docs, lbi, luni)) == _rows(
        bigram_logprob(docs, bi, uni)
    )


def test_nb_roundtrip_scores_equal(spark, docs, tmp_path):
    pos = docs.filter("doc_id <= 3")
    neg = docs.filter("doc_id > 3")
    m = nb_quality_model(pos, neg)
    save_text_model(m, str(tmp_path / "nb"), "nb")
    loaded, _ = load_text_model(spark, str(tmp_path / "nb"))
    assert _rows(classifier_score(docs, loaded)) == _rows(classifier_score(docs, m))


def test_dsir_roundtrip_scores_and_selection_equal(spark, docs, tmp_path):
    raw = docs.filter("doc_id <= 3")
    target = docs.filter("doc_id > 3")
    params = {"num_buckets": 64, "use_bigrams": True}
    m = dsir_model(raw, target, num_buckets=64)
    cfg = save_text_model(m, str(tmp_path / "dsir"), "dsir", params)
    assert cfg["params"] == params
    loaded, lcfg = load_text_model(spark, str(tmp_path / "dsir"))
    nb = lcfg["params"]["num_buckets"]
    assert _rows(dsir_weights(raw, model=loaded, num_buckets=nb)) == _rows(
        dsir_weights(raw, target, num_buckets=64)
    )
    assert _rows(
        dsir_sample(raw, None, k=2, num_buckets=nb, model=loaded)
    ) == _rows(dsir_sample(raw, target, k=2, num_buckets=64))


def test_dsir_weights_requires_target_or_model(spark, docs):
    with pytest.raises(ValueError, match="target= or model="):
        dsir_weights(docs)


def test_save_rejects_wrong_columns(spark, docs, tmp_path):
    m = unigram_model(docs).withColumnRenamed("cnt", "n")
    with pytest.raises(ValueError, match="exactly columns"):
        save_text_model(m, str(tmp_path / "bad"), "unigram")
    with pytest.raises(ValueError, match="unknown model kind"):
        save_text_model(unigram_model(docs), str(tmp_path / "bad"), "trigram")


def test_load_rejects_corrupt_schema(spark, docs, tmp_path):
    p = str(tmp_path / "uni")
    save_text_model(unigram_model(docs), p, "unigram")
    # overwrite the parquet with a wrong-shaped table, keep the config
    docs.select("doc_id").write.mode("overwrite").parquet(p + "/model")
    with pytest.raises(ValueError, match="contract"):
        load_text_model(spark, p)


def test_overwrite_replaces_model(spark, docs, tmp_path):
    p = str(tmp_path / "uni")
    save_text_model(unigram_model(docs.filter("doc_id = 1")), p, "unigram")
    cfg = save_text_model(unigram_model(docs), p, "unigram")
    loaded, _ = load_text_model(spark, p)
    assert loaded.count() == cfg["n_rows"] > 8


def test_subword_vocab_roundtrip_counts_equal(spark, docs, tmp_path):
    from storage_spark.functions.bpe import bpe_tokenize, build_subword_vocab

    v = build_subword_vocab(docs, max_size=20)
    save_text_model(v, str(tmp_path / "sw"), "subword",
                    {"max_size": 20, "max_len": 4})
    loaded, cfg = load_text_model(spark, str(tmp_path / "sw"))
    assert cfg["params"]["max_len"] == 4
    assert _rows(bpe_tokenize(docs, loaded)) == _rows(bpe_tokenize(docs, v))


def test_all_kinds_have_column_contracts():
    assert set(MODEL_COLUMNS) == {
        "unigram", "bigram", "nb", "dsir", "subword", "merges", "unipiece",
        "langid",
    }


def test_langid_roundtrip_predictions_equal(spark, tmp_path):
    from storage_spark.operators.langid import langid_fit, langid_predict
    from storage_spark.sources.textmodels import (
        load_text_model,
        save_text_model,
    )

    train = spark.createDataFrame(
        [("en", "the house and the water"), ("de", "das haus und das wasser")],
        "lang string, text string",
    )
    probe = spark.createDataFrame(
        [(1, "the water"), (2, "das wasser")], "doc_id long, text string"
    )
    m = langid_fit(train)
    path = str(tmp_path / "langid")
    save_text_model(m, path, "langid", params={"n": 3})
    loaded, cfg = load_text_model(spark, path)
    assert cfg["kind"] == "langid" and cfg["params"]["n"] == 3
    assert _rows(langid_predict(probe, loaded)) == _rows(
        langid_predict(probe, m)
    )


def test_unipiece_roundtrip_segmentation_equal(spark, docs, tmp_path):
    from storage_spark.functions.bpe import unigram_tokenize, unigram_vocab
    from storage_spark.sources.textmodels import (
        load_text_model,
        save_text_model,
    )

    v = unigram_vocab(docs, max_size=100, max_len=4)
    path = str(tmp_path / "unipiece")
    save_text_model(v, path, "unipiece", params={"max_len": 4})
    loaded, cfg = load_text_model(spark, path)
    assert cfg["kind"] == "unipiece" and cfg["params"]["max_len"] == 4
    assert _rows(unigram_tokenize(docs, loaded)) == _rows(
        unigram_tokenize(docs, v)
    )
