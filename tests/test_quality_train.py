"""Training the fastText-shaped quality classifier end-to-end
(text_analysis.train_quality_classifier): the SparkML logistic fit
over the scorer's exact feature algebra must beat the stand-in
default weights on a held-out split, and the frozen quantized
artifact must reproduce from the fixture."""

from pyspark.sql import functions as F

from svoe_spark.operators.text_analysis import (
    default_classifier_weights,
    quality_classifier,
    quantize_weights,
    train_quality_classifier,
)
from svoe_spark.sources.tables import load_table


def _labeled(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).withColumn(
        "label", (~F.col("text").contains("dup")).cast("int")
    )


def _auc(scored, labels):
    rows = sorted((r["logit"], labels[r["doc_id"]]) for r in scored.collect())
    pos = sum(1 for _, lb in rows if lb == 1)
    neg = len(rows) - pos
    rank_sum = sum(i for i, (_, lb) in enumerate(rows, 1) if lb == 1)
    return (rank_sum - pos * (pos + 1) / 2) / (pos * neg)


def test_trained_classifier_beats_default(spark, sf_small):
    labeled = _labeled(spark, sf_small)
    train = labeled.where(F.abs(F.hash("doc_id")) % 5 != 0)
    test = labeled.where(F.abs(F.hash("doc_id")) % 5 == 0)
    w, b = train_quality_classifier(train, "label")
    wq, bq = quantize_weights(w, b)
    labels = {r["doc_id"]: r["label"] for r in test.collect()}
    assert 0 < sum(labels.values()) < len(labels)  # both classes held out
    auc_tr = _auc(quality_classifier(test, weights=wq, bias=bq), labels)
    auc_df = _auc(
        quality_classifier(test, weights=default_classifier_weights()), labels
    )
    assert auc_tr > auc_df + 0.3, (auc_tr, auc_df)
    assert auc_tr > 0.95, auc_tr


def test_frozen_trained_artifact_reproduces_from_fixture(spark):
    """Grid-scale tolerance, not exact equality: the L2-regularized
    optimum is unique, but gradient float-summation order can move a
    weight across one 2^-20 quantization boundary on a different
    machine/layout (docstring note in train_quality_classifier)."""
    from svoe_spark.queries_llm import QC_TRAINED_BIAS, QC_TRAINED_WEIGHTS

    labeled = _labeled(spark, "/root/testdata/sf0.001")
    w, b = train_quality_classifier(labeled, "label")
    wq, bq = quantize_weights(w, b)
    tol = 2**-18
    assert len(wq) == len(QC_TRAINED_WEIGHTS)
    assert all(
        abs(a - c) <= tol for a, c in zip(wq, QC_TRAINED_WEIGHTS)
    ), max(abs(a - c) for a, c in zip(wq, QC_TRAINED_WEIGHTS))
    assert abs(bq - QC_TRAINED_BIAS) <= tol
    # and the sign structure (which buckets matter) is identical
    assert [a > 0 for a in wq] == [c > 0 for c in QC_TRAINED_WEIGHTS]


def test_corpus_filter_trained_gate_improves_separation(spark, sf_small):
    """VERDICT r5 ask 5: with the frozen TRAINED weights composed into
    corpus_filter, the gate's keep decision separates the planted
    quality label strictly better than the stand-in default weights —
    and the logit it emits is bit-identical to quality_classifier's."""
    from svoe_spark.operators.cleaning import corpus_filter
    from svoe_spark.queries_llm import QC_TRAINED_BIAS, QC_TRAINED_WEIGHTS

    labeled = _labeled(spark, sf_small)
    labels = {r["doc_id"]: r["label"] for r in labeled.collect()}

    def separation(weights, bias):
        # loose heuristic thresholds so the model gate decides
        out = corpus_filter(
            labeled, min_tokens=1, min_distinct_ratio=0.0,
            max_top_word_ratio=1.0, max_dup_2gram_ratio=1.0,
            classifier_weights=weights, classifier_bias=bias,
        ).collect()
        good = [r for r in out if labels[r["doc_id"]] == 1]
        bad = [r for r in out if labels[r["doc_id"]] == 0]
        keep_rate = lambda rows: sum(r["keep"] for r in rows) / len(rows)
        return keep_rate(good) - keep_rate(bad)

    sep_tr = separation(QC_TRAINED_WEIGHTS, QC_TRAINED_BIAS)
    sep_df = separation(default_classifier_weights(), 0.0)
    assert sep_tr > sep_df + 0.3, (sep_tr, sep_df)
    assert sep_tr > 0.5, sep_tr

    # logit parity with the standalone scorer (same fold, same tree)
    cf = corpus_filter(
        labeled, classifier_weights=QC_TRAINED_WEIGHTS,
        classifier_bias=QC_TRAINED_BIAS,
    ).select("doc_id", "logit")
    qc = quality_classifier(
        labeled, weights=QC_TRAINED_WEIGHTS, bias=QC_TRAINED_BIAS
    ).select("doc_id", "logit")
    a = {r["doc_id"]: r["logit"] for r in cf.collect()}
    b = {r["doc_id"]: r["logit"] for r in qc.collect()}
    assert a == b


def test_quantize_weights_dyadic_and_close():
    w = [0.1234567, -3.987654]
    wq, bq = quantize_weights(w, 2.5)
    for orig, q in zip(w, wq):
        assert abs(orig - q) < 2**-20
        assert q * (1 << 20) == round(q * (1 << 20))  # exactly dyadic
    assert bq == 2.5
