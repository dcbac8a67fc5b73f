"""IVF training (stock MLlib KMeans) composes with the constant-literal
assignment plan."""

from pyspark.sql import functions as F

from svoe_spark.operators.similarity import ann_ivf_topk, ivf_assign, ivf_train
from svoe_spark.sources.tables import load_table


def test_ivf_train_assign_roundtrip(spark, sf_small):
    emb = load_table(spark, "embeddings", sf_small)
    cents = ivf_train(emb, k=4, max_iter=5)
    assert len(cents) == 4 and len(cents[0]) == 64
    assigned = ivf_assign(emb, cents)
    ids = {r["cluster_id"] for r in assigned.select("cluster_id").distinct().collect()}
    assert ids <= {0, 1, 2, 3} and len(ids) > 1
    # trained codebook drives the same probe operator
    top = ann_ivf_topk(emb, emb.filter(F.col("vec_id") == 0), cents, k=5)
    rows = top.collect()
    assert len(rows) == 5
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["cosine"] - 1.0) < 1e-9
