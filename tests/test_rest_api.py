"""REST control plane (§2.12): queries, FD upload (X5), featurizer runs
over HTTP against the shared SparkSession."""

import json
import urllib.request

import pytest

from svoe_spark.api.rest import serve


@pytest.fixture(scope="module")
def server(spark):
    srv = serve(spark, host="127.0.0.1", port=0)  # ephemeral port
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_health_and_listings(server):
    h = _get(f"{server}/health")
    assert h["error"] is None and h["result"]["status"] == "ok"

    qs = _get(f"{server}/queries")["result"]
    assert "q1_pricing_summary" in qs and qs["q1_pricing_summary"]["has_oracle"]
    # round 8 closed the rows-only class: EVERY registered query now
    # carries a DuckDB oracle (the former trio — approx_distinct_daily,
    # backtest_param_grid, ann_ivf_trained — included)
    assert "approx_distinct_daily" in qs
    missing = [n for n, q in qs.items() if not q["has_oracle"]]
    assert missing == []

    fds = _get(f"{server}/feature_definitions")["result"]
    assert "mid_price" in fds and "volatility_stddev" in fds


def test_run_query(server, sf_small):
    out = _post(
        f"{server}/query/revenue_by_nation", {"sf_dir": sf_small, "limit": 5}
    )
    assert out["error"] is None
    assert len(out["result"]) == 5
    assert {"n_name", "revenue"} <= set(out["result"][0])

    bad = _post(f"{server}/query/nope", {"sf_dir": sf_small})
    assert bad["error"] and "unknown query" in bad["error"]


def test_upload_feature_definition_and_run(server, sf_small):
    src = (
        "from pyspark.sql import functions as F\n"
        "from svoe_spark.plans.definitions import FeatureDefinition\n"
        "class ApiMid(FeatureDefinition):\n"
        "    name = 'api_mid'\n"
        "    @classmethod\n"
        "    def transform(cls, upstreams, params, keys):\n"
        "        df = upstreams['source']\n"
        "        return df.select(*keys, 'ts', F.col('value').alias('api_mid'))\n"
    )
    up = _post(f"{server}/feature_definition/", {"source": src})
    assert up["error"] is None and up["result"] == ["api_mid"]

    run = _post(
        f"{server}/run_featurizer",
        {
            "config": {
                "data_source": {"kind": "table", "table": "events",
                                "sf_dir": sf_small,
                                "select": ["ts", "event_type", "value"]},
                "keys": ["event_type"],
                "features": [{"name": "m", "feature_definition": "api_mid"}],
                "label_feature": "m",
            },
            "limit": 3,
        },
    )
    assert run["error"] is None
    assert len(run["result"]) == 3
    assert "m-api_mid" in run["result"][0]
