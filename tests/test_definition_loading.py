"""X5: user FeatureDefinition code loaded from a file / source string
registers into the registry and runs through the Featurizer end to end
(reference DefinitionsLoader, featurizer_utils/definitions_loader.py —
the import-and-register half; the fetch is storage-specific)."""

import textwrap

from svoe_spark.plans.definitions import (
    REGISTRY,
    load_definitions_from_source,
)
from svoe_spark.plans.featurizer import Featurizer

USER_FD = textwrap.dedent(
    """
    from pyspark.sql import functions as F

    from svoe_spark.plans.definitions import FeatureDefinition


    class DoubledMid(FeatureDefinition):
        name = "doubled_mid"
        dep_slots = ("upstream",)

        @classmethod
        def transform(cls, upstreams, params, keys):
            df = upstreams["upstream"]
            src = params.get("value_col", "mid_price")
            return df.select(
                *keys, "ts", (F.col(src) * 2).alias("doubled")
            )
    """
)


def test_load_from_file_and_run(spark, sf_small, tmp_path):
    p = tmp_path / "user_fd.py"
    p.write_text(USER_FD)
    cfg = {
        "data_source": {"kind": "table", "table": "events", "sf_dir": sf_small,
                        "select": ["ts", "event_type", "value"]},
        "keys": ["event_type"],
        "definition_paths": [str(p)],
        "features": [
            {"name": "mid", "feature_definition": "mid_price",
             "params": {"price_col": "value"}},
            {"name": "dbl", "feature_definition": "doubled_mid", "deps": ["mid"]},
        ],
        "label_feature": "mid",
    }
    out = Featurizer(spark).run(cfg)
    assert "dbl-doubled" in out.columns
    row = out.filter(out["dbl-doubled"].isNotNull()).first()
    assert row["dbl-doubled"] == row["mid-mid_price"] * 2
    assert "doubled_mid" in REGISTRY


def test_load_from_source_string():
    loaded = load_definitions_from_source(USER_FD, module_name="t2")
    assert [c.name for c in loaded] == ["doubled_mid"]
    assert REGISTRY["doubled_mid"] is loaded[0]
