"""Featurizer: YAML/dict config -> feature DAG -> point-in-time-joined
FeatureLabelSet DataFrame.

The Spark rebuild of the reference's main entry point (reference:
svoe/featurizer/runner.py:28-164, config schema featurizer/config.py:11-31,
DAG construction batch/task_graph/builder.py:302-330). The reference's
interval algebra, task graph, scheduler, and cache actors all collapse
into: build each distinct feature DataFrame once (content-hash reuse),
``persist()`` when fanned out, declare the joins, let Catalyst/AQE plan.

Config shape (YAML or dict):

    data_source:
      kind: table|parquet|sine        # + kind-specific params
      ...
    keys: [event_type]                # instrument key columns
    features:
      - name: vol
        feature_definition: volatility_stddev
        deps: [mid]                   # bind by name to earlier features
        params: {window: '1m'}
    label_feature: mid
    label_lookahead: '5s'
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from svoe_spark.operators.asof import asof_join_multi, lookahead_shift
from svoe_spark.operators.sampling import every_nth
from svoe_spark.plans.definitions import REGISTRY
from svoe_spark.plans.feature_tree import Feature
from svoe_spark.sources.synthetic import sine_mid_price
from svoe_spark.sources.tables import load_table, read_parquet


@dataclass
class FeatureConfig:
    name: str
    feature_definition: str
    params: dict = field(default_factory=dict)
    deps: list[str] = field(default_factory=list)


@dataclass
class FeaturizerConfig:
    data_source: dict
    features: list[FeatureConfig]
    keys: list[str] = field(default_factory=list)
    label_feature: str | None = None
    label_lookahead: str | None = None
    # names of features to materialize into the FeatureStore and reuse
    # across runs (reference features_to_store, config.py:11-31; the
    # stored-feature short-circuit builder.py:83-150)
    features_to_store: list[str] = field(default_factory=list)
    # Python files whose FeatureDefinition subclasses are registered
    # before resolution (reference X5 remote-definition loading,
    # featurizer_utils/definitions_loader.py — minus the fetch)
    definition_paths: list[str] = field(default_factory=list)

    @staticmethod
    def load(obj) -> "FeaturizerConfig":
        """Accepts a dict, a YAML string, or a path to a YAML file."""
        if isinstance(obj, str):
            import yaml

            if "\n" not in obj and obj.endswith((".yaml", ".yml")):
                with open(obj) as f:
                    obj = yaml.safe_load(f)
            else:
                obj = yaml.safe_load(obj)
        feats = [
            fc if isinstance(fc, FeatureConfig) else FeatureConfig(**fc)
            for fc in obj.get("features", [])
        ]
        return FeaturizerConfig(
            data_source=obj["data_source"],
            features=feats,
            keys=list(obj.get("keys", [])),
            label_feature=obj.get("label_feature"),
            label_lookahead=obj.get("label_lookahead"),
            features_to_store=list(obj.get("features_to_store", [])),
            definition_paths=list(obj.get("definition_paths", [])),
        )


class Featurizer:
    """run(config) -> FeatureLabelSet (reference Featurizer.run +
    get_materialized_data, runner.py:28-164)."""

    def __init__(self, spark: SparkSession, store=None):
        """store: optional svoe_spark.sources.catalog.FeatureStore; when
        set, features listed in config.features_to_store are read from
        the lake if already materialized (content-hash keyed), else
        computed and written."""
        self.spark = spark
        self.store = store
        self._df_cache: dict[str, DataFrame] = {}

    # -- sources ------------------------------------------------------------

    def _load_source(self, cfg: dict) -> DataFrame:
        kind = cfg.get("kind", "table")
        if kind == "table":
            df = (
                load_table(self.spark, cfg["table"], cfg["sf_dir"])
                if "sf_dir" in cfg
                else load_table(self.spark, cfg["table"])
            )
            if "select" in cfg:
                df = df.selectExpr(*cfg["select"])
            return df
        if kind == "parquet":
            df = read_parquet(self.spark, cfg["path"])
            if "select" in cfg:
                df = df.selectExpr(*cfg["select"])
            return df
        if kind == "sine":
            return sine_mid_price(
                self.spark,
                start_ts=cfg.get("start_ts", 0.0),
                end_ts=cfg.get("end_ts", 3600.0),
                step=cfg.get("step", 1.0),
                amplitude=cfg.get("amplitude", 2000.0),
                mean=cfg.get("mean", 10000.0),
                freq=cfg.get("freq", 5.0),
                keys=cfg.get("keys"),
            )
        raise ValueError(f"unknown data_source kind: {kind}")

    # -- planning -----------------------------------------------------------

    def build_features(
        self, config: FeaturizerConfig
    ) -> dict[str, tuple[Feature, DataFrame]]:
        """Resolve every configured feature to a DataFrame, deduping
        shared subtrees by content hash and persisting fan-out > 1
        nodes (the reference's ref-count heuristic,
        cache_actor.py:34-35, done declaratively)."""
        if config.definition_paths:
            from svoe_spark.plans.definitions import load_definitions_from_file

            for p in config.definition_paths:
                load_definitions_from_file(p)
        source_df = self._load_source(config.data_source)
        source_feature = Feature.make("__source__", config.data_source)

        by_name: dict[str, tuple[Feature, DataFrame]] = {}
        # fan-out is counted AND looked up by feature NAME: deps refer
        # to names, and by_name is empty at counting time, so a
        # content-key lookup here would never match (dead persist)
        fanout: dict[str, int] = {}
        for fc in config.features:
            for d in fc.deps:
                fanout[d] = fanout.get(d, 0) + 1

        for fc in config.features:
            defn = REGISTRY.get(fc.feature_definition)
            if defn is None:
                raise ValueError(
                    f"unknown feature_definition: {fc.feature_definition!r}; "
                    f"registered: {sorted(REGISTRY)}"
                )
            dep_feats = [by_name[d][0] for d in fc.deps] or [source_feature]
            node = Feature.make(
                fc.feature_definition, fc.params, dep_feats, name=fc.name
            )
            key = node.key()
            if key in self._df_cache:
                by_name[fc.name] = (node, self._df_cache[key])
                continue
            upstream_dfs = [by_name[d][1] for d in fc.deps] or [source_df]
            upstreams = dict(zip(defn.dep_slots, upstream_dfs))
            if self.store is not None and fc.name in config.features_to_store:
                df = self.store.get_or_compute(
                    f"{fc.name}-{key}",
                    lambda: defn.transform(upstreams, fc.params, config.keys),
                )
            else:
                df = defn.transform(upstreams, fc.params, config.keys)
            if fanout.get(fc.name, 0) > 1:
                df = df.persist()
            self._df_cache[key] = df
            by_name[fc.name] = (node, df)
        return by_name

    def run(self, config) -> DataFrame:
        """Compute the FeatureLabelSet: one row per label-feature event,
        every feature as-of joined (J1), label = the label feature
        ``label_lookahead`` in the future (J2). Column naming matches
        the reference: '{feature}-{col}' and 'label_{feature}-{col}'
        (tasks.py:243-252)."""
        config = config if isinstance(config, FeaturizerConfig) else FeaturizerConfig.load(config)
        feats = self.build_features(config)
        keys = config.keys

        label_name = config.label_feature or config.features[0].name
        label_df = feats[label_name][1]

        value_cols = [c for c in label_df.columns if c != "ts" and c not in keys]
        labels = label_df
        if config.label_lookahead:
            labels = lookahead_shift(
                label_df,
                config.label_lookahead,
                on="ts",
                by=keys,
                value_cols=value_cols,
                prefix=f"label_{label_name}-",
            )
        labels = labels.select(
            *keys,
            "ts",
            *[c for c in labels.columns if c.startswith("label_")],
        )

        rights = {
            f"{name}-": df for name, (node, df) in feats.items()
        }
        return asof_join_multi(labels, rights, on="ts", by=keys)

    def run_stream(self, config, source_stream: DataFrame) -> DataFrame:
        """The Kappa ONLINE path (reference entry point 2, §3.2): the
        configured per-event feature graph over a streaming DataFrame,
        one combined vector row per source event ('{name}_value'
        columns). Spark permits a single stateful operator per streaming
        query, so the whole graph runs FUSED in one per-key state
        machine (streaming.feature_vector) — the same execution shape as
        the reference's worker actor pushing each event through its
        streamz graph. Window-bucket features (ohlcv) stream separately
        via their transform_stream."""
        from svoe_spark.functions.time import duration_to_seconds
        from svoe_spark.streaming.feature_vector import feature_vector_stream

        config = config if isinstance(config, FeaturizerConfig) else FeaturizerConfig.load(config)
        if len(config.keys) != 1:
            raise ValueError("run_stream needs exactly one key column")

        from pyspark.sql import functions as F

        stream = source_stream
        specs: list[dict] = []
        implicit_src: str | None = None

        def source_fallback(fc) -> str:
            # dep-less stddev/ewma: the batch path binds the raw source
            # into the upstream slot; mirror it with one implicit
            # passthrough spec of the source price column
            nonlocal implicit_src
            if fc.deps:
                return fc.deps[0]
            if implicit_src is None:
                implicit_src = "__source__"
                specs.append(
                    {"name": implicit_src, "kind": "source",
                     "col": fc.params.get("value_col", fc.params.get("price_col", "value"))}
                )
            return implicit_src

        for fc in config.features:
            if fc.feature_definition == "mid_price":
                # mirror the batch MidPrice definition: with bid/ask on
                # the source, the feature is (bid+ask)/2 — a raw-column
                # passthrough here would silently stream a different
                # series than the batch path computes
                if "bid" in stream.columns and "ask" in stream.columns:
                    col = f"__mid_{fc.name}"
                    stream = stream.withColumn(
                        col, (F.col("bid") + F.col("ask")) / 2
                    )
                else:
                    col = fc.params.get("price_col", "value")
                    if col not in stream.columns:
                        raise ValueError(
                            f"mid_price {fc.name!r}: source column {col!r} "
                            f"not in stream columns {stream.columns}"
                        )
                specs.append({"name": fc.name, "kind": "source", "col": col})
            elif fc.feature_definition == "volatility_stddev":
                specs.append(
                    {"name": fc.name, "kind": "stddev",
                     "of": source_fallback(fc),
                     "window": duration_to_seconds(fc.params.get("window", "1m"))}
                )
            elif fc.feature_definition == "ewma":
                specs.append(
                    {"name": fc.name, "kind": "ewma", "of": source_fallback(fc),
                     "alpha": fc.params.get("alpha", 0.1)}
                )
            else:
                raise ValueError(
                    f"feature {fc.feature_definition!r} has no fused streaming "
                    f"form; use its transform_stream directly (e.g. ohlcv)"
                )
        # drop the helper spec's column from the OUTPUT if it was only
        # an implicit upstream (feature_vector_stream emits every spec)
        out = feature_vector_stream(stream, specs, key=config.keys[0], on="ts")
        if implicit_src is not None:
            out = out.drop(f"{implicit_src}_value")
        return out

    def get_materialized_data(
        self, config, pick_every_nth_row: int = 1
    ) -> DataFrame:
        """Reference runner.py:148-164: the label set, optionally
        decimated."""
        out = self.run(config)
        cfg = config if isinstance(config, FeaturizerConfig) else FeaturizerConfig.load(config)
        if pick_every_nth_row > 1:
            out = every_nth(out, pick_every_nth_row, on="ts", by=cfg.keys)
        return out
