from svoe_spark.plans.featurizer import Featurizer, FeaturizerConfig  # noqa: F401
