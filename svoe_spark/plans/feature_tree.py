"""Feature tree: named, parameterized feature nodes with content-hash
identity and declared upstream dependencies.

Mirrors the reference's Feature tree semantics (reference:
svoe/featurizer/features/feature_tree/feature_tree.py:11-89): identity
is a content hash of (definition, params, children), so shared subtrees
dedup structurally — the planner computes each distinct subtree ONCE and
reuses the DataFrame (the Spark replacement for the reference's
ref-counted CacheActor, cache_actor.py:17-45).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Feature:
    definition: str
    params: tuple = ()  # canonicalized (sorted key/value) pairs
    deps: tuple["Feature", ...] = ()
    name: str | None = None

    @staticmethod
    def make(
        definition: str,
        params: dict | None = None,
        deps: list["Feature"] | None = None,
        name: str | None = None,
    ) -> "Feature":
        canon = tuple(sorted((k, json.dumps(v, sort_keys=True)) for k, v in (params or {}).items()))
        return Feature(definition, canon, tuple(deps or ()), name)

    @property
    def params_dict(self) -> dict:
        return {k: json.loads(v) for k, v in self.params}

    def key(self) -> str:
        """Content hash — stable across processes (no Python id()s)."""
        payload = json.dumps(
            [self.definition, list(self.params), [d.key() for d in self.deps]]
        )
        return hashlib.sha1(payload.encode()).hexdigest()[:16]

    @property
    def display_name(self) -> str:
        return self.name or f"{self.definition}-{self.key()[:6]}"

    def walk_postorder(self):
        for d in self.deps:
            yield from d.walk_postorder()
        yield self


@dataclass
class FeatureCatalog:
    """Dedup map from content key -> Feature (reference
    feature_tree.py:176-179)."""

    _by_key: dict[str, Feature] = field(default_factory=dict)

    def intern(self, f: Feature) -> Feature:
        return self._by_key.setdefault(f.key(), f)
