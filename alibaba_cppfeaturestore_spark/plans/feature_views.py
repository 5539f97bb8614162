"""Feature-view registry: the reference's Feast surface as engine API.

Mirrors the abstractions in `feast-feature-store/feature-repo/`
(entities.py:3-4, user_features.py:8-28, item_features.py:8-20) and the
retrieval paths (`feature_retrieval/get_fv.py:32-47` historical,
`:25-28` online; `materialize.sh:3-4`): a FeatureView is a NAMED
PROJECTION of a source table keyed by entity columns with a TTL — not a
model object, just metadata + a DataFrame — so everything stays
inspectable and oracle-checkable.

- ``get_historical_features`` = chained point-in-time joins
  (training-set assembly, leakage-free: each view contributes the latest
  feature row at-or-before the entity row's event time, within TTL).
- ``materialize_online`` = latest-per-key projection (the
  materialize-incremental job).
- ``get_online_features`` = broadcast key lookup against the
  materialized table.

Scale notes are those of the underlying operators (``asof_join``,
``latest_per_key``, ``online_lookup``): entity-key shuffles only,
top-1-per-key pushdown (WindowGroupLimit), broadcastable lookups.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..operators.aggregates import latest_per_key
from ..operators.joins import asof_join, online_lookup


@dataclass(frozen=True)
class FeatureView:
    """Named, TTL'd projection of a feature source keyed by entities."""

    name: str
    entities: list[str]
    ts_col: str
    features: list[str]
    ttl: str | None = None  # e.g. "365 days"; None = unbounded


@dataclass
class FeatureStore:
    """In-engine registry binding FeatureViews to their source frames."""

    views: dict[str, FeatureView] = field(default_factory=dict)
    sources: dict[str, DataFrame] = field(default_factory=dict)

    def register(self, view: FeatureView, source: DataFrame) -> None:
        missing = [
            c
            for c in [*view.entities, view.ts_col, *view.features]
            if c not in source.columns
        ]
        if missing:
            raise ValueError(f"view {view.name}: source lacks columns {missing}")
        self.views[view.name] = view
        self.sources[view.name] = source.select(
            *view.entities, view.ts_col, *view.features
        )

    def get_historical_features(
        self,
        entity_df: DataFrame,
        view_names: list[str],
        event_ts: str = "event_timestamp",
    ) -> DataFrame:
        """Leakage-free training-set assembly: one as-of join per view,
        chained — each feature column reflects the view's state at the
        entity row's own event time (within the view's TTL)."""
        out = entity_df
        for name in view_names:
            v = self.views[name]
            out = asof_join(
                out,
                self.sources[name],
                keys=v.entities,
                event_ts=event_ts,
                feature_ts=v.ts_col,
                ttl=v.ttl,
                features=v.features,
            )
        return out

    def materialize_online(self, view_name: str) -> DataFrame:
        """Latest feature row per entity key — the online-store content
        (push via ``streaming.pipeline.OnlineStore`` / foreachBatch)."""
        v = self.views[view_name]
        return latest_per_key(self.sources[view_name], v.entities, v.ts_col)

    def get_online_features(
        self, request_keys: DataFrame, view_name: str
    ) -> DataFrame:
        """Point lookups against the materialized latest-per-key table
        (unknown keys → NULL features, Feast semantics)."""
        v = self.views[view_name]
        return online_lookup(
            request_keys, self.materialize_online(view_name), v.entities
        )
