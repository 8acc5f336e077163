"""Declarative schema mapping: upstream-batch → table-column rules.

The reference drives schema direction from a declarative metadata YAML
(/root/reference/python/src/opengin/tracer/cli.py:216-231,
examples/extragzt/metadata.yml). The CDC engine's analog is a small spec
applied to every incoming batch BEFORE schema evolution:

* **rename**: an upstream column arriving under a new name lands in the
  existing table column instead of forking an additive old-null/new pair
  (the round-1 behavior this replaces).
* **drop**: upstream columns the table never stores (tracking junk).
* **cast**: explicit type pinning — still validated by the evolution
  lattice downstream, so an unsafe pin fails fast, never corrupts.

Add/widen need no spec: ``evolve_schema`` handles them structurally.
The spec is plain data (dict-of-dicts), so it can live in a YAML/JSON
config next to the pipeline definition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SchemaMapping:
    """Column-level mapping rules applied to each incoming batch."""

    renames: dict[str, str] = field(default_factory=dict)  # upstream → table
    drops: tuple[str, ...] = ()
    casts: dict[str, str] = field(default_factory=dict)  # col → spark type str

    @staticmethod
    def from_dict(d: dict) -> "SchemaMapping":
        """Build from a declarative dict (the YAML-loadable shape):
        ``{"renames": {"language": "lang"}, "drops": ["_junk"],
        "casts": {"content_len": "long"}}``."""
        return SchemaMapping(
            renames=dict(d.get("renames", {})),
            drops=tuple(d.get("drops", ())),
            casts=dict(d.get("casts", {})),
        )

    def validate(self) -> None:
        targets = list(self.renames.values())
        if len(set(targets)) != len(targets):
            raise ValueError(f"two renames map to one target: {sorted(targets)}")
        both = set(self.renames) & set(self.drops)
        if both:
            raise ValueError(f"columns both renamed and dropped: {sorted(both)}")
        chained = set(self.renames.values()) & set(self.renames.keys())
        if chained:
            # {a: b, b: c} would depend on withColumnsRenamed map order and
            # slips past apply's collision check (both keys leave `have`)
            raise ValueError(
                f"chained renames (target of one is source of another): "
                f"{sorted(chained)} — collapse to direct source→target rules"
            )


def apply_schema_mapping(df: DataFrame, mapping: SchemaMapping | dict) -> DataFrame:
    """Apply the spec to a batch. Pure projection — renames/drops/casts are
    metadata-only or lattice-safe casts, all columnar, nothing is evaluated
    row-at-a-time. Rules referencing absent columns are ignored (a spec
    outlives the upstream eras it was written for)."""
    if isinstance(mapping, dict):
        mapping = SchemaMapping.from_dict(mapping)
    mapping.validate()
    have = set(df.columns)
    renames = {a: b for a, b in mapping.renames.items() if a in have}
    if renames:
        collisions = set(renames.values()) & (have - set(renames))
        if collisions:
            raise ValueError(
                f"rename target(s) already present in batch: {sorted(collisions)}"
            )
        df = df.withColumnsRenamed(renames)
    drops = [c for c in mapping.drops if c in df.columns]
    if drops:
        df = df.drop(*drops)
    for col, typ in mapping.casts.items():
        if col in df.columns:
            df = df.withColumn(col, F.col(col).cast(typ))
    return df
