"""Schema evolution: additive columns + type widening via a safe-cast lattice.

Reference analog: on a column-header mismatch the reference *forks a new
table variant* ``{name}_{n}`` instead of failing
(/root/reference/python/src/opengin/tracer/agents/aggregator.py:57-80).
The CDC engine replaces forking with real evolution on one table:

* **Additive**: a batch with new columns evolves the table schema; old data
  files simply lack the column and read as null (Spark 4 Parquet
  missing-column fill — the DataFrame-level equivalent is
  ``unionByName(..., allowMissingColumns=True)``).
* **Type widening**: a batch whose column is *wider* on the safe-cast
  lattice (byte→short→int→long, float→double, int→long→double is NOT
  allowed implicitly — only lossless widenings) widens the table schema;
  old files read through the widening Parquet reader.
* Anything else (narrowing, incompatible types, non-nullable additions) is
  a ``SchemaEvolutionError`` — the CDC equivalent of a poison batch; the
  caller routes it to the dead-letter path instead of corrupting the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaEvolutionError(Exception):
    """Incompatible schema change — reject the batch, don't corrupt."""


# Lossless widening lattice: type → rank within its family.
_WIDENING_FAMILIES: dict[type, tuple[str, int]] = {
    T.ByteType: ("int", 0),
    T.ShortType: ("int", 1),
    T.IntegerType: ("int", 2),
    T.LongType: ("int", 3),
    T.FloatType: ("float", 0),
    T.DoubleType: ("float", 1),
    # naive (NTZ) → session-zoned timestamp is value-preserving under the
    # engine's UTC-session convention (naive values ARE UTC wall-clock —
    # see sources/changelog.py). Covers sessions that keep Spark 4's
    # default inferTimestampNTZ=true and read log parquet without the
    # engine's explicit schema.
    T.TimestampNTZType: ("ts", 0),
    T.TimestampType: ("ts", 1),
}


def _widened(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """The wider of a and b if they sit on the same lattice chain, else
    None (incompatible)."""
    if a == b:
        return a
    fa = _WIDENING_FAMILIES.get(type(a))
    fb = _WIDENING_FAMILIES.get(type(b))
    if fa and fb and fa[0] == fb[0]:
        return a if fa[1] >= fb[1] else b
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        # decimal scale-up: wider precision AND scale wins if it contains
        # the other (p - s must not shrink)
        if a.precision >= b.precision and a.scale >= b.scale and (
            a.precision - a.scale >= b.precision - b.scale
        ):
            return a
        if b.precision >= a.precision and b.scale >= a.scale and (
            b.precision - b.scale >= a.precision - a.scale
        ):
            return b
    return None


def evolve_schema(current: T.StructType, incoming: T.StructType) -> T.StructType:
    """Merge an incoming batch schema into the current table schema.

    Returns the (possibly identical) evolved schema; raises on unsafe
    changes. Column order: current columns first (widened as needed), then
    new columns in incoming order — stable, append-only evolution, like
    Iceberg field-id semantics.
    """
    # defensive: collapse duplicate incoming names (first occurrence wins)
    seen: set[str] = set()
    incoming = T.StructType(
        [f for f in incoming.fields if not (f.name in seen or seen.add(f.name))]
    )
    cur = {f.name: f for f in current.fields}
    out: list[T.StructField] = []
    for f in current.fields:
        inc = next((g for g in incoming.fields if g.name == f.name), None)
        if inc is None:
            out.append(f)
            continue
        w = _widened(f.dataType, inc.dataType)
        if w is None:
            raise SchemaEvolutionError(
                f"column {f.name}: cannot evolve {f.dataType.simpleString()} "
                f"← {inc.dataType.simpleString()}"
            )
        # nullability: KEEP the table's declared contract. Batch schemas
        # inferred from parquet are always nullable, so OR-ing would flip
        # every declared non-null column to nullable on first merge (and
        # spuriously count as a schema change).
        out.append(T.StructField(f.name, w, f.nullable))
    for g in incoming.fields:
        if g.name not in cur:
            # additive columns must be nullable: old rows have no value
            out.append(T.StructField(g.name, g.dataType, True))
    return T.StructType(out)


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project/cast ``df`` to exactly ``target`` (add nulls for missing
    columns, widen present ones). All casts are on the safe lattice by
    construction when target came from ``evolve_schema``."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            if have[f.name].dataType == f.dataType:
                cols.append(F.col(f.name))
            else:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
