"""GinTable — a native lake-table layer (Iceberg-semantics over Parquet).

No Iceberg/Delta/Hudi jars exist in this sandbox (verified: 0 matches in
/opt/spark/jars), so the engine implements the table layer itself with the
same semantics, behind a small interface a real Iceberg catalog could
replace:

  * **Data files**: Parquet, bucketed by ``pmod(xxhash64(url), n_buckets)``
    — the bucket is the MERGE pruning unit (a micro-batch only rewrites the
    buckets it touches; everything else is carried forward by reference).
  * **Snapshots**: JSON manifests ``_manifests/v{N}.json`` listing data
    files + per-file bucket/rows/bytes/schema-version. The current table
    state is the highest committed version.
  * **Atomic commit**: manifest written to a temp name then ``os.link``ed
    to its final name — link fails if the version already exists, which is
    the optimistic-concurrency check (same rename-based idempotence idea as
    the reference's collision-counter export,
    /root/reference/python/src/opengin/tracer/agents/exporter.py:59-69,
    upgraded from "never overwrite" to "atomically detect conflict").
  * **Exactly-once**: each snapshot records applied batch ids as compressed
    ranges; re-delivery of an applied batch is a no-op (the reference's
    idempotent filenames + per-run metadata, exporter.py:59-69 +
    orchestrator.py:399-410, become a real transactional high-water mark).
  * **Schema evolution**: every snapshot carries the full schema history;
    data files reference the schema version they were written with. Reads
    use Spark 4's widening Parquet read (int32→int64, missing column→null)
    against the *current* schema.

Scale notes (10^10 events, 1000 executors): manifests list O(n_buckets)
files after compaction, not O(commits); applied-batch ranges stay O(1) for
monotone streaming batch ids; the only driver-side work per commit is a
footer stat read of the files the commit itself wrote.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"
SEQ_COL = "_seq"  # internal last-writer-wins tiebreak column
DELETED_COL = "_deleted"  # internal tombstone flag (see note below)
BUCKET_COL = "_bucket"  # internal bucket column (manifest metadata, not stored)

# Tombstones: a delete is stored as a row with _deleted=true and nulled
# payload, NOT physically removed — otherwise an out-of-order event arriving
# in a LATER batch with an OLDER (warc_ts, seq) would resurrect the url
# (the table must remember the delete's LWW ordering key). User reads filter
# tombstones; merge reads keep them. At scale tombstones are expired once
# the event-time watermark passes them (operators/merge.py:expire_tombstones).


class CommitConflict(Exception):
    """Another writer committed the same version first — retry on top."""


def choose_n_buckets(
    est_table_bytes: int,
    target_bucket_bytes: int = 64 * 1024 * 1024,
    min_buckets: int = 16,
    max_buckets: int = 4096,
) -> int:
    """Pick a power-of-two bucket count from an estimated table size.

    The bucket is the MERGE rewrite unit AND the memory unit: the
    bucket-local merge concatenates one bucket partition into a single
    pandas frame, so a bucket's on-disk parquet (~4× smaller than its
    in-memory form) must stay well under executor memory.
    ``target_bucket_bytes`` is on-disk: the 64 MB default ≈ 256 MB in
    memory ≈ a quarter of a small 1 GB-heap executor — safe everywhere,
    and small enough that compaction/rewrite tasks stay short. Power of
    two keeps bucket counts stable-ish across re-estimates and makes
    rebucketing splits clean.
    """
    n = min_buckets
    while n < max_buckets and est_table_bytes > n * target_bucket_bytes:
        n *= 2
    return n


# --- applied-batch-id ranges (exactly-once bookkeeping) --------------------

def ranges_add(ranges: list[list[int]], bid: int) -> list[list[int]]:
    """Insert ``bid`` into sorted inclusive ranges, merging neighbors."""
    out: list[list[int]] = []
    placed = False
    for lo, hi in ranges:
        if placed or bid > hi + 1:
            out.append([lo, hi])
        elif bid < lo - 1:
            out.append([bid, bid])
            out.append([lo, hi])
            placed = True
        else:  # overlaps/adjacent
            out.append([min(lo, bid), max(hi, bid)])
            placed = True
    if not placed:
        out.append([bid, bid])
    # merge adjacents created by insertion
    merged: list[list[int]] = []
    for r in sorted(out):
        if merged and r[0] <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], r[1])
        else:
            merged.append(list(r))
    return merged


def ranges_contain(ranges: list[list[int]], bid: int) -> bool:
    return any(lo <= bid <= hi for lo, hi in ranges)


@dataclass
class DataFile:
    path: str  # relative to table root
    bucket: int
    rows: int
    bytes: int
    schema_version: int
    family: str = "base"  # column family: "base" (light cols) | "heavy"
    # folded=True (base family only): the file carries ALL columns, heavy
    # included — written by compact(fold_heavy=True) for read-heavy tables
    # so reads of its bucket need no heavy join. A bucket is either folded
    # (one folded file, zero heavy files) or split; a later MERGE touching
    # a folded bucket re-splits it (and must read its payloads from the
    # folded file — see merge.py target read).
    folded: bool = False
    # event-time range of the file's rows (naive-UTC ISO strings, read
    # from the parquet footer at write time) — the MANIFEST-level pruning
    # statistic: a range read drops non-overlapping files from the scan's
    # file list before Spark even opens a footer. None (no stats / heavy
    # family / pre-r5 files) means "never pruned" — always safe.
    ts_min: str | None = None
    ts_max: str | None = None

    def to_json(self) -> dict:
        return self.__dict__.copy()

    @staticmethod
    def from_json(d: dict) -> "DataFile":
        return DataFile(
            **{"family": "base", "folded": False,
               "ts_min": None, "ts_max": None, **d}
        )


def _ts_to_iso(x) -> str:
    """Normalize a datetime / ISO string to naive-UTC ISO text — the same
    form DataFile.ts_min/ts_max use, so range overlap is a lexicographic
    string comparison."""
    import datetime as _dt

    if isinstance(x, _dt.datetime):
        if x.tzinfo is not None:
            x = x.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return x.isoformat()
    return str(x)


def _footer_ts_range(meta, ts_col: str) -> tuple[str | None, str | None]:
    """(min, max) of ``ts_col`` across a parquet file's row groups as
    naive-UTC ISO strings, from footer statistics already in hand at
    write time; (None, None) when absent (INT96 legacy, missing column,
    suppressed stats) — absent stats mean the file is never pruned."""
    import datetime as _dt

    try:
        names = list(meta.schema.names)
        if ts_col not in names:
            return None, None
        idx = names.index(ts_col)
        lo = hi = None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None, None
            mn, mx = st.min, st.max
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi

        def iso(x):
            if isinstance(x, _dt.datetime):
                if x.tzinfo is not None:
                    x = x.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                return x.isoformat()
            return None

        return iso(lo), iso(hi)
    except Exception:
        return None, None


class GinTable:
    """A bucketed copy-on-write lake table with snapshot isolation."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._manifest_dir = os.path.join(self.path, MANIFEST_DIR)

    # -- lifecycle ----------------------------------------------------------

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        n_buckets: int = 64,
        heavy_columns: tuple[str, ...] | list[str] | None = None,
        key_col: str = "url",
        ts_col: str = "warc_ts",
    ) -> "GinTable":
        """Create an empty table (snapshot v0). Fails if it exists.

        ``key_col`` / ``ts_col`` declare the table's MERGE identity: the
        upsert key (also the bucketing column) and the event-time column
        of the LWW ordering. They are recorded in the manifest so every
        maintenance op (compact, fold, rebucket, expire, table_changes)
        and the merge itself agree on ONE definition — callers no longer
        thread them through. Manifests from older revisions lack the keys
        and default to url/warc_ts (the pages layout).

        ``heavy_columns`` declares a column-family split: those columns are
        stored in a separate "heavy" file family keyed by ``_seq``. A MERGE
        then rewrites only the LIGHT columns of a touched bucket and
        appends the batch winners' heavy payloads — write amplification
        drops by roughly the heavy fraction of the row (~2× for html-heavy
        pages). The cost moves to reads that project a heavy column (a
        ``_seq`` join); reads of light columns are unchanged. Fixed at
        create; compaction rewrites both families and purges stale heavy
        rows.
        """
        t = GinTable(spark, path)
        os.makedirs(t._manifest_dir, exist_ok=False)
        os.makedirs(os.path.join(t.path, DATA_DIR), exist_ok=True)
        stored = GinTable._with_internal(schema)
        heavy = list(heavy_columns or ())
        unknown = [c for c in heavy if c not in schema.fieldNames()]
        if unknown:
            raise ValueError(
                f"heavy_columns not in schema: {unknown} "
                f"(schema has {schema.fieldNames()})"
            )
        # EXPLICIT identity columns must exist; the url/warc_ts DEFAULTS
        # are not enforced so pre-r4 callers that pass key/ts at
        # merge_batch time (overriding the manifest) keep working — a
        # merge that actually needs a missing column still fails with a
        # clear unresolved-column error at that point
        if key_col != "url" and key_col not in schema.fieldNames():
            raise ValueError(f"key_col '{key_col}' not in schema")
        if ts_col != "warc_ts" and ts_col not in schema.fieldNames():
            raise ValueError(f"ts_col '{ts_col}' not in schema")
        snap = {
            "version": 0,
            "parent": None,
            "n_buckets": n_buckets,
            "key_col": key_col,
            "ts_col": ts_col,
            "schema_version": 1,
            "schemas": {"1": json.loads(stored.json())},
            "column_families": {"heavy": heavy},
            # invariant flag: the heavy family holds at most one row per
            # _seq. True from creation; every engine writer preserves it
            # (MERGE prefers the target copy on exact (ts, seq) ties, so a
            # redelivered event never re-appends its payload; compaction /
            # expiry rewrite from deduped state). Reads skip the
            # whole-family dropDuplicates while it holds. Manifests from
            # older engine revisions lack the key → read() falls back to
            # the defensive dedup.
            "heavy_seq_unique": True,
            "files": [],
            "applied_batch_ranges": [],
            "metrics": {},
            "lineage": [],
            "committed_at": datetime.now(timezone.utc).isoformat(),
        }
        t._write_manifest(snap)
        return t

    @staticmethod
    def load(spark: SparkSession, path: str) -> "GinTable":
        t = GinTable(spark, path)
        if t.current_snapshot() is None:
            raise FileNotFoundError(f"no GinTable at {path}")
        return t

    @staticmethod
    def exists(path: str) -> bool:
        d = os.path.join(os.path.abspath(path), MANIFEST_DIR)
        return os.path.isdir(d) and any(
            f.startswith("v") and f.endswith(".json") for f in os.listdir(d)
        )

    @staticmethod
    def _with_internal(schema: T.StructType) -> T.StructType:
        fields = list(schema.fields)
        names = schema.fieldNames()
        if SEQ_COL not in names:
            fields.append(T.StructField(SEQ_COL, T.LongType(), True))
        if DELETED_COL not in names:
            fields.append(T.StructField(DELETED_COL, T.BooleanType(), True))
        return T.StructType(fields)

    # -- snapshots ----------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir, f"v{version:08d}.json")

    def current_version(self) -> int | None:
        if not os.path.isdir(self._manifest_dir):
            return None
        versions = [
            int(f[1:9])
            for f in os.listdir(self._manifest_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions) if versions else None

    def current_snapshot(self) -> dict | None:
        v = self.current_version()
        if v is None:
            return None
        return self.snapshot(v)

    def snapshot(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _write_manifest(self, snap: dict) -> None:
        """Atomic check-and-commit: link() fails if the version exists."""
        final = self._manifest_path(snap["version"])
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(snap, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError as e:
            raise CommitConflict(
                f"version {snap['version']} already committed"
            ) from e
        finally:
            os.unlink(tmp)

    # -- schema ------------------------------------------------------------

    def schema(self, snap: dict | None = None, include_internal: bool = False) -> T.StructType:
        snap = snap or self.current_snapshot()
        stored = T.StructType.fromJson(snap["schemas"][str(snap["schema_version"])])
        if include_internal:
            return stored
        return T.StructType([f for f in stored.fields if not f.name.startswith("_")])

    def n_buckets(self, snap: dict | None = None) -> int:
        snap = snap or self.current_snapshot()
        return snap["n_buckets"]

    def heavy_columns(self, snap: dict | None = None) -> list[str]:
        snap = snap or self.current_snapshot()
        return snap.get("column_families", {}).get("heavy", [])

    def key_col(self, snap: dict | None = None) -> str:
        """The table's merge key / bucketing column (manifest-declared;
        pre-r4 manifests default to the pages layout's url)."""
        snap = snap or self.current_snapshot()
        return snap.get("key_col", "url")

    def ts_col(self, snap: dict | None = None) -> str:
        """The table's event-time column for LWW ordering / watermarks."""
        snap = snap or self.current_snapshot()
        return snap.get("ts_col", "warc_ts")

    def bucket_expr(
        self,
        key_col: str | None = None,
        snap: dict | None = None,
        n_buckets: int | None = None,
    ):
        """Bucket assignment expression — MUST be used identically on write
        and on merge probe so pruning is sound (rebucket passes the NEW
        count through ``n_buckets`` so there is exactly one definition of
        the hash). ``key_col=None`` resolves the manifest-declared key."""
        n = n_buckets if n_buckets is not None else self.n_buckets(snap)
        key = key_col if key_col is not None else self.key_col(snap)
        return F.pmod(F.xxhash64(F.col(key)), F.lit(n)).cast("int")

    # -- read path ----------------------------------------------------------

    def lookup(
        self,
        key_value,
        snap: dict | None = None,
        include_heavy: bool = True,
    ) -> DataFrame:
        """Bucket-pruned point read — the serving path: resolve the key's
        bucket and read ONLY that bucket's files, so a single-key lookup
        on a 100 TB table scans one bucket (~64 MB default), not the
        table. The key equality is also pushed to the parquet scan
        (PushedFilters), so row-group stats prune within the bucket too.

        The bucket id is resolved with the SAME ``bucket_expr`` the
        writes use, evaluated on a one-row literal frame — a tiny local
        job (no table data touched) that guarantees hash parity with the
        layout; a serving tier doing thousands of lookups/sec would
        evaluate Spark's xxhash64 driver-side once and cache, but
        correctness-by-construction wins here.
        """
        snap = snap or self.current_snapshot()
        key = self.key_col(snap)
        row = (
            self.spark.range(1)
            .select(F.lit(key_value).alias(key))
            .select(self.bucket_expr(key, snap).alias("b"))
            .first()
        )
        return self.read(
            snap, buckets={row["b"]}, include_heavy=include_heavy
        ).filter(F.col(key) == F.lit(key_value))

    def read(
        self,
        snap: dict | None = None,
        buckets: set[int] | None = None,
        include_internal: bool = False,
        include_heavy: bool = True,
        ts_range: tuple | None = None,
    ) -> DataFrame:
        """Read table state at a snapshot, optionally pruned to buckets
        and/or an event-time range.

        Bucket pruning happens HERE, at the manifest layer — the Spark scan
        never even lists the untouched files (this is the engine's
        partition pruning for MERGE).

        ``ts_range=(lo, hi)`` (datetimes or ISO strings, inclusive) prunes
        base/folded files whose manifest-recorded event-time range
        (DataFile.ts_min/ts_max, read from footers at write time) does not
        overlap — at 10^5-file scale this drops files BEFORE Spark lists
        or opens them, one manifest pass instead of 10^5 footer reads;
        row-group stats then prune WITHIN the surviving files (see
        compact(sort_by=...)). The exact row filter is applied on top, so
        the result is precisely the rows in range regardless of stats
        coverage; files without stats are always read (never wrongly
        pruned). Heavy files carry no event time — on a split table a
        range read joins the full heavy family (fold first, or use
        include_heavy=False, when range serving is the hot path).

        On a column-family-split table, heavy columns are recovered with a
        ``_seq`` join against the heavy family — a direct join under the
        ``heavy_seq_unique`` manifest invariant (every table this engine
        writes); only pre-invariant/legacy manifests pay a defensive
        ``dropDuplicates`` first. ``include_heavy=False`` skips the heavy
        scan AND the join entirely — heavy columns read as null; the MERGE
        target read uses this (it never needs old payloads).

        FOLDED buckets (compact(fold_heavy=True)) carry heavy columns
        inline in their single base-family file: their rows come from one
        full-schema scan with NO join; a fully folded table's read plan is
        join-free. Mixed tables (some buckets folded, some split) union
        the two scans — each row is still read exactly once.
        """
        snap = snap or self.current_snapshot()
        schema = self.schema(snap, include_internal=True)
        heavy_cols = self.heavy_columns(snap)
        base_schema = T.StructType(
            [f for f in schema.fields if f.name not in heavy_cols]
        )
        files = [DataFile.from_json(f) for f in snap["files"]]
        if buckets is not None:
            files = [f for f in files if f.bucket in buckets]
        lo_iso = hi_iso = None
        if ts_range is not None:
            lo_iso, hi_iso = (_ts_to_iso(ts_range[0]), _ts_to_iso(ts_range[1]))
            files = [
                f for f in files
                if f.family == "heavy"
                or f.ts_min is None or f.ts_max is None
                or not (f.ts_max < lo_iso or f.ts_min > hi_iso)
            ]
        folded_files = [f for f in files if f.family == "base" and f.folded]
        if not (heavy_cols and include_heavy):
            # folded files are ordinary base files here: reading them under
            # base_schema prunes the inline heavy columns at the parquet
            # scan (ReadSchema excludes them — no payload IO)
            base_files = [f for f in files if f.family == "base"]
            folded_files = []
        else:
            base_files = [f for f in files if f.family == "base" and not f.folded]
        if not base_files:
            df = self.spark.createDataFrame([], base_schema)
        else:
            paths = [os.path.join(self.path, f.path) for f in base_files]
            # Spark 4 Parquet reader: missing columns → null, int32→int64
            # widening — covers all schema-history eras in one scan.
            df = self.spark.read.schema(base_schema).parquet(*paths)
        if heavy_cols:
            if include_heavy:
                heavy_schema = T.StructType(
                    [schema[SEQ_COL]] + [schema[c] for c in heavy_cols]
                )
                heavy_files = [f for f in files if f.family == "heavy"]
                if base_files:
                    if heavy_files:
                        hpaths = [os.path.join(self.path, f.path) for f in heavy_files]
                        hdf = self.spark.read.schema(heavy_schema).parquet(*hpaths)
                        if not snap.get("heavy_seq_unique", False):
                            # defensive path for pre-invariant manifests only:
                            # the dedup hash-aggregates the whole heavy family
                            # (payloads included). Keyed on _seq, same as the
                            # join, so the join reuses the exchange — the heavy
                            # side still shuffles once, not twice.
                            hdf = hdf.dropDuplicates([SEQ_COL])
                    else:
                        hdf = self.spark.createDataFrame([], heavy_schema)
                    df = df.join(hdf, SEQ_COL, "left")
                else:
                    # all selected buckets are folded (or empty): join-free
                    for c in heavy_cols:
                        df = df.withColumn(c, F.lit(None).cast(schema[c].dataType))
                if folded_files:
                    fpaths = [os.path.join(self.path, f.path) for f in folded_files]
                    fdf = self.spark.read.schema(schema).parquet(*fpaths)
                    if base_files:
                        df = df.select(
                            *[f.name for f in schema.fields]
                        ).unionByName(fdf)
                    else:
                        # the split side is empty by construction — drop it
                        # so the folded-only plan is a bare scan
                        df = fdf
            else:
                for c in heavy_cols:
                    df = df.withColumn(c, F.lit(None).cast(schema[c].dataType))
        df = df.select(*[f.name for f in schema.fields])  # canonical order
        if ts_range is not None:
            # exact semantics on top of the file pruning: the surviving
            # files may carry out-of-range rows (and stat-less files are
            # read whole); this predicate also pushes to the parquet scan.
            # The bound literals carry an explicit 'Z' so the cast anchors
            # them to UTC — the same convention the manifest's file-level
            # ISO strings use — instead of the session timezone: a table
            # opened under a non-UTC session would otherwise prune files
            # by UTC bounds but filter rows by shifted bounds and drop
            # in-range rows (ADVICE round 5).
            tsc = self.ts_col(snap)
            df = df.filter(
                (F.col(tsc) >= F.lit(lo_iso + "Z").cast("timestamp"))
                & (F.col(tsc) <= F.lit(hi_iso + "Z").cast("timestamp"))
            )
        if not include_internal:
            # user view: tombstones invisible, internal columns dropped
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False))).select(
                *[f.name for f in schema.fields if not f.name.startswith("_")]
            )
        return df

    # -- write path ----------------------------------------------------------

    def write_split_data_files(
        self, df: DataFrame, version: int, schema_version: int,
        n_partitions: int | None = None,
    ) -> list[DataFile]:
        """Write a full-row frame (carrying BUCKET_COL) as BOTH column
        families: light columns → "base", heavy columns (rows with any
        heavy value present) → "heavy" keyed by ``_seq``. The input is
        persisted across the two write actions so the upstream plan (the
        merge shuffle, a compaction read) runs once. Degrades to one plain
        write when the table has no split."""
        heavy_cols = self.heavy_columns()
        if not heavy_cols:
            return self.write_data_files(df, version, schema_version, n_partitions)
        # localCheckpoint, not persist(): the SQL cache columnar-compresses
        # the binary payload (measured 2× slower than the write itself);
        # checkpoint blocks are row-serialized and cheap, and both family
        # writes read the single materialization
        df = df.localCheckpoint(eager=True)
        base = df.drop(*heavy_cols)
        files = self.write_data_files(
            base, version, schema_version, n_partitions, family="base"
        )
        present = None
        for c in heavy_cols:
            cond = F.col(c).isNotNull()
            present = cond if present is None else (present | cond)
        heavy = df.filter(present).select(BUCKET_COL, SEQ_COL, *heavy_cols)
        files += self.write_data_files(
            heavy, version, schema_version, n_partitions, family="heavy"
        )
        return files

    def write_data_files(
        self, df: DataFrame, version: int, schema_version: int,
        n_partitions: int | None = None,
        family: str = "base",
        folded: bool = False,
    ) -> list[DataFile]:
        """Write ``df`` (must carry BUCKET_COL) as bucketed Parquet files
        under a commit-scoped directory; returns manifest entries.

        ``n_partitions`` (pass the touched-bucket count) repartitions by
        bucket first so each bucket is written by one task as one file —
        measured 3× faster than every task opening a writer per bucket,
        and it keeps file counts O(buckets), not O(buckets × tasks).

        Files land before the manifest is committed — a crashed commit
        leaves only unreferenced files (GC'able), never a torn table.
        """
        fam_tag = f"{family}-folded" if folded else family
        commit_dir_rel = os.path.join(
            DATA_DIR, f"commit-{version:08d}-{fam_tag}-{uuid.uuid4().hex[:8]}"
        )
        commit_dir = os.path.join(self.path, commit_dir_rel)
        if n_partitions:
            df = df.repartition(n_partitions, F.col(BUCKET_COL))
        (
            df.write.mode("error")
            .partitionBy(BUCKET_COL)
            .parquet(commit_dir)
        )
        # event-time column for the manifest pruning statistic (base and
        # folded files only — heavy payload rows carry no event time)
        try:
            stats_ts_col = self.ts_col() if family == "base" else None
        except Exception:  # pre-v0 table state: no stats, never pruned
            stats_ts_col = None
        out: list[DataFile] = []
        for bucket_dir in sorted(os.listdir(commit_dir)):
            if not bucket_dir.startswith(f"{BUCKET_COL}="):
                continue
            bucket = int(bucket_dir.split("=")[1])
            bdir = os.path.join(commit_dir, bucket_dir)
            for fname in sorted(os.listdir(bdir)):
                if not fname.endswith(".parquet"):
                    continue
                fpath = os.path.join(bdir, fname)
                meta = pq.read_metadata(fpath)
                ts_min = ts_max = None
                if stats_ts_col is not None:
                    ts_min, ts_max = _footer_ts_range(meta, stats_ts_col)
                out.append(
                    DataFile(
                        path=os.path.join(commit_dir_rel, bucket_dir, fname),
                        bucket=bucket,
                        rows=meta.num_rows,
                        bytes=os.path.getsize(fpath),
                        schema_version=schema_version,
                        family=family,
                        folded=folded,
                        ts_min=ts_min,
                        ts_max=ts_max,
                    )
                )
        return out

    def commit(
        self,
        new_files: list[DataFile],
        replaced_buckets: set[int],
        batch_ids: list[int],
        metrics: dict[str, Any] | None = None,
        lineage: list[dict] | None = None,
        new_schema: T.StructType | None = None,
        expected_parent: int | None = None,
        new_n_buckets: int | None = None,
        replaced_families: set[str] | None = None,
        heavy_seq_unique: bool | None = None,
    ) -> dict:
        """Commit a copy-on-write snapshot: files in ``replaced_buckets``
        are dropped, ``new_files`` added, everything else carried forward.

        ``replaced_families`` restricts the drop to those column families
        (the MERGE passes {"base"}: a bucket's heavy files are append-only
        and stay referenced). None = all families (full-rewrite ops).

        ``heavy_seq_unique``: the at-most-one-heavy-row-per-_seq invariant
        flag. ``None`` (the safe default) inherits the parent's flag ONLY
        when this commit adds no heavy-family files; a commit that does
        add heavy files must explicitly claim the invariant (engine
        writers — merge, compact, expire, rebucket — pass the parent flag
        because their write sets preserve it) or the flag drops to False
        and reads fall back to the defensive dedup. Nothing verifies an
        explicit True — the caller is asserting its own write discipline.

        Raises CommitConflict if another writer got the version first
        (optimistic concurrency; caller re-reads and retries).
        """
        parent = self.current_snapshot()
        if expected_parent is not None and parent["version"] != expected_parent:
            raise CommitConflict(
                f"expected parent {expected_parent}, found {parent['version']}"
            )
        carried = [
            f
            for f in parent["files"]
            if f["bucket"] not in replaced_buckets
            or (
                replaced_families is not None
                and f.get("family", "base") not in replaced_families
            )
        ]
        schemas = dict(parent["schemas"])
        schema_version = parent["schema_version"]
        if new_schema is not None:
            stored = GinTable._with_internal(new_schema)
            current = T.StructType.fromJson(schemas[str(schema_version)])
            if stored != current:
                schema_version += 1
                schemas[str(schema_version)] = json.loads(stored.json())
        applied = parent["applied_batch_ranges"]
        for bid in batch_ids:
            applied = ranges_add(applied, bid)
        if new_n_buckets is not None and new_n_buckets != parent["n_buckets"]:
            # bucket-count evolution is only sound if EVERY file is rewritten
            # under the new scheme in this same commit (rebucket does this)
            if carried:
                raise ValueError(
                    "n_buckets change requires replacing all buckets "
                    f"({len(carried)} files would be carried forward)"
                )
        snap = {
            "version": parent["version"] + 1,
            "parent": parent["version"],
            "n_buckets": new_n_buckets or parent["n_buckets"],
            "key_col": parent.get("key_col", "url"),
            "ts_col": parent.get("ts_col", "warc_ts"),
            "schema_version": schema_version,
            "schemas": schemas,
            "column_families": parent.get("column_families", {"heavy": []}),
            "heavy_seq_unique": (
                (
                    parent.get("heavy_seq_unique", False)
                    and not any(f.family == "heavy" for f in new_files)
                )
                if heavy_seq_unique is None
                else heavy_seq_unique
            ),
            "files": carried + [f.to_json() for f in new_files],
            "applied_batch_ranges": applied,
            "metrics": metrics or {},
            "lineage": lineage or [],
            "committed_at": datetime.now(timezone.utc).isoformat(),
        }
        self._write_manifest(snap)
        return snap

    def is_batch_applied(self, batch_id: int, snap: dict | None = None) -> bool:
        snap = snap or self.current_snapshot()
        return ranges_contain(snap["applied_batch_ranges"], batch_id)

    # -- maintenance ---------------------------------------------------------

    def history(self) -> list[dict]:
        """All snapshots, oldest first (the run-metadata/status analog of
        the reference's per-run metadata.json, orchestrator.py:78-86)."""
        versions = sorted(
            int(f[1:9])
            for f in os.listdir(self._manifest_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        return [self.snapshot(v) for v in versions]

    def live_files(self) -> set[str]:
        snap = self.current_snapshot()
        return {f["path"] for f in snap["files"]}

    def gc_orphans(
        self, dry_run: bool = True, min_age_seconds: float = 3600.0
    ) -> list[str]:
        """List (and optionally delete) data files referenced by NO
        snapshot — leftovers of crashed commits.

        ``min_age_seconds`` is the concurrent-writer grace window (same idea
        as Iceberg's orphan-file min-age): commits intentionally write data
        files BEFORE their manifest, so a file younger than the window may
        belong to an in-flight commit — deleting it would leave that commit's
        manifest referencing missing files. Files newer than the cutoff are
        never listed, even in dry runs.
        """
        import time as _time

        referenced: set[str] = set()
        for snap in self.history():
            referenced.update(f["path"] for f in snap["files"])
        cutoff = _time.time() - min_age_seconds
        orphans = []
        data_root = os.path.join(self.path, DATA_DIR)
        for root, _dirs, fnames in os.walk(data_root):
            for fname in fnames:
                full = os.path.join(root, fname)
                rel = os.path.relpath(full, self.path)
                if (
                    fname.endswith(".parquet")
                    and rel not in referenced
                    and os.path.getmtime(full) < cutoff
                ):
                    orphans.append(rel)
                    if not dry_run:
                        os.unlink(full)
        return orphans


def table_changes(
    table: "GinTable",
    from_version: int,
    to_version: int | None = None,
    key: str | None = None,
) -> DataFrame:
    """CDC-out: the row-level delta between two snapshots — what a
    downstream incremental consumer reads instead of re-scanning the table
    (the engine's analog of Iceberg's incremental read / changelog scan).

    Returns rows of ``to_version`` state that did not exist at
    ``from_version`` (new/updated winners AND fresh tombstones, flagged by
    ``_change_type`` = upsert|delete). Physical shape: only buckets whose
    base files CHANGED between the snapshots are read on either side
    (manifest diff — work ∝ changed buckets, not table size), then a
    key-only anti-join on (url, _seq, _deleted) removes carried-forward
    rows that merely live in rewritten files.
    """
    snap_to = table.snapshot(to_version) if to_version is not None else table.current_snapshot()
    snap_from = table.snapshot(from_version)
    if key is None:
        key = table.key_col(snap_to)
    if snap_from["version"] > snap_to["version"]:
        raise ValueError(
            f"reversed version range: from={snap_from['version']} > "
            f"to={snap_to['version']} — a reversed range would skip the "
            "expiry check and misreport carried-forward rows as upserts"
        )
    # a tombstone expiry inside the range ERASES delete evidence: a consumer
    # synced before it would silently resurrect deleted rows. Refuse — the
    # consumer must re-sync from a full snapshot (same contract as Iceberg
    # changelog scans across expired snapshots).
    for v in range(snap_from["version"] + 1, snap_to["version"] + 1):
        if table.snapshot(v).get("metrics", {}).get("op") == "expire_tombstones":
            raise ValueError(
                f"version range ({from_version}, {snap_to['version']}] crosses a "
                f"tombstone expiry at v{v}; delete events before it are no "
                "longer representable — re-sync from a full snapshot"
            )

    def base_files(snap):
        return {
            f["path"]: f for f in snap["files"] if f.get("family", "base") == "base"
        }

    f_from, f_to = base_files(snap_from), base_files(snap_to)
    changed_buckets = {
        f["bucket"]
        for p, f in f_to.items()
        if p not in f_from
    } | {
        f["bucket"]
        for p, f in f_from.items()
        if p not in f_to
    }
    if not changed_buckets:
        schema = table.schema(snap_to, include_internal=True)
        empty = table.spark.createDataFrame([], schema)
        return empty.withColumn("_change_type", F.lit("upsert")).limit(0)

    new_state = table.read(snap_to, buckets=changed_buckets, include_internal=True)
    old_keys = table.read(
        snap_from, buckets=changed_buckets, include_internal=True,
        include_heavy=False,
    ).select(key, SEQ_COL, DELETED_COL)
    delta = new_state.join(old_keys, [key, SEQ_COL, DELETED_COL], "left_anti")
    # the join moved its keys to the front — restore canonical schema order
    delta = delta.select(
        *[f.name for f in table.schema(snap_to, include_internal=True).fields]
    )
    return delta.withColumn(
        "_change_type",
        F.when(F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("delete"))
        .otherwise(F.lit("upsert")),
    )
