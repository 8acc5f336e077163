"""Export sinks (reference S6-S8 parity): CSV per table + JSON metadata
sidecar + idempotent collision-free naming.

Reference behavior: one CSV per aggregated table via csv.writer
(exporter.py:71-84), `{table}_metadata.json` sidecars (exporter.py:88-96),
and collision-counter filenames so re-export never overwrites
(exporter.py:59-69). Spark-native: `df.write.csv` per table (distributed
write, then single-file promote for small exports), sidecars written by
the driver, and the collision counter preserved verbatim.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame


def _collision_free(path_base: str, ext: str) -> str:
    """exporter.py:59-69 semantics: name, name_1, name_2, ..."""
    candidate = f"{path_base}{ext}"
    n = 0
    while os.path.exists(candidate):
        n += 1
        candidate = f"{path_base}_{n}{ext}"
    return candidate


def export_csv(
    df: DataFrame,
    out_dir: str,
    name: str,
    metadata: dict | None = None,
    single_file: bool = True,
) -> dict:
    """Write one table as CSV (+ optional metadata sidecar). Returns
    {"csv": path, "metadata": path|None}.

    ``single_file=True`` coalesces to one part and promotes it to
    `{name}.csv` (small exports, reference-identical layout);
    ``single_file=False`` leaves a directory of parts (the scale path —
    a 100 TB export should never single-file)."""
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.join(out_dir, name)
    csv_path = _collision_free(base, ".csv")
    if single_file:
        tmp = csv_path + ".tmpdir"
        df.coalesce(1).write.option("header", True).mode("overwrite").csv(tmp)
        part = next(
            f for f in sorted(os.listdir(tmp)) if f.startswith("part-") and f.endswith(".csv")
        )
        shutil.move(os.path.join(tmp, part), csv_path)
        shutil.rmtree(tmp)
    else:
        df.write.option("header", True).mode("error").csv(csv_path)
    meta_path = None
    if metadata is not None:
        meta_path = _collision_free(
            os.path.join(out_dir, f"{name}_metadata"), ".json"
        )
        with open(meta_path, "w") as fh:
            json.dump(metadata, fh)
    return {"csv": csv_path, "metadata": meta_path}
