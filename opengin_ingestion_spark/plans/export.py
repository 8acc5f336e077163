"""Export sinks (reference S6-S9 parity): CSV per table + JSON metadata
sidecar + idempotent collision-free naming + zip-archive packaging.

Reference behavior: one CSV per aggregated table via csv.writer
(exporter.py:71-84), `{table}_metadata.json` sidecars (exporter.py:88-96),
collision-counter filenames so re-export never overwrites
(exporter.py:59-69), and whole-run zip packaging for download
(/root/reference/python/src/opengin/server/api.py:284-317). Spark-native:
`df.write.csv` per table (distributed write, then single-file promote for
small exports), sidecars written by the driver, the collision counter
preserved verbatim, and the zip step as a library function over a
completed export directory (the HTTP serving layer is out of scope; the
packaging is not).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame

from opengin_ingestion_spark.operators.validate import is_safe_path


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


def export_zip(export_dir: str, out_dir: str, name: str = "run") -> str:
    """Package a completed export directory as ONE zip archive — the
    library form of the reference's download-all endpoint
    (/root/reference/python/src/opengin/server/api.py:284-317:
    shutil.make_archive over the run directory, relative member names).

    Collision-free like every other sink here (`run.zip`, `run_1.zip`,
    ...), built in a temp file and atomically renamed into place so a
    crash never publishes a torn archive. ``export_dir`` must not escape
    into ``out_dir``'s parent via symlinks (is_safe_path containment on
    the resolved path of every member — the reference's P9 predicate
    applied at packaging time).

    Returns the zip path. Driver-side by design: the inputs are the
    export's final (small) CSV/sidecar artifacts — bulk data exports stay
    in distributed parquet/CSV-part form and are never zipped.
    """
    import zipfile

    if not os.path.isdir(export_dir):
        raise FileNotFoundError(f"no export directory at {export_dir}")
    os.makedirs(out_dir, exist_ok=True)
    real_root = os.path.realpath(export_dir)
    # out_dir inside export_dir would make the growing .tmp archive get
    # picked up by its own os.walk and zipped into itself (it WOULD pass
    # the member containment check — it resolves inside the tree)
    if is_safe_path(real_root, os.path.realpath(out_dir)):
        raise ValueError(
            f"out_dir {out_dir} is inside export_dir {export_dir}: "
            "the archive would include itself"
        )
    zip_path = _collision_free(os.path.join(out_dir, name), ".zip")
    tmp = zip_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(export_dir):
            for fname in sorted(files):
                full = os.path.join(root, fname)
                # a symlinked member pointing outside the export tree
                # must not be packaged (path-containment check on the
                # RESOLVED path — reference api.py:235-249 semantics)
                if not is_safe_path(real_root, full):
                    raise ValueError(
                        f"refusing to package {full}: resolves outside "
                        f"the export directory {export_dir}"
                    )
                zf.write(full, os.path.relpath(full, export_dir))
    os.replace(tmp, zip_path)
    return zip_path
