"""Interleaved revision A/B for the scaling question (round-3 VERDICT #3).

Round-3 sessions measured local[8] replay at 32-46s while the history best
is ~14s — every session sat in a degraded hypervisor window, but no session
interleaved OLD code with NEW code in the same minutes, so "environment,
not code" remained an inference. This script makes it a measurement:

  * ONE 4M-event change log (generated once, /dev/shm),
  * child replays alternate A/B/A/B between the round-2 tag (a git
    worktree) and current HEAD — same minutes, same input, same JVM conf,
  * each child is the UNMODIFIED ``bench_scaling.py --child`` of its own
    revision (subprocess cwd selects the import root).

If the two revisions' best times agree within noise while both drift with
the host's waves, the slowdown is environmental; a systematic gap names a
code regression to bisect.

Usage: python ab_scaling.py [--events 4000000] [--runs 2] [--pairs 3]
       [--old /tmp/r2wt] [--levels 8[,2]]
Writes BENCH/ab_revisions.jsonl (one line per child) + prints a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from datetime import datetime, timezone


def main() -> None:
    events = 4_000_000
    runs = 2
    pairs = 3
    old_root = "/tmp/r2wt"
    levels = [8]
    a = sys.argv
    if "--events" in a:
        events = int(a[a.index("--events") + 1])
    if "--runs" in a:
        runs = int(a[a.index("--runs") + 1])
    if "--pairs" in a:
        pairs = int(a[a.index("--pairs") + 1])
    if "--old" in a:
        old_root = a[a.index("--old") + 1]
    if "--levels" in a:
        levels = [int(x) for x in a[a.index("--levels") + 1].split(",")]

    new_root = os.path.dirname(os.path.abspath(__file__))

    def rev_of(root: str) -> str:
        return (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, cwd=root,
            ).stdout.strip()
            or "?"
        )

    revs = {"old": rev_of(old_root), "new": rev_of(new_root)}

    from opengin_ingestion_spark.sources.changelog import (
        ChangeLogSpec,
        generate_changelog,
    )

    base = tempfile.mkdtemp(
        prefix="ab_log_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    log_dir = os.path.join(base, "log")
    spec = ChangeLogSpec(
        n_events=events, n_urls=max(1000, int(events * 0.8)),
        n_batches=32, seed=42,
    )
    print(f"generating {events} events ...", flush=True)
    generate_changelog(log_dir, spec)

    hist = "BENCH/ab_revisions.jsonl"
    os.makedirs("BENCH", exist_ok=True)

    def run_child(root: str, tag: str, cpus: int) -> dict:
        env = dict(os.environ)
        env.setdefault("SPARK_DRIVER_MEMORY", "40g")
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.join(root, "bench_scaling.py"),
             "--child", str(cpus), log_dir, str(runs)],
            capture_output=True, text=True, cwd=root, timeout=3600, env=env,
        )
        lines = [
            ln for ln in out.stdout.splitlines()
            if ln.startswith("CHILD_RESULT ")
        ]
        if not lines:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
            raise RuntimeError(f"{tag} local[{cpus}] child produced no result")
        res = json.loads(lines[0][len("CHILD_RESULT "):])
        rec = {
            "measured_at": datetime.now(timezone.utc).isoformat(),
            "tag": tag,
            "rev": revs[tag],
            "cpus": cpus,
            "wall_sec": round(time.time() - t0, 1),
            **res,
        }
        with open(hist, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        return rec

    results: list[dict] = []
    try:
        for cpus in levels:
            for _ in range(pairs):
                results.append(run_child(old_root, "old", cpus))
                results.append(run_child(new_root, "new", cpus))
    finally:
        shutil.rmtree(base, ignore_errors=True)

    summary = {}
    for cpus in levels:
        for tag in ("old", "new"):
            times = [
                t for r in results
                if r["tag"] == tag and r["cpus"] == cpus
                for t in r["times"]
            ]
            if times:
                summary[f"{tag}_local{cpus}"] = {
                    "rev": revs[tag],
                    "best_sec": min(times),
                    "median_sec": sorted(times)[len(times) // 2],
                    "all": times,
                }
    print("AB_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
