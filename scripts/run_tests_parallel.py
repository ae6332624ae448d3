#!/usr/bin/env python
"""Sharded parallel test runner: the full suite, identical coverage,
under 8 minutes wall (pytest-xdist is not available in this
environment, so sharding happens at the process level).

Four pytest processes run concurrently, each over a disjoint set of
test modules (balanced by measured wall time), each with its own
SparkSession (8 cores / shard on the 32-core host) and its own
warehouse dir (managed tables in catalog/bucketing tests must not
collide). Exit status is non-zero if any shard fails; per-shard tails
are printed on failure.

Usage: python scripts/run_tests_parallel.py [extra pytest args...]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# balanced by the round-7 serial profile (test_corpus ~180s is the
# anchor; everything else packs around it)
SHARDS: list[list[str]] = [
    ["tests/test_corpus.py"],
    [
        "tests/test_operators.py",
        "tests/test_vectors.py",
        "tests/test_exact_sums.py",
        "tests/test_multimodal.py",
    ],
    [
        "tests/test_plans.py",
        "tests/test_stats_reference.py",
        "tests/test_streaming.py",
    ],
    [
        "tests/test_pipeline.py",
        "tests/test_eventlog.py",
        "tests/test_dicom_codec.py",
        "tests/test_catalog.py",
        "tests/test_ingest.py",
        "tests/test_deid.py",
        "tests/test_purge.py",
        "tests/test_cloud.py",
        "tests/test_codec_properties.py",
    ],
]


def main() -> int:
    extra = sys.argv[1:]
    # completeness guard: every test module must be in exactly one shard
    listed = {p for shard in SHARDS for p in shard}
    on_disk = {
        f"tests/{f}"
        for f in os.listdir(os.path.join(REPO, "tests"))
        if f.startswith("test_") and f.endswith(".py")
    }
    missing = sorted(on_disk - listed)
    if missing:
        print(f"unsharded test modules (add to SHARDS): {missing}", file=sys.stderr)
        return 2
    ghost = sorted(listed - on_disk)
    if ghost:
        print(f"sharded modules not on disk: {ghost}", file=sys.stderr)
        return 2

    t0 = time.perf_counter()
    procs = []
    for i, shard in enumerate(SHARDS):
        log = tempfile.NamedTemporaryFile(
            mode="w+", prefix=f"pytest_shard{i}_", suffix=".log", delete=False
        )
        env = dict(os.environ)
        env["SPARK_GRAFT_TEST_CPUS"] = "8"
        env["SPARK_GRAFT_TEST_WAREHOUSE"] = tempfile.mkdtemp(
            prefix=f"shard{i}_warehouse_"
        )
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", *shard, *extra],
            cwd=REPO,
            env=env,
            stdout=log,
            stderr=subprocess.STDOUT,
        )
        procs.append((i, shard, p, log))

    rc = 0
    for i, shard, p, log in procs:
        code = p.wait()
        log.flush()
        log.seek(0)
        tail = log.read().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        print(f"shard {i} [{', '.join(shard)}]: exit {code} — {summary}")
        if code != 0:
            rc = 1
            print(f"--- shard {i} tail ({log.name}) ---")
            print("\n".join(tail[-40:]))
    dt = time.perf_counter() - t0
    print(f"total wall: {dt:.1f}s ({dt / 60:.1f} min)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
