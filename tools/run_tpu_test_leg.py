"""Run the TPU test leg and record a checkable artifact (VERDICT r3 #7).

The CPU suite self-skips the TPU-gated tests (ApproxTopK semantics, real
Mosaic lowering/execution sweeps — tests/conftest.py); their passing
state previously existed only in unrecorded builder sessions. This tool
runs the FULL suite on the chip (`TPU_VO_TEST_TPU=1`, nightly tests
included via `-m ""`) and writes benchmarks/tpu_test_log.json with:

  - pass/fail/skip counts and failed test ids,
  - wall time, date, git revision,
  - a content hash over the kernel sources + TPU-gated test files the
    leg covers (KERNEL_COVERAGE_FILES).

tests/test_api.py::test_tpu_leg_artifact_fresh recomputes that hash in
the CPU suite and fails when the kernels changed after the recorded leg
— so a stale artifact cannot silently stand in for a re-run.

Usage (on the TPU host): python tools/run_tpu_test_leg.py
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The sources whose behavior the TPU leg uniquely certifies: Pallas
# kernels + their routing + the TPU-gated tests themselves. Changing any
# of these invalidates the artifact (the CPU freshness test enforces it).
KERNEL_COVERAGE_FILES = [
    "tpu_vo/ops/select_pallas.py",
    "tpu_vo/ops/patch_pallas.py",
    "tpu_vo/ops/fast_pallas.py",
    "tpu_vo/features/fast.py",
    "tpu_vo/features/orb.py",
    "tpu_vo/features/patches.py",
    "tpu_vo/image/pyramid.py",
    "tests/test_stage1_approx.py",
    "tests/test_pallas_shapes.py",
    "tests/test_pallas_ops.py",
    "tests/conftest.py",
]


def coverage_hash() -> str:
    h = hashlib.sha256()
    for rel in KERNEL_COVERAGE_FILES:
        p = os.path.join(ROOT, rel)
        h.update(rel.encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def main(argv=None):
    env = dict(os.environ)
    env["TPU_VO_TEST_TPU"] = "1"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "",
         "--tb=line"],
        cwd=ROOT, env=env, capture_output=True, text=True,
        timeout=3 * 3600)
    wall = time.time() - t0
    tail = r.stdout.strip().splitlines()
    summary = tail[-1] if tail else ""
    counts = {k: int(v) for v, k in re.findall(
        r"(\d+) (passed|failed|skipped|deselected|error)", summary)}
    failed = [ln.split(" ")[0] for ln in tail if ln.startswith("FAILED")]
    skip_reasons: dict = {}
    for ln in tail:
        m = re.match(r"SKIPPED \[\d+\] .*?: (.*)", ln)
        if m:
            skip_reasons[m.group(1)] = skip_reasons.get(m.group(1), 0) + 1

    rev = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                         capture_output=True, text=True).stdout.strip()
    out = {
        "date": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "git_rev": rev,
        "backend": "tpu (TPU_VO_TEST_TPU=1, -m '' so nightly included)",
        "returncode": r.returncode,
        "wall_seconds": round(wall, 1),
        "summary_line": summary,
        "counts": counts,
        "failed": failed,
        "kernel_coverage_hash": coverage_hash(),
        "kernel_coverage_files": KERNEL_COVERAGE_FILES,
    }
    path = os.path.join(ROOT, "benchmarks", "tpu_test_log.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("summary_line", "returncode", "wall_seconds")}))
    print("wrote", path)
    return 0 if r.returncode == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
