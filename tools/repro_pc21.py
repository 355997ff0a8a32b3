"""Minimal repro for the pair_chunk=21 axon-platform fault.

Round 3's tiling re-sweep found that `run_sequence_batched` with
`pair_chunk=21` reproducibly faults the remote TPU ("axon") platform
inside the pure-XLA RANSAC consumer — the process dies inside the
runtime, not in Python (docs/KNOWN_ISSUES.md #1). The production tiling
pc=9 and every other swept value (1..16, 32, 63) are fine. The fault is
shape-dependent, not data-dependent: random frames reproduce it.

This script re-runs the faulting program in a bounded subprocess so it
can be probed safely after platform/toolchain updates:

    python tools/repro_pc21.py            # probe pc=21 (expected: FAULT)
    python tools/repro_pc21.py --pc 9     # control   (expected: OK)

Exit code 0 = program completed (fault gone / control OK); 1 = the
subprocess died or hung (fault still present). `run_sequence_batched`
refuses pair_chunk values in KNOWN_FAULTING_PAIR_CHUNKS on TPU unless
TPU_VO_ALLOW_FAULTING_TILINGS=1, so users cannot hit this from the
public API by accident (pipeline/runner.py:_validate_chunks).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

# Templated with str.format on a placeholder no future edit can collide
# with (a blind "PC" substring replace once risked corrupting the code).
_CHILD_CODE = r"""
import numpy as np
import jax
from tpu_vo.configs import ORBConfig, VOConfig
from tpu_vo.pipeline.runner import run_sequence_batched

T, W, H = 64, 1241, 376
frames = np.random.default_rng(0).integers(0, 256, (T, H, W), np.uint8)
cfg = VOConfig(image_width=W, image_height=H, orb=ORBConfig(n_features=1200))
run = jax.jit(lambda f: run_sequence_batched(
    f, cfg, frame_chunk=8, pair_chunk={PAIR_CHUNK}))
out = run(jax.device_put(frames))
np.asarray(out[0].t)  # block
print("CHILD_OK")
"""


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pc", type=int, default=21,
                   help="pair_chunk to probe (21 = the faulting tiling)")
    p.add_argument("--timeout", type=int, default=600)
    args = p.parse_args(argv)

    code = ("import os\n"
            "os.environ['TPU_VO_ALLOW_FAULTING_TILINGS'] = '1'\n"
            + _CHILD_CODE.format(PAIR_CHUNK=args.pc))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True,
                           timeout=args.timeout)
    except subprocess.TimeoutExpired:
        print(f"pc={args.pc}: HUNG after {args.timeout}s (fault present)")
        return 1
    ok = r.returncode == 0 and "CHILD_OK" in r.stdout
    if ok:
        print(f"pc={args.pc}: OK (program completed)")
        return 0
    tail = (r.stderr or r.stdout).strip().splitlines()[-5:]
    print(f"pc={args.pc}: FAULT (rc={r.returncode})")
    for line in tail:
        print("  " + line)
    return 1


if __name__ == "__main__":
    sys.exit(main())
