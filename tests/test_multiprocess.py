"""Multi-process distributed path (VERDICT r4 missing #3 / next #7).

parallel/distributed.py backs the DCN/pod story, but until round 5 no
test ever ran TWO JAX PROCESSES: the dryrun is single-process over 8
virtual devices. This nightly test launches two coordinated CPU
processes (jax.distributed.initialize against a localhost coordinator,
4 virtual devices each -> an 8-device global mesh), runs the DP batch
runner on a (8, T) batch sharded across both processes' devices, and
asserts the result equals a single-process 8-device run of the same
frames — the cross-process placement must be invisible to the math.

Every child pops PALLAS_AXON_POOL_IPS (the TPU chip is single-user;
a stray tunnel acquisition can hang for minutes) and runs f32 on CPU.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={ndev}"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join({root!r}, "tests", ".jax_cache"))
import numpy as np
import jax

pid = {pid}
if {nproc} > 1:
    from tpu_vo.parallel.distributed import initialize
    initialize(coordinator_address="localhost:{port}",
               num_processes={nproc}, process_id=pid)
assert jax.process_count() == {nproc}, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from tpu_vo.configs import MatchConfig, ORBConfig, RansacConfig, VOConfig
from tpu_vo.parallel.mesh import make_mesh
from tpu_vo.parallel import sharding as sh

cfg = VOConfig(image_width=128, image_height=96,
               orb=ORBConfig(n_features=64, n_levels=2,
                             per_level_capacity=256),
               match=MatchConfig(), ransac=RansacConfig(max_iters=8))
B, T = 8, 3
rng = np.random.default_rng(0)
frames = rng.integers(0, 255, size=(B, T, 96, 128), dtype=np.uint8)
seeds = np.arange(B, dtype=np.uint32)

mesh = make_mesh((8, 1), ("data", "seq"), devices=jax.devices())
spec = NamedSharding(mesh, P("data"))
lo, hi = pid * (B // {nproc}), (pid + 1) * (B // {nproc})
gframes = jax.make_array_from_process_local_data(spec, frames[lo:hi],
                                                 frames.shape)
gseeds = jax.make_array_from_process_local_data(spec, seeds[lo:hi],
                                                seeds.shape)
fn = sh._batch_runner(cfg, mesh, None, None)
poses, diags = fn(gframes, gseeds)
jax.block_until_ready(poses)

shards = sorted(poses.t.addressable_shards, key=lambda s: s.index[0].start)
local_t = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
rows = sorted(set(s.index[0].start for s in poses.t.addressable_shards))
np.savez({out!r}, t=local_t, rows=np.asarray(rows))
print("CHILD_DONE", pid, local_t.shape)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(tmpdir, pid, nproc, port, ndev):
    out = os.path.join(tmpdir, f"proc{pid}_of_{nproc}.npz")
    code = _CHILD.format(pid=pid, nproc=nproc, port=port, ndev=ndev,
                         out=out, root=ROOT)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = ROOT
    proc = subprocess.Popen([sys.executable, "-c", code], env=env, cwd=ROOT,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    return proc, out


@pytest.mark.nightly
def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    # two coordinated processes, 4 virtual devices each
    procs = [_spawn(str(tmp_path), pid, 2, port, 4) for pid in range(2)]
    # single-process 8-device reference on the same frames/seeds
    ref_proc, ref_out = _spawn(str(tmp_path), 0, 1, _free_port(), 8)

    outs = {}
    for proc, out in procs + [(ref_proc, ref_out)]:
        stdout, _ = proc.communicate(timeout=1200)
        assert proc.returncode == 0, f"child failed:\n{stdout[-3000:]}"
        assert "CHILD_DONE" in stdout
        outs[out] = np.load(out)

    ref = outs[ref_out]
    assert ref["t"].shape == (8, 3, 3)
    for (_, out), pid in zip(procs, range(2)):
        d = outs[out]
        rows = d["rows"]
        np.testing.assert_array_equal(rows, np.arange(pid * 4, pid * 4 + 4))
        np.testing.assert_allclose(d["t"], ref["t"][rows], atol=1e-4)
