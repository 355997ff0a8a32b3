"""Generate a synthetic VO dataset (PNG frames + ground-truth poses).

Usage: python tools/make_synthetic_dataset.py OUT_DIR [--frames N]
       [--width W] [--height H] [--seed S]

Writes zero-padded PNGs (the reference's dataset layout), a TUM-format
ground-truth trajectory, and K.txt with the rendering intrinsics.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scene", choices=["corridor", "planes"],
                   default="corridor",
                   help="corridor = well-conditioned forward motion "
                        "(strong parallax; the accuracy benchmark scene); "
                        "planes = the legacy weak-parallax two-plane scene")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from tpu_vo.geometry.se3 import Pose
    from tpu_vo.io.trajectory_io import save_trajectory_tum
    from tpu_vo.utils.synthetic import (
        make_corridor_sequence,
        make_sequence,
        write_dataset,
    )

    gen = make_corridor_sequence if args.scene == "corridor" else make_sequence
    frames, Rs, ts, K = gen(
        n_frames=args.frames, width=args.width, height=args.height,
        seed=args.seed,
    )
    write_dataset(args.out_dir, frames)
    poses = Pose(jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts)))
    save_trajectory_tum(os.path.join(args.out_dir, "groundtruth_tum.txt"),
                        poses)
    np.savetxt(os.path.join(args.out_dir, "K.txt"), K)
    print(f"wrote {args.frames} frames ({args.width}x{args.height}) + "
          f"groundtruth to {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
