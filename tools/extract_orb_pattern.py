"""Recover the standard ORB rBRIEF 256-pair sampling pattern from cv2.

The pattern (OpenCV's learned bit_pattern_31, from the ORB paper) is a
fixed public constant, but this environment has no network access and the
reference repo does not contain it. We recover it exactly by probing
cv2.ORB.compute's public behavior:

  - Descriptor bit b for a keypoint at angle 0 is [I_blur(p_2b) < I_blur(p_2b+1)]
    where p are fixed integer offsets from the keypoint.
  - Probe with 31x31 = 961 "hot pixel" images (single bright pixel inside
    the patch). The blurred value at any patch offset is *exactly*
    predictable from cv2.GaussianBlur of a delta image.
  - Each (first, second) offset pair therefore has a deterministic
    961-bit signature across the probes; matching observed signatures to
    predicted ones identifies all 256 pairs uniquely.

Writes tpu_vo/features/_orb_pattern.py with the recovered table and
verifies the result by reproducing cv2 descriptors on random images.
"""

import numpy as np
import cv2

R = 15          # search offsets in [-R, R]^2
CENTER = 64
IMG = 128


def make_orb():
    return cv2.ORB_create(
        nfeatures=500, scaleFactor=1.2, nlevels=8, edgeThreshold=31,
        firstLevel=0, WTA_K=2, scoreType=cv2.ORB_HARRIS_SCORE,
        patchSize=31, fastThreshold=10,
    )


def keypoint():
    return cv2.KeyPoint(
        float(CENTER), float(CENTER), 31.0, 0.0, 100.0, 0, -1
    )


def main():
    orb = make_orb()
    kp = [keypoint()]

    offsets = [(ox, oy) for oy in range(-R, R + 1) for ox in range(-R, R + 1)]
    n = len(offsets)
    off_index = {o: i for i, o in enumerate(offsets)}

    # Two probe families: a bright pixel on black localizes the *second*
    # point of a pair (bit flips to 1 near it); a dark pixel on white
    # localizes the *first* (bit is 1 only away from it). Exact blurred
    # responses come from cv2 itself (translation-invariant interior).
    delta = np.zeros((IMG, IMG), dtype=np.uint8)
    delta[CENTER, CENTER] = 255
    D_b = cv2.GaussianBlur(delta, (7, 7), 2,
                           borderType=cv2.BORDER_REFLECT_101).astype(np.int32)
    delta_d = np.full((IMG, IMG), 255, dtype=np.uint8)
    delta_d[CENTER, CENTER] = 0
    D_d = cv2.GaussianBlur(delta_d, (7, 7), 2,
                           borderType=cv2.BORDER_REFLECT_101).astype(np.int32)

    # V[h, p] = predicted blurred intensity at patch offset p for probe h.
    V_b = np.zeros((n, n), dtype=np.int32)
    V_d = np.full((n, n), 255, dtype=np.int32)
    for hi, (hx, hy) in enumerate(offsets):
        for pi, (px, py) in enumerate(offsets):
            dy, dx = py - hy, px - hx
            if abs(dy) <= 3 and abs(dx) <= 3:
                V_b[hi, pi] = D_b[CENTER + dy, CENTER + dx]
                V_d[hi, pi] = D_d[CENTER + dy, CENTER + dx]
    V = np.concatenate([V_b, V_d], axis=0)  # (2n, n)

    # Observe cv2 descriptors for each probe.
    obs = np.zeros((2 * n, 256), dtype=bool)
    for hi, (hx, hy) in enumerate(offsets):
        img = np.zeros((IMG, IMG), dtype=np.uint8)
        img[CENTER + hy, CENTER + hx] = 255
        _, desc = orb.compute(img, kp)
        assert desc is not None and desc.shape == (1, 32), f"probe {hi} failed"
        obs[hi] = np.unpackbits(desc[0], bitorder="little").astype(bool)

        img_d = np.full((IMG, IMG), 255, dtype=np.uint8)
        img_d[CENTER + hy, CENTER + hx] = 0
        _, desc = orb.compute(img_d, kp)
        assert desc is not None and desc.shape == (1, 32), f"probe {hi}d failed"
        obs[n + hi] = np.unpackbits(desc[0], bitorder="little").astype(bool)

    # Signatures: predicted bit sequences over all probes for each pair.
    obs_packed = np.packbits(obs.T, axis=1)  # (256, ceil(n/8))
    sig_to_bit = {}
    for k in range(256):
        sig_to_bit.setdefault(obs_packed[k].tobytes(), []).append(k)

    pairs = [None] * 256
    for i in range(n):
        pred = V[:, i:i + 1] < V  # (h, j): bit for pair (first=i, second=j)
        packed = np.packbits(pred.T, axis=1)  # (j, bytes)
        for j in range(n):
            key = packed[j].tobytes()
            if key in sig_to_bit:
                for k in sig_to_bit[key]:
                    if pairs[k] is None:
                        pairs[k] = (offsets[i], offsets[j])
                    else:
                        # Ambiguity: multiple pairs share a signature.
                        print(f"WARNING bit {k}: ambiguous pair "
                              f"{pairs[k]} vs {(offsets[i], offsets[j])}")

    missing = [k for k in range(256) if pairs[k] is None]
    assert not missing, f"unresolved bits: {missing}"

    # Flatten to the OpenCV layout: 512 points, pair 2k/2k+1 per bit.
    flat = []
    for k in range(256):
        (x0, y0), (x1, y1) = pairs[k]
        flat.append((x0, y0))
        flat.append((x1, y1))

    # Verification: reproduce cv2 descriptors on random images. ORB's
    # internal GaussianBlur of the pyramid submat can differ by +-1 from an
    # external GaussianBlur call at exact-half rounding boundaries, so a
    # mismatching bit is only a pattern error if the blurred values differ
    # by more than 1.
    rng = np.random.default_rng(0)
    total_mismatch = 0
    for trial in range(20):
        img = rng.integers(0, 256, size=(IMG, IMG), dtype=np.uint8)
        blur = cv2.GaussianBlur(img, (7, 7), 2,
                                borderType=cv2.BORDER_REFLECT_101).astype(int)
        _, desc = orb.compute(img, kp)
        bits_cv = np.unpackbits(desc[0], bitorder="little")
        for k in range(256):
            v0 = blur[CENTER + flat[2 * k][1], CENTER + flat[2 * k][0]]
            v1 = blur[CENTER + flat[2 * k + 1][1], CENTER + flat[2 * k + 1][0]]
            pred = int(v0 < v1)
            if pred != bits_cv[k]:
                total_mismatch += 1
                # Each of the two samples can wobble by 1, so a flip is
                # only evidence of a wrong pair when |v0 - v1| > 2.
                assert abs(v0 - v1) <= 2, (
                    f"trial {trial} bit {k}: real pattern error "
                    f"(vals {v0} vs {v1})"
                )
    print(f"verification: 20 random images, {total_mismatch} near-tie bit "
          f"flips (blur rounding), 0 genuine pattern errors")
    print("first 8 pairs:", [(flat[2*k], flat[2*k+1]) for k in range(8)])

    xs = [p[0] for p in flat]
    ys = [p[1] for p in flat]
    with open("tpu_vo/features/_orb_pattern.py", "w") as f:
        f.write('"""ORB rBRIEF sampling pattern (the standard public 256-pair\n')
        f.write("table from the ORB paper / OpenCV), recovered by probing cv2's\n")
        f.write("public descriptor behavior — see tools/extract_orb_pattern.py.\n")
        f.write('Layout: PATTERN_X/Y[2k], PATTERN_X/Y[2k+1] are the two sample\n')
        f.write('offsets of descriptor bit k (byte k//8, bit k%8).\n"""\n\n')
        f.write(f"PATTERN_X = {xs}\n\n")
        f.write(f"PATTERN_Y = {ys}\n")
    print(f"wrote tpu_vo/features/_orb_pattern.py "
          f"(x range [{min(xs)},{max(xs)}], y range [{min(ys)},{max(ys)}])")


if __name__ == "__main__":
    main()
