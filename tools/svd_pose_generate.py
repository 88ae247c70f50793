#!/usr/bin/env python
"""SVD pose canonicalization (reference: svd_pose_generate.py:55-75):
rotate each cloud into its SVD-canonical frame with sign disambiguation, to
generate the ``*_svd_pose`` dataset variants.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def global_transform(pc: np.ndarray) -> np.ndarray:
    """Rotate to the principal frame; each axis's sign is chosen so the
    heavier side of the point mass is positive (deterministic canonical pose,
    svd_pose_generate.py:55-75)."""
    xyz = pc[:, :3]
    centered = xyz - xyz.mean(0, keepdims=True)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    rot = vt.T                                             # (3, 3)
    aligned = centered @ rot
    signs = np.sign(np.sum(aligned ** 3, axis=0))
    signs[signs == 0] = 1.0
    aligned = aligned * signs
    if pc.shape[1] > 3:                                    # rotate normals too
        normals = pc[:, 3:6] @ rot * signs
        return np.concatenate([aligned, normals, pc[:, 6:]], axis=1)
    return aligned


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="dir of .npy clouds")
    p.add_argument("--dst", required=True, help="output dir")
    args = p.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    n = 0
    for root, _, files in os.walk(args.src):
        for fn in files:
            if not fn.endswith(".npy"):
                continue
            rel = os.path.relpath(os.path.join(root, fn), args.src)
            out = os.path.join(args.dst, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            np.save(out, global_transform(
                np.load(os.path.join(root, fn)).astype(np.float32)))
            n += 1
    print(f"canonicalized {n} clouds -> {args.dst}")


if __name__ == "__main__":
    main()
