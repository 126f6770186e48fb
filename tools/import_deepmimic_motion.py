#!/usr/bin/env python3
"""Convert DeepMimic motion-capture JSON files to the npz format shipped in
``pfpn_tpu/envs/data/motions/``.

DeepMimic mocap format (SURVEY.md §2, reference envs/deepmimic.py:39-68):
JSON with keys "Frames" (list of 44-float rows: [dt, base_pos(3),
base_quat wxyz(4), 12 joint rotations]), "Loop" ("wrap"|"none") and
"ContactableBodies" (link names allowed to touch the ground).

Usage:
  python tools/import_deepmimic_motion.py <in.txt> [<in2.txt> ...] -o OUTDIR

The npz stores the *raw* frames; all processing (quaternion reorder, velocity
finite differences, Butterworth filtering) happens in pfpn_tpu.mocap.loader.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import os

import numpy as np


def convert(path: str, outdir: str) -> str:
    with open(path) as f:
        data = json.load(f)
    frames = np.asarray(data["Frames"], dtype=np.float64)
    loop = data.get("Loop", "wrap")
    contactable = data.get("ContactableBodies", None)
    name = os.path.splitext(os.path.basename(path))[0]
    out = os.path.join(outdir, name + ".npz")
    np.savez(
        out,
        frames=frames,
        loop=np.array(loop),
        contactable=np.array(contactable if contactable is not None else [],
                             dtype=object),
        has_contactable=np.array(contactable is not None),
    )
    print(f"{path} -> {out} ({frames.shape[0]} frames)")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-o", "--outdir", required=True)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    for p in args.inputs:
        convert(p, args.outdir)
