"""npz corpus debugger (mirrors inactive/debug.py): diagnoses dataset-dir
typos and prints the keys/shapes of the first clip found."""

from __future__ import annotations

import glob
import os

import numpy as np

CANDIDATE_DIRS = ["clips_npz", "clipes_npz", "clip_npz", "clips"]


def try_dir(d: str) -> bool:
    paths = sorted(glob.glob(os.path.join(d, "*.npz")))
    print(f"{d}: {len(paths)} npz files")
    if not paths:
        return False
    with np.load(paths[0], allow_pickle=False) as z:
        print(" first:", os.path.basename(paths[0]))
        for k in z.files:
            v = z[k]
            shape = getattr(v, "shape", ())
            print(f"   {k}: shape={shape} dtype={getattr(v, 'dtype', type(v))}")
    return True


def main(clip_dir: str = "clips_npz"):
    dirs = [clip_dir] + [d for d in CANDIDATE_DIRS if d != clip_dir]
    for d in dirs:
        if try_dir(d):
            return 0
    print("no clips found in any candidate directory")
    return 1
