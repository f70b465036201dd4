"""npz corpus debugger (mirrors inactive/debug.py): diagnoses dataset-dir
typos and prints the keys/shapes of the first clip of every candidate
directory, reference output format. One conscious change: clips load with
allow_pickle=False (the reference's allow_pickle=True would execute code
from a malicious object array at load time)."""

from __future__ import annotations

import glob
import os

import numpy as np

# the reference's typo candidates (inactive/debug.py:5-10) plus the param dir
CANDIDATE_DIRS = ["clipes_npz", "clips_npz", "./clipes_npz", "./clips_npz"]


def try_dir(d: str) -> int:
    paths = sorted(glob.glob(os.path.join(d, "*.npz")))
    print(f"\nDIR='{d}' -> {len(paths)} npz files")
    if paths:
        print("  first 5:", [os.path.basename(p) for p in paths[:5]])
        with np.load(paths[0], allow_pickle=False) as z:
            keys = list(z.keys())
            print("  loaded sample OK. keys:", keys)
            if "X" in z:
                print("  X shape:", z["X"].shape, "dtype:", z["X"].dtype)
            if "label" in z:
                print("  label:", str(z["label"]))
    return len(paths)


def main(clip_dir: str = "clips_npz") -> int:
    print("CWD:", os.getcwd())
    print("Directory listing (top):",
          [x for x in os.listdir(".") if not x.startswith(".")][:30])
    dirs = list(dict.fromkeys([clip_dir] + CANDIDATE_DIRS))
    total = 0
    for d in dirs:
        if os.path.isdir(d):
            total += try_dir(d)
        else:
            print(f"\nDIR='{d}' does not exist")
    print("\nTotal found across candidates:", total)
    return 0 if total else 1
