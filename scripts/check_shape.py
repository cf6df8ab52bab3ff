#!/usr/bin/env python3
"""Print keys/shapes of a real and a synthetic NPZ (timeGAN/check_shape.py)."""

import sys

import numpy as np


def show(path):
    z = np.load(path, allow_pickle=True)
    print(path)
    for k in z.files:
        v = z[k]
        print(f"  {k}: shape={getattr(v, 'shape', None)} dtype={getattr(v, 'dtype', None)}")


if __name__ == "__main__":
    for p in sys.argv[1:] or ["preprocessed/posture1_no_exo.npz"]:
        show(p)
