#!/usr/bin/env python
"""Offline image pyramid prep (reference downsample.py:1-10): halves
``images_2/*`` into ``images_4/``.  Generalized: --src/--dst/--factor."""
import argparse
import glob
import os

import cv2

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="colmap_garden/images_2")
    p.add_argument("--dst", default="colmap_garden/images_4")
    p.add_argument("--factor", type=float, default=2.0)
    a = p.parse_args()
    os.makedirs(a.dst, exist_ok=True)
    for fn in sorted(glob.glob(os.path.join(a.src, "*"))):
        img = cv2.imread(fn)
        if img is None:
            continue
        img = cv2.resize(img, dsize=None, fx=1 / a.factor, fy=1 / a.factor,
                         interpolation=cv2.INTER_AREA)
        cv2.imwrite(os.path.join(a.dst, os.path.basename(fn)), img)
        print(os.path.basename(fn))
