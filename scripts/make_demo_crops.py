"""Regenerate the deterministic 840-crop demo corpus (DEMO.md recipe).

320px crops of the 7 CLIC originals, seed 0 — byte-identical corpus every
time, so demo runs are reproducible after environment resets wipe
/root/demo_crops (it is outside the repo and untracked by design: 840
PNGs). Pre-cutting matters on this 1-core host: decoding 3 MP PNGs per
sample would starve the TPU.
"""

import os
import sys

import numpy as np
from PIL import Image

SRC = "/root/reference/assets/originals"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/demo_crops"
CROPS_PER_IMAGE = 120
SIZE = 320


def main():
    if os.path.isdir(DST) and len(os.listdir(DST)) == 7 * CROPS_PER_IMAGE:
        print(f"{DST}: corpus already present")
        return
    os.makedirs(DST, exist_ok=True)
    rng = np.random.RandomState(0)
    for f in sorted(os.listdir(SRC)):
        img = np.asarray(Image.open(os.path.join(SRC, f)).convert("RGB"))
        h, w = img.shape[:2]
        for k in range(CROPS_PER_IMAGE):
            t, l = rng.randint(h - SIZE + 1), rng.randint(w - SIZE + 1)
            Image.fromarray(img[t:t + SIZE, l:l + SIZE]).save(
                f"{DST}/{os.path.splitext(f)[0]}_{k:03d}.png")
    print(f"{DST}: wrote {len(os.listdir(DST))} crops")


if __name__ == "__main__":
    main()
