"""Round-5 diagnostic, part 4: diag3 proved all encode paths agree at the
512-padded shape (byte-identical streams) yet the round trip is 13.3 dB.
Split forward-at-padded-shape vs decode-at-padded-grid:

  1. reconstruct(xp) (no rANS), cropped  -> if bad, forward breaks at shape
  2. y symbols of x vs xp, interior cols -> if differ, ENCODER breaks at shape
  3. decompress(compress(xp)) vs reconstruct(xp), both padded-res, uncropped
     -> if differ, the rANS/decode leg breaks at the padded grid
  4. same probes on the landscape orientation (padded (1536,2048)) for contrast
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image
import jax
import jax.numpy as jnp

from hific_tpu.codec import Codec
from hific_tpu.config import Config
from hific_tpu.ops.padding import pad_factor
from hific_tpu.training import checkpoints
from hific_tpu.utils.metrics import psnr

CKPT = "experiments/demo4_flagship_compression_low/checkpoints/step_30000"
CFGJ = "experiments/demo4_flagship_compression_low/checkpoints/config.json"

cfg = Config.from_json(open(CFGJ).read())
params = checkpoints.restore_params(CKPT, cfg, jax.random.PRNGKey(0))
codec = Codec(cfg, params)
codec.build_tables()
print("tables built", flush=True)


def probe(img, tag):
    x = jnp.asarray(img)
    xp = pad_factor(x, 512)
    h, w = img.shape[1], img.shape[2]
    print(f"== {tag}: {img.shape} padded {tuple(xp.shape)}", flush=True)

    rec_p = np.asarray(codec.reconstruct(xp))
    p1 = float(psnr(x, jnp.asarray(np.clip(rec_p[:, :h, :w], 0, 1)))[0])
    print(f"  1. reconstruct(padded) cropped PSNR {p1:.2f}", flush=True)

    z1, y1, i1, *_ = (np.asarray(a) for a in codec._compress_syms_p(
        codec.params, x if (h % 16 == 0 and w % 16 == 0) else pad_factor(x, 16),
        codec._scale_table_dev))
    z2, y2, i2, *_ = (np.asarray(a) for a in codec._compress_syms_p(
        codec.params, xp, codec._scale_table_dev))
    hh = min(y1.shape[1], y2.shape[1]) - 4
    ww = min(y1.shape[2], y2.shape[2]) - 4
    frac = float((y1[:, :hh, :ww] != y2[:, :hh, :ww]).mean())
    print(f"  2. y syms interior mismatch frac {frac:.4f} "
          f"(grids {y1.shape} vs {y2.shape})", flush=True)

    out = codec.compress(xp, device_encode=False)
    dec_p = np.asarray(codec.decompress(out, device_decode=False))
    d31 = float(np.abs(dec_p - rec_p).max())
    p3 = float(psnr(x, jnp.asarray(np.clip(dec_p[:, :h, :w], 0, 1)))[0])
    print(f"  3. decompress(compress(padded)): PSNR {p3:.2f}, "
          f"max|dec - reconstruct| {d31:.4g}", flush=True)


port = np.asarray(Image.open("/root/reference/assets/originals/CLIC2020_5.png")
                  .convert("RGB"), np.float32)[None] / 255.0
land = port.transpose(0, 2, 1, 3).copy()
probe(port, "portrait (2048,1365)")
probe(land, "landscape (1365,2048) [transposed same pixels]")
