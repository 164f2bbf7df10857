"""Round-5 diagnostic, part 3: diag_flagship2 isolated the corruption to
compress_many(shape_bucket=512) on the flagship (device encode at the
bucketed shape). A tiny CPU repro shows bucketed streams byte-equal to
manually-padded streams, so this compares STREAMS on the real TPU at the
failing shape to split:

  A. host coder on the manually 512-padded image       (ground truth)
  B. device encode on the manually 512-padded image    (shape suspect)
  C. compress_many([x], shape_bucket=512)              (the CLI leg)

If B != A the device encoder corrupts at the padded shape (capacity or
kernel bug); if B == A but C != A the bucketing plumbing corrupts.

Usage: python scripts/diag_flagship3.py
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
IMG = "/root/reference/assets/originals/CLIC2020_5.png"

cfg = Config.from_json(open(CFGJ).read())
img = np.asarray(Image.open(IMG).convert("RGB"), dtype=np.float32)[None] / 255.0
params = checkpoints.restore_params(CKPT, cfg, jax.random.PRNGKey(0))
codec = Codec(cfg, params)
codec.build_tables()
print("tables built", flush=True)

xp = np.asarray(pad_factor(jnp.asarray(img), 512))
print(f"img {img.shape} padded {xp.shape}", flush=True)

A = codec.compress(xp, device_encode=False)
print(f"A host(padded)  bpp(of padded px) {A.total_bpp:.4f}", flush=True)

B = codec.compress(xp, device_encode=True)
print(f"B dev (padded)  z_eq={np.array_equal(A.hyperlatents_encoded, B.hyperlatents_encoded)} "
      f"y_eq={np.array_equal(A.latents_encoded, B.latents_encoded)} "
      f"bits A={A.total_bits:.0f} B={B.total_bits:.0f}", flush=True)

C = codec.compress_many([img], shape_bucket=512)[0]
print(f"C many(bucket)  z_eq={np.array_equal(A.hyperlatents_encoded, C.hyperlatents_encoded)} "
      f"y_eq={np.array_equal(A.latents_encoded, C.latents_encoded)} "
      f"bits C={C.total_bits:.0f}", flush=True)

# decode whichever corrupts, host path, and PSNR it
for tag, out in (("B", B), ("C", C)):
    r = np.asarray(codec.decompress(out, device_decode=False))
    r = r[:, : img.shape[1], : img.shape[2], :]
    print(f"{tag} roundtrip PSNR {float(psnr(jnp.asarray(img), jnp.asarray(np.clip(r,0,1)))[0]):.2f}",
          flush=True)
