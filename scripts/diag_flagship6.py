"""Round-5 validation: the shared-synth-stats codec fix at the previously
broken shape. Before the fix, decompress(compress(pad512 portrait)) was
13.3 dB (idx recompute desync — diag5); all paths must now hit the
reconstruct() PSNR (~29.9 dB) exactly.

Probes (portrait CLIC2020_5, padded (2048,1536), latent grid (128,96)):
  1. host enc -> host dec        (compress/decompress, device_encode=False)
  2. device enc -> host dec      (compress(device_encode=True))
  3. device enc -> device dec    (decompress_many as_uint8 path)
  4. bucketed compress_many (the CLI pipeline path) -> decompress_many
  5. chunked compress_many/decompress_many (pipeline_chunk=2, two copies)
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
from hific_tpu.training import checkpoints
from hific_tpu.utils.metrics import psnr

CKPT = "experiments/demo4_flagship_compression_low/checkpoints/step_30000"
CFGJ = "experiments/demo4_flagship_compression_low/checkpoints/config.json"

cfg = Config.from_json(open(CFGJ).read())
params = checkpoints.restore_params(CKPT, cfg, jax.random.PRNGKey(0))
codec = Codec(cfg, params)
codec.build_tables()
print("tables built", flush=True)

img = np.asarray(Image.open("/root/reference/assets/originals/CLIC2020_5.png")
                 .convert("RGB"), np.float32)[None] / 255.0
x = jnp.asarray(img)
h, w = img.shape[1], img.shape[2]


def report(tag, rec):
    rec = np.asarray(rec)
    if rec.dtype == np.uint8:
        rec = rec.astype(np.float32) / 255.0
    p = float(psnr(x, jnp.asarray(np.clip(rec[:, :h, :w], 0, 1)))[0])
    print(f"  {tag}: PSNR {p:.2f}", flush=True)
    return p


out1 = codec.compress(x, shape_bucket=512, device_encode=False)
report("1. host enc  -> host dec  ", codec.decompress(out1,
                                                      device_decode=False))

out2 = codec.compress(x, shape_bucket=512, device_encode=True)
print(f"     streams enc1==enc2: "
      f"{out1.latents_encoded.tobytes() == out2.latents_encoded.tobytes()}",
      flush=True)
report("2. device enc -> host dec ", codec.decompress(out2,
                                                      device_decode=False))
report("3. device enc -> device dec", codec.decompress_many([out2])[0])

outs4 = codec.compress_many([np.asarray(x)], shape_bucket=512)
report("4. compress_many bucketed ", codec.decompress_many(outs4)[0])

codec.pipeline_chunk = 2
outs5 = codec.compress_many([np.asarray(x), np.asarray(x)],
                            shape_bucket=512)
recs5 = codec.decompress_many(outs5)
codec.pipeline_chunk = 1
report("5a. chunked pair [0]      ", recs5[0])
report("5b. chunked pair [1]      ", recs5[1])
print(f"     chunk streams equal: "
      f"{outs5[0].latents_encoded.tobytes() == outs5[1].latents_encoded.tobytes()}",
      flush=True)
