"""Round-5 diagnostic, part 5: decode-leg isolation at the broken shape.

diag4 proved: forward at padded (2048,1536) fine (29.94 dB), all encoders
byte-identical, but host decompress(compress(xp)) = 13.3 dB garbage.
Decompose the decode leg at latent grid (128,96):

  A. z decode:   factorized.decompress_symbols == encoder z symbols?
  B. idx:        _synth_stats_p(z_dec) indices == encoder-side indices?
     (also max |mu - mu_enc|, |sigma - sigma_enc| if accessible)
  C. y decode:   conditional.decompress_symbols(stream, idx_enc) == y_enc?
     (decode with the ENCODER's indices: isolates rANS from idx recompute)
  D. y decode with the DECODER's recomputed idx (the live path).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image
import jax
import jax.numpy as jnp

from hific_tpu.codec import Codec, _to_nchw, _to_nhwc_int
from hific_tpu.config import Config
from hific_tpu.ops.padding import pad_factor
from hific_tpu.training import checkpoints

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
xp = pad_factor(x, 512)
print(f"padded {tuple(xp.shape)}", flush=True)

res = codec._compress_syms_p(codec.params, xp, codec._scale_table_dev)
z_e, y_e, i_e = (np.asarray(a) for a in res[:3])
print(f"enc grids z{z_e.shape} y{y_e.shape} idx{i_e.shape}", flush=True)

z_nchw = _to_nchw(z_e).astype(np.int32)
y_nchw = _to_nchw(y_e).astype(np.int32)
i_nchw = _to_nchw(i_e).astype(np.int32)

z_enc, _ = codec.factorized.compress_symbols(z_nchw, vectorize=True)
y_enc, _ = codec.conditional.compress_symbols(y_nchw, i_nchw, vectorize=True)

# A: z decode round trip
z_d = codec.factorized.decompress_symbols(
    z_enc, 1, tuple(z_nchw.shape[2:]), vectorize=True)
print(f"A. z decode == z enc: {bool((z_d == z_nchw).all())} "
      f"(mismatch {int((z_d != z_nchw).sum())}/{z_d.size})", flush=True)

# B: idx recompute via the decoder's standalone synth-stats program
z_sym_dev = jnp.asarray(_to_nhwc_int(z_d), jnp.int16)
mu, sigma, idx = codec._synth_stats_p(codec.params, z_sym_dev,
                                      codec._scale_table_dev)
idx_d = _to_nchw(idx).astype(np.int32)
mis = int((idx_d != i_nchw).sum())
print(f"B. idx recompute == enc idx: {mis == 0} "
      f"(mismatch {mis}/{idx_d.size})", flush=True)
if mis:
    pos = np.argwhere(idx_d != i_nchw)
    print(f"   first mismatches (n,c,h,w -> enc,dec): ", flush=True)
    for p in pos[:8]:
        print(f"   {tuple(p)} -> {i_nchw[tuple(p)]}, {idx_d[tuple(p)]}",
              flush=True)

# C: y decode with the ENCODER's idx (isolate rANS correctness)
y_c = codec.conditional.decompress_symbols(y_enc, i_nchw, vectorize=True)
print(f"C. y decode (enc idx) == y enc: {bool((y_c == y_nchw).all())} "
      f"(mismatch {int((y_c != y_nchw).sum())}/{y_c.size})", flush=True)

# D: y decode with the recomputed idx (the live decode path)
y_d = codec.conditional.decompress_symbols(y_enc, idx_d, vectorize=True)
print(f"D. y decode (dec idx) == y enc: {bool((y_d == y_nchw).all())} "
      f"(mismatch {int((y_d != y_nchw).sum())}/{y_d.size})", flush=True)
