"""Round-5: why does the device encoder trip the capacity fallback at a
normal operating point? Dump the kernel-reported cursors vs the caps."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from hific_tpu.codec import Codec
from hific_tpu.config import mse_lpips_config
from hific_tpu.models.hific import HiFiC
from hific_tpu.entropy.device_encode import default_caps

config = mse_lpips_config(dtype="bfloat16")
model = HiFiC(config)
rng = jax.random.PRNGKey(0)
params = model.init({"params": rng, "quantize": rng},
                    jnp.zeros((1, 64, 64, 3)), training=True)["params"]
codec = Codec(config, params)
codec.build_tables()
codec.params = bench._scale_latents(params, 0.04472)  # known ~0.42 bpp

x = jnp.asarray(bench._image(bench.H, bench.W, seed=1))
buf, z_shape, y_shape = codec._enqueue_device_compress(x)
buf = np.asarray(buf)
_, hz, wz, cz = z_shape
_, hy, wy, cy = y_shape
y_sp, y_le = default_caps(hy * wy, cy)
z_sp, z_le = default_caps(hz * wz, cz)
y_scur, y_ecur, z_scur, z_ecur = (int(v) for v in buf[0:4])
print(f"y: scur {y_scur} / cap {y_sp} | ecur {y_ecur} / cap {y_le}")
print(f"z: scur {z_scur} / cap {z_sp} | ecur {z_ecur} / cap {z_le}")
out = codec._unpack_device_compress(buf, z_shape, y_shape, (1024, 1024))
print("fallback:", out is None)
if out is not None:
    print("bpp:", out.total_bpp)
