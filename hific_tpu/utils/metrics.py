"""Image quality metrics: PSNR, SSIM, MS-SSIM (jax, NHWC).

Behavioral spec from reference src/helpers/metrics.py: tf.image.psnr-style
PSNR (:7-18) and the separable-Gaussian-window SSIM/MS-SSIM (:20-322) with
the standard power weights. All functions are jittable.
"""

import jax
import jax.numpy as jnp

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a, b, max_val=1.0):
    """Per-image PSNR over NHWC batches (reference metrics.py:7-18)."""
    a, b = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(mse)


def _gaussian_window(size: int, sigma: float):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _blur(x, window):
    """Separable valid conv with a 1-D window along H then W, per channel.

    Pinned to HIGHEST precision: on TPU the default conv precision is
    bfloat16, which is fine for model transforms but corrupts a METRIC —
    measured MS-SSIM error up to +0.13 on real images (values > 1).
    """
    c = x.shape[-1]
    k = window.shape[0]
    wh = jnp.tile(window.reshape(k, 1, 1, 1), (1, 1, 1, c))
    ww = jnp.tile(window.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    hp = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(x, wh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c, precision=hp)
    x = jax.lax.conv_general_dilated(x, ww, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c, precision=hp)
    return x


def _ssim_per_channel(a, b, max_val=1.0, filter_size=11, filter_sigma=1.5,
                      k1=0.01, k2=0.03):
    # Metrics are always evaluated in f32, whatever dtype the model ran in.
    a, b = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    window = _gaussian_window(filter_size, filter_sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_a = _blur(a, window)
    mu_b = _blur(b, window)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = _blur(a * a, window) - mu_aa
    sigma_bb = _blur(b * b, window) - mu_bb
    sigma_ab = _blur(a * b, window) - mu_ab

    luminance = (2.0 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    cs = (2.0 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    ssim_map = luminance * cs
    return (jnp.mean(ssim_map, axis=(1, 2)), jnp.mean(cs, axis=(1, 2)))


def ssim(a, b, max_val=1.0, filter_size=11, filter_sigma=1.5):
    """Mean SSIM per image, NHWC in [0, max_val]."""
    s, _ = _ssim_per_channel(a, b, max_val, filter_size, filter_sigma)
    return jnp.mean(s, axis=-1)


def _downsample_2x(x):
    """2x2 average pool with stride 2 (reference metrics.py uses avg_pool)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def ms_ssim(a, b, max_val=1.0, filter_size=11, filter_sigma=1.5,
            weights=MS_SSIM_WEIGHTS):
    """Multi-scale SSIM per image. Input H, W must be >= filter_size * 2^4."""
    weights = jnp.asarray(weights)
    levels = weights.shape[0]
    mcs = []
    for i in range(levels):
        s, cs = _ssim_per_channel(a, b, max_val, filter_size, filter_sigma)
        if i < levels - 1:
            mcs.append(jnp.mean(jax.nn.relu(cs), axis=-1))
            a, b = _downsample_2x(a), _downsample_2x(b)
    s = jnp.mean(jax.nn.relu(s), axis=-1)
    mcs = jnp.stack(mcs, axis=0)  # (levels-1, N)
    return jnp.prod(mcs ** weights[:-1, None], axis=0) * s ** weights[-1]
