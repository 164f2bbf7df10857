"""Loss functions (pure, jit-traceable).

Behavioral specs:
- two-tier rate loss: reference src/loss/losses.py:8-28. The reference reads
  q_bpp via .item() (a device->host sync per step!); here the comparison is
  a traced lax.select so the whole step stays on-device.
- GAN losses: reference src/loss/losses.py:30-66.
- distortion: MSE in [0,255] space, reference src/model.py:190-194.
"""

import jax.numpy as jnp
import optax

from hific_tpu.training.schedules import scheduled_param


def distortion_loss(x_gen, x_real):
    return jnp.mean(jnp.square(x_gen * 255.0 - x_real * 255.0))


def weighted_rate_loss(config, total_nbpp, total_qbpp, step,
                       ignore_schedule=False):
    """Penalize the (differentiable) noisy rate with lambda_A when the
    quantized rate exceeds the scheduled target, else lambda_B."""
    lambda_A = scheduled_param(config.lambda_A, config.lambda_schedule, step,
                               ignore_schedule)
    lambda_B = scheduled_param(config.lambda_B, config.lambda_schedule, step,
                               ignore_schedule)
    target_bpp = scheduled_param(config.target_rate, config.target_schedule,
                                 step, ignore_schedule)
    rate_penalty = jnp.where(total_qbpp > target_bpp, lambda_A, lambda_B)
    return rate_penalty * total_nbpp, rate_penalty


def non_saturating_gan_loss(d_real_logits, d_gen_logits):
    d_loss = jnp.mean(
        optax.sigmoid_binary_cross_entropy(d_real_logits,
                                           jnp.ones_like(d_real_logits))
    ) + jnp.mean(
        optax.sigmoid_binary_cross_entropy(d_gen_logits,
                                           jnp.zeros_like(d_gen_logits))
    )
    g_loss = jnp.mean(
        optax.sigmoid_binary_cross_entropy(d_gen_logits,
                                           jnp.ones_like(d_gen_logits))
    )
    return d_loss, g_loss


def least_squares_gan_loss(d_real, d_gen):
    d_loss = 0.5 * (jnp.mean(jnp.square(d_real - 1.0)) +
                    jnp.mean(jnp.square(d_gen)))
    g_loss = 0.5 * jnp.mean(jnp.square(d_gen - 1.0))
    return d_loss, g_loss


def gan_loss(gan_loss_type, disc_out):
    if gan_loss_type == "non_saturating":
        return non_saturating_gan_loss(disc_out.d_real_logits,
                                       disc_out.d_gen_logits)
    if gan_loss_type == "least_squares":
        return least_squares_gan_loss(disc_out.d_real, disc_out.d_gen)
    raise ValueError(f"Invalid GAN loss {gan_loss_type}")


def compression_loss(config, intermediates, lpips_fn, step,
                     ignore_schedule=False):
    """k_M * MSE + k_P * LPIPS + weighted rate (reference model.py:201-241).

    lpips_fn: callable (x_gen, x_real) -> per-image LPIPS (or None to skip).
    Returns (loss, diagnostics dict).
    """
    x_real = intermediates.input_image
    x_gen = intermediates.reconstruction
    if config.normalize_input_image:
        x_real = (x_real + 1.0) / 2.0
        x_gen = (x_gen + 1.0) / 2.0

    dist = distortion_loss(x_gen, x_real)
    if lpips_fn is not None:
        percep = jnp.mean(lpips_fn(x_gen, x_real))
    else:
        percep = jnp.zeros(())

    weighted_distortion = config.k_M * dist
    weighted_perceptual = config.k_P * percep
    weighted_rate, rate_penalty = weighted_rate_loss(
        config, intermediates.n_bpp, intermediates.q_bpp, step, ignore_schedule)

    loss = weighted_rate + weighted_distortion + weighted_perceptual
    diagnostics = {
        "distortion": dist,
        "perceptual": percep,
        "rate_penalty": rate_penalty,
        "n_rate": intermediates.n_bpp,
        "q_rate": intermediates.q_bpp,
        "weighted_rate": weighted_rate,
        "weighted_distortion": weighted_distortion,
        "weighted_perceptual": weighted_perceptual,
        "weighted_R_D": weighted_rate + weighted_distortion,
        "weighted_compression_loss_sans_G": loss,
    }
    return loss, diagnostics
