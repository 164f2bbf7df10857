"""HiFiC model facade: Encoder -> Hyperprior -> Generator (+ Discriminator).

Stitches the submodels and owns the forward passes; loss computation lives
in hific_tpu/training/losses.py (kept functional so the jitted train step
composes them freely). Behavioral spec from reference src/model.py:119-188.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from hific_tpu.config import Config, ModelModes
from hific_tpu.models.discriminator import Discriminator
from hific_tpu.models.encoder import Encoder
from hific_tpu.models.generator import Generator
from hific_tpu.models.hyperprior import Hyperprior, HyperpriorDLMM
from hific_tpu.ops.padding import pad_factor


# Escape slots for int8 latent-symbol wire packing (compress_symbols_packed).
N_LATENT_ESCAPES = 2048


def _le_bytes(a, width: int):
    """Little-endian byte expansion of an integer array via explicit
    shifts (backend-portable, unlike narrowing bitcast byte order)."""
    a = a.astype(jnp.uint32) if width == 4 else a.astype(jnp.uint16)
    parts = [((a >> (8 * i)) & 0xFF).astype(jnp.uint8) for i in range(width)]
    return jnp.stack(parts, axis=-1).reshape(-1)


class Intermediates(NamedTuple):
    input_image: jnp.ndarray       # [0,1] (or [-1,1] if normalize_input_image)
    reconstruction: jnp.ndarray
    latents_quantized: jnp.ndarray
    n_bpp: jnp.ndarray             # differential-entropy estimate
    q_bpp: jnp.ndarray             # Shannon-entropy estimate


class DiscOut(NamedTuple):
    d_real: jnp.ndarray
    d_gen: jnp.ndarray
    d_real_logits: jnp.ndarray
    d_gen_logits: jnp.ndarray


class HiFiC(nn.Module):
    """Flagship model. NHWC throughout."""

    config: Config

    def setup(self):
        cfg = self.config
        C = cfg.effective_latent_channels
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None

        norm_backend = "pallas" if cfg.use_pallas_norm else "xla"
        self.encoder = Encoder(C=C, norm_type=cfg.norm_type,
                               norm_backend=norm_backend, dtype=dtype,
                               s2d_front=cfg.s2d_encoder_front)
        self.generator = Generator(
            C=C,
            n_residual_blocks=cfg.n_residual_blocks,
            norm_type=cfg.norm_type,
            norm_backend=norm_backend,
            sample_noise=cfg.sample_noise,
            noise_dim=cfg.noise_dim,
            use_remat=cfg.use_remat,
            dtype=dtype,
            d2s_tail=cfg.d2s_generator_tail,
        )
        if cfg.use_latent_mixture_model:
            self.hyperprior = HyperpriorDLMM(
                C=C,
                hyperlatent_filters=cfg.hyperlatent_filters,
                likelihood_type=cfg.likelihood_type,
                mixture_components=cfg.mixture_components,
                dtype=dtype,
            )
        else:
            self.hyperprior = Hyperprior(
                C=C,
                hyperlatent_filters=cfg.hyperlatent_filters,
                likelihood_type=cfg.likelihood_type,
                dtype=dtype,
            )
        if cfg.use_discriminator:
            self.discriminator = Discriminator(dtype=dtype)

    # ----- forward passes ---------------------------------------------------

    def __call__(self, x, rng=None, training: bool = True,
                 mode: str = ModelModes.TRAINING):
        """Compression forward (reference model.py:119-165).

        x: (N,H,W,3) in [0,1] (or [-1,1] if config.normalize_input_image).
        Returns (intermediates, hyperinfo).
        """
        cfg = self.config
        spatial_shape = x.shape[1:3]
        evaluation = mode == ModelModes.EVALUATION and not training

        if evaluation:
            x = pad_factor(x, 2 ** self.encoder.n_downsampling_layers)

        y = self.encoder(x)

        if evaluation:
            y = pad_factor(y, 2 ** self.hyperprior.analysis_net.n_downsampling_layers)

        hyperinfo = self.hyperprior(y, spatial_shape, rng=rng, training=training)

        reconstruction = self.generator(hyperinfo.decoded)
        if cfg.normalize_input_image:
            reconstruction = jnp.tanh(reconstruction)

        if evaluation:
            reconstruction = reconstruction[:, : spatial_shape[0], : spatial_shape[1], :]
            x = x[:, : spatial_shape[0], : spatial_shape[1], :]

        intermediates = Intermediates(
            input_image=x,
            reconstruction=reconstruction,
            latents_quantized=hyperinfo.decoded,
            n_bpp=hyperinfo.total_nbpp,
            q_bpp=hyperinfo.total_qbpp,
        )
        return intermediates, hyperinfo

    def discriminator_forward(self, intermediates: Intermediates,
                              train_generator: bool, update_stats: bool = True):
        """Real/generated batches through the conditional discriminator in
        one pass (reference model.py:167-188)."""
        x_gen = intermediates.reconstruction
        x_real = intermediates.input_image
        if not train_generator:
            x_gen = jax.lax.stop_gradient(x_gen)
        d_in = jnp.concatenate([x_real, x_gen], axis=0)
        latents = jax.lax.stop_gradient(intermediates.latents_quantized)
        latents = jnp.concatenate([latents, latents], axis=0)
        d_out, d_out_logits = self.discriminator(d_in, latents,
                                                 update_stats=update_stats)
        d_out, d_out_logits = jnp.squeeze(d_out, -1), jnp.squeeze(d_out_logits, -1)
        n = d_out.shape[0] // 2
        return DiscOut(d_out[:n], d_out[n:], d_out_logits[:n], d_out_logits[n:])

    # ----- codec-side pieces (called via nn.apply with method=...) ----------

    def encode(self, x):
        """Image -> padded latents y + original spatial shape, evaluation
        padding semantics (reference model.py:277-290)."""
        spatial_shape = x.shape[1:3]
        x = pad_factor(x, 2 ** self.encoder.n_downsampling_layers)
        y = self.encoder(x)
        y = pad_factor(y, 2 ** self.hyperprior.analysis_net.n_downsampling_layers)
        return y, spatial_shape

    def hyper_analyze(self, y):
        return self.hyperprior.analyze(y)

    def hyper_synthesize(self, z_decoded):
        return self.hyperprior.synthesize(z_decoded)

    # Device-side codec stages that exchange only INTEGER symbols with the
    # host rANS coder (fp32 latents/means/scales never cross the wire; on
    # relayed transports that transfer dominates the whole codec).

    def code_hyper(self, y):
        """y -> (hyperlatent symbols int16, hyper Shannon bits)."""
        z = self.hyperprior.analyze(y)
        z_q = jnp.floor(z + 0.5)
        lik = self.hyperprior.hyperlatent_density(z_q)
        bits = -jnp.sum(jnp.log(lik + 1e-9)) / jnp.log(2.0)
        return z_q.astype(jnp.int16), bits

    def synth_stats(self, z_sym, scale_table):
        """Decoded hyperlatent symbols -> (mu, sigma, scale-table indices).

        THE one executable both coder sides must source CDF-row indices
        from — Codec jits exactly one program over this method per z-shape
        (`Codec._synth_stats_p`), and every encode AND decode path calls
        that same program. Sharing the *source* is NOT enough: XLA fuses a
        copy of this computation embedded in a larger program differently
        (layout/tiling choices change float accumulation order), and the
        resulting sigma drift flips scale-bucket indices — measured 3744
        flipped indices out of 2.7M at a (128,96) latent grid on TPU,
        which desyncs the rANS lanes and destroys the image (round-5
        diagnosis, scripts/diag_flagship5.py). Same compiled executable on
        identical avals => bit-identical indices (the codec's core
        determinism invariant; reference hyperprior.py:208-218 vs 256-265
        gets this for free from eager per-op kernels).
        scale_table: (levels,) jnp array.
        """
        z_q = z_sym.astype(jnp.float32)
        mu, sigma = self.hyperprior.synthesize(z_q)
        idx = jnp.sum(
            sigma[..., None] > scale_table[: -1], axis=-1).astype(jnp.uint8)
        return mu, sigma, idx

    def latent_symbols(self, y, mu, sigma, spatial_shape):
        """(latent symbols int16, latent Shannon bits)."""
        from hific_tpu.models.density import latent_likelihood

        y_sym = jnp.floor(y + 0.5 - mu)
        y_q = y_sym + mu
        lik = latent_likelihood(y_q, mu, sigma, self.config.likelihood_type)
        bits = -jnp.sum(jnp.log(lik + 1e-9)) / jnp.log(2.0)
        return y_sym.astype(jnp.int16), bits

    def compress_front(self, x):
        """x -> (padded latents y, z_sym int16, hyper Shannon bits): every
        codec stage UPSTREAM of synth_stats, fused into one program. mu/
        sigma/idx are deliberately NOT produced here — the coding indices
        must come from the standalone synth_stats executable (see its
        docstring for why a fused copy is not bit-identical)."""
        y, _ = self.encode(x)
        z_sym, hyper_bits = self.code_hyper(y)
        return y, z_sym, hyper_bits

    def compress_front_from_latents(self, y):
        """compress_front downstream of the encoder, on explicit latents
        (encode-side tiling / SP assemble the latents elsewhere). Pads y to
        the hyper downsampling factor exactly as `encode` does (idempotent
        on already-padded latents)."""
        y = pad_factor(y, 2 ** self.hyperprior.analysis_net.n_downsampling_layers)
        z_sym, hyper_bits = self.code_hyper(y)
        return y, z_sym, hyper_bits

    def latent_symbols_packed(self, y, mu, sigma, idx, z_sym, hyper_bits):
        """Latent quantization + single-buffer packing, DOWNSTREAM of the
        shared synth_stats executable (whose mu/sigma/idx arrive as device-
        resident arguments). Packed layout identical to
        compress_symbols_packed — one uint8 fetch for the host coder."""
        y_sym, latent_bits = self.latent_symbols(y, mu, sigma, None)
        return _pack_codec_outputs(z_sym, y_sym, idx, hyper_bits,
                                   latent_bits)

    def compress_symbols(self, x, scale_table):
        """Fully-fused x -> (z_sym, y_sym, idx, hyper_bits, latent_bits) in
        ONE program. TELEMETRY/DIAGNOSTIC USE ONLY: its fused synth-stats
        copy is NOT bit-identical to the standalone synth_stats executable
        (see synth_stats docstring), so its idx must never feed the entropy
        coder — Codec routes all coding through compress_front +
        _synth_stats_p instead."""
        y, _ = self.encode(x)
        return self.compress_symbols_from_latents(y, scale_table)

    def encoder_forward(self, x):
        """Bare encoder conv stack (no padding): the per-tile program for
        encode-side tiling (tiles are already halo-padded multiples of the
        downsampling factor)."""
        return self.encoder(x)

    def compress_symbols_from_latents(self, y, scale_table):
        """Fused codec stages downstream of the encoder, on explicit
        latents. TELEMETRY/DIAGNOSTIC USE ONLY — like compress_symbols, its
        fused synth-stats copy must never feed the entropy coder."""
        y = pad_factor(y, 2 ** self.hyperprior.analysis_net.n_downsampling_layers)
        z_sym, hyper_bits = self.code_hyper(y)
        mu, sigma, idx = self.synth_stats(z_sym, scale_table)
        y_sym, latent_bits = self.latent_symbols(y, mu, sigma, None)
        return z_sym, y_sym, idx, hyper_bits, latent_bits

    def generate_from_symbols(self, y_sym, mu, spatial_shape):
        """Decoded latent symbols + on-device means -> reconstruction."""
        return self.generate(y_sym.astype(jnp.float32) + mu, spatial_shape)

    def compress_symbols_packed(self, x, scale_table):
        """compress_symbols + on-device packing of every output into ONE
        uint8 buffer, so the host needs a single fetch (each device->host
        read costs ~30 ms flat on relayed transports, and the unpacked path
        needs five: z, y, idx, and two bit-count scalars).
        TELEMETRY/DIAGNOSTIC USE ONLY (fused synth-stats — see
        compress_symbols); the live host-coder path is compress_front +
        synth_stats + latent_symbols_packed.

        Latent symbols ship as int8 + up to N_LATENT_ESCAPES exceptions
        (flat index, int16 value); symbols outside int8 are virtually
        nonexistent at real operating points, and the host falls back to
        the unpacked program when the escape count overflows.

        Layout (explicit little-endian arithmetic packing — portable
        across backends, unlike bitcast byte order):
          [0:4)   escape count, int32
          [4:8)   hyperlatent Shannon bits, float32
          [8:12)  latent Shannon bits, float32
          [12:12+2*Nz)  z_sym int16
          [..+Ny)       y8 int8
          [..+Ny)       idx uint8
          [..+4*K)      escape flat positions int32 (-1 padding)
          [..+2*K)      escape values int16
        """
        return _pack_codec_outputs(*self.compress_symbols(x, scale_table))

    def compress_symbols_packed_from_latents(self, y, scale_table):
        """Packed variant of compress_symbols_from_latents (encode-side
        tiling ships one buffer to the host, like the whole-image path)."""
        return _pack_codec_outputs(
            *self.compress_symbols_from_latents(y, scale_table))

    def generate_u8_from_packed_symbols(self, y8, esc_pos, esc_val, mu,
                                        spatial_shape):
        """uint8 decode with int8 latent symbols + escape writeback (the
        host->device mirror of compress_symbols_packed: ships half the
        bytes of int16 symbols)."""
        y_flat = y8.reshape(-1).astype(jnp.float32)
        n = y_flat.shape[0]
        # Route the -1 padding slots to a sentinel element PAST the data:
        # clamping them to 0 instead would duplicate-scatter index 0 with
        # the clipped value, racing a real escape there (scatter order with
        # duplicate indices is undefined).
        tgt = jnp.where(esc_pos >= 0, esc_pos, n)
        padded = jnp.concatenate([y_flat, jnp.zeros((1,), y_flat.dtype)])
        padded = padded.at[tgt].set(
            jnp.where(esc_pos >= 0, esc_val.astype(jnp.float32), 0.0))
        y = padded[:n].reshape(y8.shape) + mu
        return (self.generate(y, spatial_shape) * 255.0 + 0.5).astype(
            jnp.uint8)


    def generate_u8_from_symbols(self, y_sym, mu, spatial_shape):
        """Like generate_from_symbols but quantized to uint8 ON DEVICE
        (identical to the PNG pixel mapping round(x*255)): ships 3 bytes/px
        over the wire instead of 12 — on relayed transports the fp32 image
        download alone would dominate decode latency."""
        r = self.generate_from_symbols(y_sym, mu, spatial_shape)
        return (r * 255.0 + 0.5).astype(jnp.uint8)

    def hyperlatent_likelihood_at(self, z):
        """Evaluate the learned hyperlatent density (for table building and
        bit estimates); z is (C, 1, M) collapsed format."""
        return self.hyperprior.hyperlatent_density.likelihood_collapsed(z)

    def hyperlatent_cdf_logits(self, z):
        return self.hyperprior.hyperlatent_density.cdf_logits(z, stop_gradient=True)

    def generate(self, latents_decoded, spatial_shape):
        """Quantized latents -> clamped [0,1] reconstruction (reference
        model.py:312-344)."""
        reconstruction = self.generator(latents_decoded)
        if self.config.normalize_input_image:
            reconstruction = jnp.tanh(reconstruction)
        reconstruction = reconstruction[:, : spatial_shape[0], : spatial_shape[1], :]
        if self.config.normalize_input_image:
            reconstruction = (reconstruction + 1.0) / 2.0
        return jnp.clip(reconstruction, 0.0, 1.0)


def _pack_codec_outputs(z_sym, y_sym, idx, hyper_bits, latent_bits):
    """On-device packing of the codec outputs into one uint8 buffer (layout
    documented on HiFiC.compress_symbols_packed)."""
    y_flat = y_sym.reshape(-1)
    y8 = jnp.clip(y_flat, -128, 127).astype(jnp.int8)
    esc_mask = y_flat != y8.astype(jnp.int16)
    esc_count = jnp.sum(esc_mask).astype(jnp.int32)
    k = N_LATENT_ESCAPES
    esc_pos = jnp.nonzero(esc_mask, size=k, fill_value=-1)[0].astype(
        jnp.int32)
    esc_val = jnp.where(esc_pos >= 0,
                        y_flat[jnp.maximum(esc_pos, 0)],
                        0).astype(jnp.int16)

    return jnp.concatenate([
        _le_bytes(esc_count.reshape(1), 4),
        _le_bytes(jax.lax.bitcast_convert_type(
            hyper_bits.astype(jnp.float32).reshape(1), jnp.uint32), 4),
        _le_bytes(jax.lax.bitcast_convert_type(
            latent_bits.astype(jnp.float32).reshape(1), jnp.uint32), 4),
        _le_bytes(z_sym.reshape(-1), 2),
        jax.lax.bitcast_convert_type(y8, jnp.uint8),
        idx.reshape(-1),
        _le_bytes(esc_pos, 4),
        _le_bytes(esc_val, 2),
    ])


if __name__ == "__main__":
    # Smoke test, the analog of `python3 -m src.model` (reference
    # model.py:389-463): full GAN model, one forward with losses on a
    # random B=10 256x256 batch.
    import time

    import numpy as np

    from hific_tpu.config import hific_config
    from hific_tpu.training.losses import compression_loss, gan_loss
    from hific_tpu.training.train_step import create_train_state

    config = hific_config()
    print(f"Model type: {config.model_type}, regime: {config.regime}")
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    state = create_train_state(config, rng, input_shape=(1, 256, 256, 3))
    n_codec = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    n_disc = sum(x.size for x in jax.tree_util.tree_leaves(state.disc_params))
    print(f"Codec params: {n_codec/1e6:.1f}M | Disc params: {n_disc/1e6:.1f}M "
          f"| estimated fp32 size {(n_codec+n_disc)*4/1e6:.0f} MB")
    print(f"Init {time.time()-t0:.1f}s")

    model = HiFiC(config)
    x = jnp.asarray(np.random.RandomState(0).rand(10, 256, 256, 3), jnp.float32)
    t0 = time.time()

    @jax.jit
    def forward(params, disc_params, spectral, x, rng):
        inter, hyper = model.apply({"params": dict(params)}, x, training=True,
                                   rngs={"quantize": rng})
        comp_loss, diag = compression_loss(config, inter, None, 0)
        disc_vars = {"params": {**dict(params), "discriminator": disc_params},
                     "spectral": spectral}
        disc_out, _ = model.apply(disc_vars, inter, train_generator=True,
                                  method=HiFiC.discriminator_forward,
                                  mutable=["spectral"])
        d_loss, g_loss = gan_loss(config.gan_loss_type, disc_out)
        return comp_loss + config.beta * g_loss, d_loss, diag["q_rate"]

    comp, d_loss, qbpp = forward(state.params, state.disc_params,
                                 state.spectral, x, jax.random.PRNGKey(1))
    print(f"compression loss {float(comp):.3f} | disc loss {float(d_loss):.3f}"
          f" | q_bpp {float(qbpp):.3f}")
    print(f"Forward (B=10, 256x256) {time.time()-t0:.2f}s")
