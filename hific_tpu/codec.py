"""The codec: image <-> `.hfc` bitstream.

Ties the device-side transforms (encoder / hyper nets / generator, all
jitted) to the host-side rANS entropy models. Pipeline spec from reference
src/model.py:262-344 and src/hyperprior.py:195-274.

Bit-exactness invariant: the ENCODER entropy-decodes its own hyperlatents
before synthesizing (mu, sigma), so sender and receiver derive the latent
probability tables from identical integer inputs (reference
hyperprior.py:208-218 vs 256-265).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hific_tpu.config import Config
from hific_tpu.entropy.container import (
    CompressionOutput,
    load_compressed,
    save_compressed,
)
from hific_tpu.entropy.entropy_models import (
    ConditionalEntropyModel,
    FactorizedEntropyModel,
)
from hific_tpu.models.hific import HiFiC


def _to_nchw(x) -> np.ndarray:
    return np.asarray(x).transpose(0, 3, 1, 2)


def _to_nhwc(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x).transpose(0, 2, 3, 1))


def _to_nhwc_int(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x).transpose(0, 2, 3, 1))


class Codec:
    """Evaluation-mode compression/decompression engine."""

    def __init__(self, config: Config, params, vectorize: bool = True):
        self.config = config
        self.params = params
        self.vectorize = vectorize
        model = HiFiC(config)
        self._model = model

        # Params are ARGUMENTS of the jitted functions, not closed-over
        # constants: the flagship generator alone is ~650 MB fp32, and
        # baking it into the HLO bloats (and on relayed transports, breaks)
        # compilation.
        self._encode_p = jax.jit(
            lambda p, x: model.apply({"params": p}, x, method=HiFiC.encode))
        self._hyper_analyze_p = jax.jit(
            lambda p, y: model.apply({"params": p}, y,
                                     method=HiFiC.hyper_analyze))
        self._hyper_synthesize_p = jax.jit(
            lambda p, z: model.apply({"params": p}, z,
                                     method=HiFiC.hyper_synthesize))
        self._generate_p = jax.jit(
            lambda p, lat, shape: model.apply({"params": p}, lat, shape,
                                              method=HiFiC.generate),
            static_argnums=(2,))
        self._encode = lambda x: self._encode_p(self.params, x)
        self._hyper_analyze = lambda y: self._hyper_analyze_p(self.params, y)
        self._hyper_synthesize = lambda z: self._hyper_synthesize_p(
            self.params, z)
        self._generate = lambda lat, shape: self._generate_p(self.params, lat,
                                                             shape)

        # Integer-symbol codec stages (device <-> host traffic is int16/uint8
        # symbols only; fp32 latents/means/scales stay on device).
        self._code_hyper_p = jax.jit(
            lambda p, y: model.apply({"params": p}, y,
                                     method=HiFiC.code_hyper))
        self._synth_stats_p = jax.jit(
            lambda p, z_sym, table: model.apply(
                {"params": p}, z_sym, table, method=HiFiC.synth_stats))
        self._latent_syms_p = jax.jit(
            lambda p, y, mu, sigma, shape: model.apply(
                {"params": p}, y, mu, sigma, shape,
                method=HiFiC.latent_symbols),
            static_argnums=(4,))
        self._gen_syms_p = jax.jit(
            lambda p, y_sym, mu, shape: model.apply(
                {"params": p}, y_sym, mu, shape,
                method=HiFiC.generate_from_symbols),
            static_argnums=(3,))

        # The density closures only touch the (tiny) hyperprior params.
        hp_params = {"hyperprior": params["hyperprior"]}
        cdf_logits_fn = lambda t: model.apply(
            {"params": hp_params}, t, method=HiFiC.hyperlatent_cdf_logits)
        likelihood_fn = lambda t: model.apply(
            {"params": hp_params}, t, method=HiFiC.hyperlatent_likelihood_at)
        self.factorized = FactorizedEntropyModel(
            cdf_logits_fn, jax.jit(likelihood_fn), config.hyperlatent_filters)
        self.conditional = ConditionalEntropyModel(config.likelihood_type)
        self._scale_table_dev = jnp.asarray(self.conditional.scale_table,
                                            jnp.float32)
        self._tables_built = False

    def build_tables(self):
        """Build the hyperlatent probability tables (once per checkpoint)."""
        self.factorized.build_tables()
        self._tables_built = True

    # ------------------------------------------------------------------ #

    def compress(self, x, shape_bucket: Optional[int] = None
                 ) -> CompressionOutput:
        """x: (1,H,W,3) float in [0,1] (NHWC, device or numpy).

        shape_bucket: reflect-pad H,W up to multiples of this value before
        encoding. Costs a few extra coded latents but caps the number of
        distinct compiled shapes on mixed-size datasets (each new shape
        otherwise pays a fresh XLA compile).
        """
        if not self._tables_built:
            self.build_tables()
        x = jnp.asarray(x, jnp.float32)
        spatial_shape = tuple(int(s) for s in x.shape[1:3])
        if shape_bucket:
            from hific_tpu.ops.padding import pad_factor

            x = pad_factor(x, shape_bucket)

        # Device: transforms + quantization + rate estimates. Only int16
        # symbols and uint8 indices cross to the host.
        y, _ = self._encode(x)
        z_sym, hyper_bits_dev = self._code_hyper_p(self.params, y)
        # synth_stats consumes the DECODED symbols on the decoder side; the
        # coder is lossless (tested), so the encoder can use them directly.
        mu, sigma, idx = self._synth_stats_p(self.params, z_sym,
                                             self._scale_table_dev)
        y_sym, latent_bits_dev = self._latent_syms_p(self.params, y, mu,
                                                     sigma, spatial_shape)

        z_sym_np = _to_nchw(z_sym).astype(np.int32)
        y_sym_np = _to_nchw(y_sym).astype(np.int32)
        idx_np = _to_nchw(idx).astype(np.int32)
        batch = z_sym_np.shape[0]
        hyper_spatial = z_sym_np.shape[2:]

        hyper_bits = float(hyper_bits_dev)
        latent_bits = float(latent_bits_dev)
        n_pixels = float(np.prod(spatial_shape))
        hyper_bpp = hyper_bits / n_pixels
        latent_bpp = latent_bits / n_pixels

        z_encoded, hyper_coding_shape = self.factorized.compress_symbols(
            z_sym_np, vectorize=self.vectorize)
        y_encoded, latent_coding_shape = self.conditional.compress_symbols(
            y_sym_np, idx_np, vectorize=self.vectorize)

        return CompressionOutput(
            hyperlatents_encoded=z_encoded,
            latents_encoded=y_encoded,
            hyperlatent_spatial_shape=tuple(hyper_spatial),
            spatial_shape=spatial_shape,
            hyper_coding_shape=tuple(hyper_coding_shape),
            latent_coding_shape=tuple(latent_coding_shape),
            batch_shape=batch,
            hyperlatent_bits=hyper_bits,
            latent_bits=latent_bits,
            total_bits=hyper_bits + latent_bits,
            hyperlatent_bpp=hyper_bpp,
            latent_bpp=latent_bpp,
            total_bpp=hyper_bpp + latent_bpp,
        )

    def decompress(self, out: CompressionOutput,
                   tile_latents: Optional[int] = None,
                   halo_latents: int = 16) -> np.ndarray:
        """Returns the reconstruction, (1,H,W,3) float in [0,1].

        tile_latents: run the generator on latent tiles of this size (with
        `halo_latents` context) instead of the whole latent map — bounds HBM
        for very large images (the reference OOMs beyond ~4000x4000,
        src/README.md:113-114).
        """
        if not self._tables_built:
            self.build_tables()
        z_sym_np = self.factorized.decompress_symbols(
            out.hyperlatents_encoded, out.batch_shape,
            out.hyperlatent_spatial_shape, vectorize=self.vectorize)
        z_sym = jnp.asarray(_to_nhwc_int(z_sym_np), jnp.int16)
        # Same jitted program as the encoder side -> identical indices.
        mu, sigma, idx = self._synth_stats_p(self.params, z_sym,
                                             self._scale_table_dev)
        idx_np = _to_nchw(idx).astype(np.int32)
        y_sym_np = self.conditional.decompress_symbols(
            out.latents_encoded, idx_np, vectorize=self.vectorize)
        y_sym = jnp.asarray(_to_nhwc_int(y_sym_np), jnp.int16)

        h, w = out.spatial_shape
        if tile_latents is not None:
            from hific_tpu.tiling import tiled_upsample_apply

            y_hat = jnp.asarray(y_sym, jnp.float32) + mu
            ext = tile_latents + 2 * halo_latents
            gen = lambda lat: self._generate(lat, (ext * 16, ext * 16))
            recon = tiled_upsample_apply(gen, y_hat, scale=16,
                                         tile=tile_latents, halo=halo_latents)
            return np.clip(recon[:, :h, :w, :], 0.0, 1.0)
        return np.asarray(self._gen_syms_p(self.params, y_sym, mu, (h, w)))

    def reconstruct(self, x) -> np.ndarray:
        """Eval-mode reconstruction WITHOUT entropy coding (the reference's
        `--reconstruct` mode, compress.py:225): pad -> encode -> hard
        quantization -> generate. Device-only; no bitstream."""
        x = jnp.asarray(x, jnp.float32)
        spatial_shape = tuple(int(s) for s in x.shape[1:3])
        if not hasattr(self, "_reconstruct_jit"):
            model = self._model

            def _fn(p, x, spatial_shape):
                v = {"params": p}
                y, _ = model.apply(v, x, method=HiFiC.encode)
                z = model.apply(v, y, method=HiFiC.hyper_analyze)
                z_q = jnp.floor(z + 0.5)
                mu, _ = model.apply(v, z_q, method=HiFiC.hyper_synthesize)
                y_q = jnp.floor(y - mu + 0.5) + mu
                return model.apply(v, y_q, spatial_shape,
                                   method=HiFiC.generate)

            self._reconstruct_jit = jax.jit(_fn, static_argnums=(2,))
        return np.asarray(self._reconstruct_jit(self.params, x, spatial_shape))

    # ------------------------------------------------------------------ #

    def compress_file(self, x, path: str) -> Tuple[float, float]:
        """Compress to a `.hfc` file; returns (actual_bpp, theoretical_bpp)."""
        return save_compressed(self.compress(x), path)

    def decompress_file(self, path: str) -> np.ndarray:
        return self.decompress(load_compressed(path))

    # ------------------------------------------------------------------ #

    def compress_many(self, images) -> list:
        """Pipelined batch compression: the TPU runs image i+1's transforms
        while the host rANS-codes image i (the reference serializes these —
        its coder is the acknowledged bottleneck, src/README.md:89).

        JAX's async dispatch does the overlap: stage-1 device work for the
        next image is enqueued before the host blocks on the previous
        image's arrays.
        """
        if not self._tables_built:
            self.build_tables()

        # Stage 1 (device, async): the full device side of every image is
        # enqueued before the host blocks on any symbols.
        staged = []
        for x in images:
            x = jnp.asarray(x, jnp.float32)
            spatial_shape = tuple(int(s) for s in x.shape[1:3])
            y, _ = self._encode(x)
            z_sym, hyper_bits_dev = self._code_hyper_p(self.params, y)
            mu, sigma, idx = self._synth_stats_p(self.params, z_sym,
                                                 self._scale_table_dev)
            y_sym, latent_bits_dev = self._latent_syms_p(
                self.params, y, mu, sigma, spatial_shape)
            staged.append((spatial_shape, z_sym, y_sym, idx,
                           hyper_bits_dev, latent_bits_dev))

        outputs = []
        for (spatial_shape, z_sym, y_sym, idx, hyper_bits_dev,
             latent_bits_dev) in staged:
            z_sym_np = _to_nchw(z_sym).astype(np.int32)  # sync for image i
            y_sym_np = _to_nchw(y_sym).astype(np.int32)
            idx_np = _to_nchw(idx).astype(np.int32)
            batch, hyper_spatial = z_sym_np.shape[0], z_sym_np.shape[2:]
            hyper_bits = float(hyper_bits_dev)
            latent_bits = float(latent_bits_dev)
            n_pixels = float(np.prod(spatial_shape))
            hyper_bpp, latent_bpp = (hyper_bits / n_pixels,
                                     latent_bits / n_pixels)

            z_encoded, hyper_coding_shape = self.factorized.compress_symbols(
                z_sym_np, vectorize=self.vectorize)
            y_encoded, latent_coding_shape = self.conditional.compress_symbols(
                y_sym_np, idx_np, vectorize=self.vectorize)
            outputs.append(CompressionOutput(
                hyperlatents_encoded=z_encoded,
                latents_encoded=y_encoded,
                hyperlatent_spatial_shape=tuple(hyper_spatial),
                spatial_shape=spatial_shape,
                hyper_coding_shape=tuple(hyper_coding_shape),
                latent_coding_shape=tuple(latent_coding_shape),
                batch_shape=batch,
                hyperlatent_bits=hyper_bits,
                latent_bits=latent_bits,
                total_bits=hyper_bits + latent_bits,
                hyperlatent_bpp=hyper_bpp,
                latent_bpp=latent_bpp,
                total_bpp=hyper_bpp + latent_bpp,
            ))
        return outputs
