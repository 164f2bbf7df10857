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


class Codec:
    """Evaluation-mode compression/decompression engine."""

    def __init__(self, config: Config, params, vectorize: bool = True):
        self.config = config
        self.params = params
        self.vectorize = vectorize
        model = HiFiC(config)
        self._model = model

        v = {"params": params}
        self._encode = jax.jit(
            lambda x: model.apply(v, x, method=HiFiC.encode))
        self._hyper_analyze = jax.jit(
            lambda y: model.apply(v, y, method=HiFiC.hyper_analyze))
        self._hyper_synthesize = jax.jit(
            lambda z: model.apply(v, z, method=HiFiC.hyper_synthesize))
        self._generate = jax.jit(
            lambda lat, shape: model.apply(v, lat, shape,
                                           method=HiFiC.generate),
            static_argnums=(1,))

        cdf_logits_fn = lambda t: model.apply(
            v, t, method=HiFiC.hyperlatent_cdf_logits)
        likelihood_fn = lambda t: model.apply(
            v, t, method=HiFiC.hyperlatent_likelihood_at)
        self.factorized = FactorizedEntropyModel(
            cdf_logits_fn, jax.jit(likelihood_fn), config.hyperlatent_filters)
        self.conditional = ConditionalEntropyModel(config.likelihood_type)
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

        y, _ = self._encode(x)
        z = self._hyper_analyze(y)

        y_np = _to_nchw(y)
        z_np = _to_nchw(z)
        batch = z_np.shape[0]
        hyper_spatial = z_np.shape[2:]

        hyper_bits, hyper_bpp, _ = self.factorized.estimate_bits(
            z_np, spatial_shape)
        z_encoded, hyper_coding_shape = self.factorized.compress(
            z_np, vectorize=self.vectorize)
        # Decode our own hyperlatents: decoder must see identical integers.
        z_decoded = self.factorized.decompress(
            z_encoded, batch, hyper_spatial, vectorize=self.vectorize)

        means, scales = self._hyper_synthesize(_to_nhwc(z_decoded))
        means_np, scales_np = _to_nchw(means), _to_nchw(scales)

        latent_bits, latent_bpp, _ = self.conditional.estimate_bits(
            y_np, means_np, scales_np, spatial_shape)
        y_encoded, latent_coding_shape = self.conditional.compress(
            y_np, means_np, scales_np, vectorize=self.vectorize)

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
        z_decoded = self.factorized.decompress(
            out.hyperlatents_encoded, out.batch_shape,
            out.hyperlatent_spatial_shape, vectorize=self.vectorize)
        means, scales = self._hyper_synthesize(_to_nhwc(z_decoded))
        means_np, scales_np = _to_nchw(means), _to_nchw(scales)
        y_decoded = self.conditional.decompress(
            out.latents_encoded, means_np, scales_np, vectorize=self.vectorize)
        y_nhwc = _to_nhwc(y_decoded)
        h, w = out.spatial_shape
        if tile_latents is not None:
            from hific_tpu.tiling import tiled_upsample_apply

            ext = tile_latents + 2 * halo_latents
            gen = lambda lat: self._generate(lat, (ext * 16, ext * 16))
            recon = tiled_upsample_apply(gen, y_nhwc, scale=16,
                                         tile=tile_latents, halo=halo_latents)
            return np.clip(recon[:, :h, :w, :], 0.0, 1.0)
        return np.asarray(self._generate(y_nhwc, (h, w)))

    def reconstruct(self, x) -> np.ndarray:
        """Eval-mode reconstruction WITHOUT entropy coding (the reference's
        `--reconstruct` mode, compress.py:225): pad -> encode -> hard
        quantization -> generate. Device-only; no bitstream."""
        x = jnp.asarray(x, jnp.float32)
        spatial_shape = tuple(int(s) for s in x.shape[1:3])
        if not hasattr(self, "_reconstruct_jit"):
            model = self._model
            v = {"params": self.params}

            def _fn(x, spatial_shape):
                y, _ = model.apply(v, x, method=HiFiC.encode)
                z = model.apply(v, y, method=HiFiC.hyper_analyze)
                z_q = jnp.floor(z + 0.5)
                mu, _ = model.apply(v, z_q, method=HiFiC.hyper_synthesize)
                y_q = jnp.floor(y - mu + 0.5) + mu
                return model.apply(v, y_q, spatial_shape,
                                   method=HiFiC.generate)

            self._reconstruct_jit = jax.jit(_fn, static_argnums=(1,))
        return np.asarray(self._reconstruct_jit(x, spatial_shape))

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

        # Stage 1 (device, async): encode + hyper-analyze every image.
        staged = []
        for x in images:
            x = jnp.asarray(x, jnp.float32)
            y, _ = self._encode(x)
            z = self._hyper_analyze(y)
            staged.append((x.shape[1:3], y, z))

        outputs = []
        for spatial_shape, y, z in staged:
            spatial_shape = tuple(int(s) for s in spatial_shape)
            y_np, z_np = _to_nchw(y), _to_nchw(z)  # sync point for image i
            batch, hyper_spatial = z_np.shape[0], z_np.shape[2:]

            hyper_bits, hyper_bpp, _ = self.factorized.estimate_bits(
                z_np, spatial_shape)
            z_encoded, hyper_coding_shape = self.factorized.compress(
                z_np, vectorize=self.vectorize)
            z_decoded = self.factorized.decompress(
                z_encoded, batch, hyper_spatial, vectorize=self.vectorize)
            means, scales = self._hyper_synthesize(_to_nhwc(z_decoded))
            means_np, scales_np = _to_nchw(means), _to_nchw(scales)
            latent_bits, latent_bpp, _ = self.conditional.estimate_bits(
                y_np, means_np, scales_np, spatial_shape)
            y_encoded, latent_coding_shape = self.conditional.compress(
                y_np, means_np, scales_np, vectorize=self.vectorize)
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
