"""Host-side entropy models: quantize symbols, select CDF rows, run rANS.

Equivalents of the reference's HyperpriorEntropyModel
(src/compression/hyperprior_model.py:21-249) and PriorEntropyModel
(src/compression/prior_model.py:29-248), restructured as stateless-ish host
classes over `CdfTables`. All tensors here are numpy in NCHW — the codec
transposes at the device boundary — so the lane layout (channels-as-lanes,
row-major spatial walk) matches the reference bitstream.
"""

from typing import Callable, Optional, Tuple

import numpy as np

from hific_tpu.entropy import coding
from hific_tpu.entropy.tables import (
    CdfTables,
    SCALES_MIN,
    build_factorized_tables,
    build_scale_tables,
    compute_scale_indices,
    estimate_tails,
    prior_scale_table,
)
from hific_tpu.models.density import PRECISION_P, TAIL_MASS

import jax.numpy as jnp


def import_cdf_tables(cdf, cdf_length, cdf_offset, precision: int
                      ) -> CdfTables:
    """Wrap raw quantized-CDF arrays (any int dtype, reference layout) into
    a CdfTables bundle with the O(1) inverse decode table rebuilt."""
    from hific_tpu.entropy.coding import build_inverse_table

    cdf = np.ascontiguousarray(np.asarray(cdf), dtype=np.uint32)
    cdf_length = np.asarray(cdf_length, np.int32)
    cdf_offset = np.asarray(cdf_offset, np.int32)
    return CdfTables(cdf, cdf_length, cdf_offset,
                     build_inverse_table(cdf, cdf_length, precision),
                     int(precision))


class FactorizedEntropyModel:
    """Entropy model for the learned factorized hyperlatent density: one CDF
    row per channel, parameters independent of the data."""

    def __init__(self, cdf_logits_fn: Callable, likelihood_fn: Callable,
                 n_channels: int, tail_mass: float = TAIL_MASS,
                 precision: int = PRECISION_P):
        """cdf_logits_fn / likelihood_fn: jax callables on (C,1,M) arrays
        (bound from HyperlatentDensity with trained params)."""
        self.cdf_logits_fn = cdf_logits_fn
        self.likelihood_fn = likelihood_fn
        self.n_channels = n_channels
        self.tail_mass = float(tail_mass)
        self.precision = int(precision)
        self.tables: Optional[CdfTables] = None
        self.medians: Optional[np.ndarray] = None

    def build_tables(self):
        shape = (self.n_channels, 1, 1)
        target = float(np.log(2.0 / self.tail_mass - 1.0))
        lower = np.asarray(
            estimate_tails(self.cdf_logits_fn, -target, shape)).reshape(-1)
        upper = np.asarray(
            estimate_tails(self.cdf_logits_fn, target, shape)).reshape(-1)
        self.medians = np.asarray(
            estimate_tails(self.cdf_logits_fn, 0.0, shape)).reshape(-1)
        self.tables = build_factorized_tables(
            self.likelihood_fn, lower, upper, self.precision)
        return self.tables

    def _indices(self, batch: int, broadcast_shape) -> np.ndarray:
        idx = np.arange(self.n_channels, dtype=np.int32).reshape(-1, 1, 1)
        idx = np.broadcast_to(idx, (self.n_channels, *broadcast_shape))
        return np.broadcast_to(idx[None], (batch, *idx.shape))

    def compress(self, z: np.ndarray, vectorize: bool = True
                 ) -> Tuple[np.ndarray, tuple]:
        """z: float (N,C,H,W). Returns (uint32 stream, coding_shape)."""
        return self.compress_symbols(np.floor(z + 0.5).astype(np.int32),
                                     vectorize)

    def compress_symbols(self, symbols: np.ndarray, vectorize: bool = True,
                         shards: int = 1) -> Tuple[np.ndarray, tuple]:
        """Pre-quantized integer symbols (N,C,H,W) -> stream. shards > 1
        codes lane groups in parallel threads (container v2 payload)."""
        assert self.tables is not None, "call build_tables() first"
        symbols = np.asarray(symbols, np.int32)
        indices = self._indices(symbols.shape[0], symbols.shape[2:])
        if shards > 1:
            assert vectorize, "sharded coding requires the vectorized path"
            return coding.encode_indexed_sharded(
                symbols, indices, self.tables.cdf, self.tables.cdf_length,
                self.tables.cdf_offset, self.precision, shards)
        enc = coding.encode_indexed if vectorize else coding.encode_indexed_scalar
        encoded, coding_shape = enc(symbols, indices, self.tables.cdf,
                                    self.tables.cdf_length,
                                    self.tables.cdf_offset, self.precision)
        return encoded, coding_shape

    def decompress(self, encoded: np.ndarray, batch: int, broadcast_shape,
                   vectorize: bool = True) -> np.ndarray:
        return self.decompress_symbols(encoded, batch, broadcast_shape,
                                       vectorize).astype(np.float32)

    def decompress_symbols(self, encoded: np.ndarray, batch: int,
                           broadcast_shape, vectorize: bool = True,
                           sharded: bool = False) -> np.ndarray:
        assert self.tables is not None
        indices = self._indices(batch, broadcast_shape)
        if sharded:
            return coding.decode_indexed_sharded(
                encoded, indices, self.tables.cdf, self.tables.cdf_length,
                self.tables.cdf_offset, self.precision,
                inverse_table=self.tables.inverse)
        dec = coding.decode_indexed if vectorize else coding.decode_indexed_scalar
        return dec(encoded, indices, self.tables.cdf,
                   self.tables.cdf_length, self.tables.cdf_offset,
                   self.precision, inverse_table=self.tables.inverse)

    def import_tables(self, cdf, cdf_length, cdf_offset,
                      precision: Optional[int] = None) -> CdfTables:
        """Install externally-built quantized CDF tables (e.g. built once at
        train time and shipped with the model, or the reference's
        torch-built tables for bit-exact interop). Sender and receiver MUST
        code against identical tables; importing pins them explicitly
        instead of relying on both float stacks rounding identically."""
        self.tables = import_cdf_tables(cdf, cdf_length, cdf_offset,
                                        precision or self.precision)
        return self.tables

    def estimate_bits(self, z: np.ndarray, spatial_shape) -> Tuple[float, float, float]:
        """(total bits, bpp, bits-per-image) under the learned density, after
        hard quantization (reference hyperprior_model.py:108-133)."""
        q = np.floor(np.asarray(z) + 0.5)
        flat = jnp.asarray(
            q.transpose(1, 0, 2, 3).reshape(q.shape[1], 1, -1), jnp.float32)
        lik = np.asarray(self.likelihood_fn(flat), np.float64)
        bits = float(-np.sum(np.log(lik + 1e-9)) / np.log(2.0))
        n_pixels = float(np.prod(spatial_shape))
        return bits, bits / n_pixels, bits / q.shape[0]


class ConditionalEntropyModel:
    """Entropy model for the mean-scale conditional latent prior: a static
    log-spaced scale table, one CDF row per table scale; means are the
    quantization offsets."""

    def __init__(self, likelihood_type: str = "gaussian",
                 min_scale: float = SCALES_MIN, tail_mass: float = TAIL_MASS,
                 precision: int = PRECISION_P, scale_table=None):
        from hific_tpu.ops import maths as m

        self.likelihood_type = likelihood_type
        if likelihood_type == "gaussian":
            std_cdf, std_q = m.standardized_cdf_gaussian, m.standardized_quantile_gaussian
        elif likelihood_type == "logistic":
            std_cdf, std_q = m.standardized_cdf_logistic, m.standardized_quantile_logistic
        else:
            raise ValueError(likelihood_type)
        self._std_cdf = std_cdf
        self.min_scale = float(min_scale)
        self.precision = int(precision)
        self.scale_table = (np.maximum(prior_scale_table(), min_scale)
                            if scale_table is None
                            else np.asarray(scale_table, np.float64))
        self.tables = build_scale_tables(std_cdf, std_q, self.scale_table,
                                         tail_mass, precision)

    def _indices(self, scales: np.ndarray) -> np.ndarray:
        return compute_scale_indices(scales, self.scale_table)

    def compress(self, y: np.ndarray, means: np.ndarray, scales: np.ndarray,
                 vectorize: bool = True) -> Tuple[np.ndarray, tuple]:
        return self.compress_symbols(
            np.floor(y + 0.5 - means).astype(np.int32),
            self._indices(scales), vectorize)

    def compress_symbols(self, symbols: np.ndarray, indices: np.ndarray,
                         vectorize: bool = True, shards: int = 1
                         ) -> Tuple[np.ndarray, tuple]:
        """Pre-quantized symbols + precomputed scale-table indices."""
        symbols = np.asarray(symbols, np.int32)
        indices = np.asarray(indices, np.int32)
        if shards > 1:
            assert vectorize, "sharded coding requires the vectorized path"
            return coding.encode_indexed_sharded(
                symbols, indices, self.tables.cdf, self.tables.cdf_length,
                self.tables.cdf_offset, self.precision, shards)
        enc = coding.encode_indexed if vectorize else coding.encode_indexed_scalar
        encoded, coding_shape = enc(symbols, indices, self.tables.cdf,
                                    self.tables.cdf_length,
                                    self.tables.cdf_offset, self.precision)
        return encoded, coding_shape

    def decompress(self, encoded: np.ndarray, means: np.ndarray,
                   scales: np.ndarray, vectorize: bool = True) -> np.ndarray:
        symbols = self.decompress_symbols(encoded, self._indices(scales),
                                          vectorize)
        return symbols.astype(np.float32) + means

    def decompress_symbols(self, encoded: np.ndarray, indices: np.ndarray,
                           vectorize: bool = True, sharded: bool = False
                           ) -> np.ndarray:
        indices = np.asarray(indices, np.int32)
        if sharded:
            return coding.decode_indexed_sharded(
                encoded, indices, self.tables.cdf, self.tables.cdf_length,
                self.tables.cdf_offset, self.precision,
                inverse_table=self.tables.inverse)
        dec = coding.decode_indexed if vectorize else coding.decode_indexed_scalar
        return dec(encoded, indices, self.tables.cdf,
                   self.tables.cdf_length, self.tables.cdf_offset,
                   self.precision, inverse_table=self.tables.inverse)

    def import_tables(self, cdf, cdf_length, cdf_offset,
                      precision: Optional[int] = None) -> CdfTables:
        """Install externally-built scale tables (see
        FactorizedEntropyModel.import_tables)."""
        self.tables = import_cdf_tables(cdf, cdf_length, cdf_offset,
                                        precision or self.precision)
        return self.tables

    def estimate_bits(self, y, means, scales, spatial_shape):
        """Shannon bits of hard-quantized latents under the continuous
        boxcar likelihood (reference prior_model.py:122-146)."""
        from hific_tpu.models.density import latent_likelihood

        q = np.floor(np.asarray(y) - means + 0.5) + means
        lik = np.asarray(latent_likelihood(
            jnp.asarray(q, jnp.float32), jnp.asarray(means, jnp.float32),
            jnp.asarray(np.maximum(scales, self.min_scale), jnp.float32),
            self.likelihood_type), np.float64)
        bits = float(-np.sum(np.log(lik + 1e-9)) / np.log(2.0))
        n_pixels = float(np.prod(spatial_shape))
        return bits, bits / n_pixels, bits / q.shape[0]
