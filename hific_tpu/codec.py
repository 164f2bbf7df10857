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


# Encoder downsampling factor (4 stride-2 stages; reference encoder.py).
ENC_SCALE = 16


class Codec:
    """Evaluation-mode compression/decompression engine."""

    def __init__(self, config: Config, params, vectorize: bool = True,
                 coder_threads: int = 1, pipeline_chunk: int = 1,
                 wire_chunk: int = 1):
        """coder_threads > 1 lane-shards each rANS payload into that many
        independent streams coded in parallel host threads (container v2;
        ~zero size overhead, not reference-interoperable). Decode reads the
        shard count from the payload, so any codec can decode any file.

        pipeline_chunk: in compress_many/decompress_many, chunks of this
        many same-shape host images ride ONE device program each — one
        upload, one dispatch, one fetch per chunk instead of per image.
        Default 1 (off): for megapixel images the per-image async pipeline
        measures FASTER end-to-end on this transport (the wire overlaps
        per-image transfers with compute, while a chunk serializes
        upload -> compute -> fetch internally; measured 2.99 vs 1.94 MP/s
        on the 4x1MP bench). Chunking pays when per-RPC flat costs (~30 ms
        here) dominate the payload — i.e. batches of SMALL images, where
        it collapses 3-4 RPCs/image into 3-4 RPCs/chunk.

        wire_chunk: in compress_many/decompress_many, batch only the host
        SYNC POINTS (packed-buffer / coding-index fetches, symbol uploads)
        of this many same-shape images into one stacked transfer each,
        while every device program stays per-image. Orthogonal to
        pipeline_chunk (which batches the COMPUTE and measured slower for
        megapixel images): here the per-RPC flat cost (~28 ms on this
        transport) is amortized over the chunk without growing any
        executable. On the host-coder paths it also fans the per-image
        C++ rANS calls across a thread pool so coding rides under the
        chip's generator/synthesis time."""
        self.config = config
        self.params = params
        self.vectorize = vectorize
        self.coder_threads = max(1, int(coder_threads))
        self.pipeline_chunk = max(1, int(pipeline_chunk))
        self.wire_chunk = max(1, int(wire_chunk))
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
        self._generate_u8_p = jax.jit(
            lambda p, lat, shape: (model.apply(
                {"params": p}, lat, shape, method=HiFiC.generate)
                * 255.0 + 0.5).astype(jnp.uint8),
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
        self._gen_syms_u8_p = jax.jit(
            lambda p, y_sym, mu, shape: model.apply(
                {"params": p}, y_sym, mu, shape,
                method=HiFiC.generate_u8_from_symbols),
            static_argnums=(3,))
        # Compress-side programs. The device path is THREE dispatches, not
        # one fused program, BY CORRECTNESS REQUIREMENT: the coding indices
        # must come from the SAME compiled synth_stats executable the
        # decoder runs (`_synth_stats_p`) — a fused copy of the same source
        # is not bit-identical (XLA layout/fusion changes float
        # accumulation; measured 3744/2.7M flipped scale indices at a
        # (128,96) latent grid => rANS desync => destroyed image; round-5
        # diagnosis, scripts/diag_flagship5.py). Stage 1 (front) and
        # stage 3 (pack) exchange only device-resident arrays with stage 2,
        # so the extra dispatches cost enqueue latency, not wire payload.
        self._front_p = jax.jit(
            lambda p, x: model.apply({"params": p}, x,
                                     method=HiFiC.compress_front))
        self._front_lat_p = jax.jit(
            lambda p, y: model.apply(
                {"params": p}, y, method=HiFiC.compress_front_from_latents))
        # Stage 3: latent quantization + ONE packed uint8 fetch (int8
        # symbols + escapes; each fetch costs ~30 ms flat + ~21 ms/MB on
        # this transport, see PERF.md).
        self._pack_p = jax.jit(
            lambda p, y, mu, sigma, idx, z_sym, hb: model.apply(
                {"params": p}, y, mu, sigma, idx, z_sym, hb,
                method=HiFiC.latent_symbols_packed))
        # Fully-fused variants: telemetry/diagnostics ONLY (their idx is
        # NOT coding-safe — see HiFiC.compress_symbols docstring).
        self._compress_syms_p = jax.jit(
            lambda p, x, table: model.apply(
                {"params": p}, x, table, method=HiFiC.compress_symbols))
        self._compress_packed_p = jax.jit(
            lambda p, x, table: model.apply(
                {"params": p}, x, table,
                method=HiFiC.compress_symbols_packed))
        # uint8 ingestion: images upload as 3 B/px and normalize on device
        # (4x less wire than fp32 — the upload is part of the honest codec
        # cost). Mirrors EvalDataset's host-side mapping exactly.
        def _u8_to_model(x8):
            x = x8.astype(jnp.float32) / 255.0
            if config.normalize_input_image:
                x = x * 2.0 - 1.0
            return x

        self._front_u8_p = jax.jit(
            lambda p, x8: model.apply({"params": p}, _u8_to_model(x8),
                                      method=HiFiC.compress_front))
        self._encoder_tile_u8_p = jax.jit(
            lambda p, x8: model.apply({"params": p}, _u8_to_model(x8),
                                      method=HiFiC.encoder_forward))
        # Encode-side tiling programs: bare encoder per tile (ONE compiled
        # executable for any image size), then the hyper/symbol stages run
        # once on the assembled latents (tiny vs image-resolution work).
        self._encoder_tile_p = jax.jit(
            lambda p, x: model.apply({"params": p}, x,
                                     method=HiFiC.encoder_forward))
        self._gen_packed_u8_p = jax.jit(
            lambda p, y8, pos, val, mu, shape: model.apply(
                {"params": p}, y8, pos, val, mu, shape,
                method=HiFiC.generate_u8_from_packed_symbols),
            static_argnums=(5,))
        # Wire-chunk helper: stacks same-shape per-image device arrays so a
        # chunk's worth of host fetches collapses into ONE sync RPC (the
        # stack itself is a chained — i.e. free — device dispatch). One
        # compile per (arity, shape, dtype), cached by jit.
        self._stack_p = jax.jit(lambda *xs: jnp.stack(xs))
        self._shape_cache = {}

        # On-device rANS decode (entropy/device_decode.py): decompression
        # as ONE tiny upload (hyper symbols + coded stream) + three chained
        # async dispatches (unpack -> shared synth_stats -> scan+generate)
        # + the uint8 image download. The middle dispatch is the SAME
        # executable every encode path used for the coding indices
        # (HiFiC.synth_stats — bit-identity requirement); the unpack and
        # finish stages are integer/generator work with no such constraint.
        # Tables ship to the device lazily, once.
        self._dd_tables = None

        def _dd_unpack_fn(buf, z_shape):
            from hific_tpu.entropy.device_decode import unpack_decode_input

            return unpack_decode_input(buf, z_shape)

        def _dd_finish_fn(p, stream, mu, idx, t_pair, maxv, offs, out_hw):
            from hific_tpu.entropy.device_decode import decode_scan

            _, hy, wy, c = idx.shape
            idx_l = idx.reshape(hy * wy, c).astype(jnp.int32)
            y_sym = decode_scan(stream, idx_l, t_pair, maxv, offs)
            y = y_sym.reshape(1, hy, wy, c).astype(jnp.float32) + mu
            img = model.apply({"params": p}, y, out_hw, method=HiFiC.generate)
            return (img * 255.0 + 0.5).astype(jnp.uint8)

        self._dd_unpack_p = jax.jit(_dd_unpack_fn, static_argnums=(1,))
        self._dd_finish_p = jax.jit(_dd_finish_fn, static_argnums=(7,))
        # Chunked variants (same unroll-not-vmap trade as the encode-side
        # batch programs): B same-shape images' packed decode inputs as one
        # [B, buflen] upload and one unpack dispatch returning per-image
        # tuples (so each z_sym feeds the per-image shared synth_stats),
        # then one finish dispatch + one [B,1,H,W,3] uint8 download.
        self._dd_unpack_batch_p = jax.jit(
            lambda bufs, z_shape: tuple(
                _dd_unpack_fn(bufs[i], z_shape)
                for i in range(bufs.shape[0])),
            static_argnums=(1,))
        self._dd_finish_batch_p = jax.jit(
            lambda p, streams, mus, idxs, t_pair, maxv, offs, out_hw:
                jnp.stack([_dd_finish_fn(
                    p, streams[i], mus[i], idxs[i], t_pair, maxv, offs,
                    out_hw) for i in range(len(streams))]),
            static_argnums=(7,))

        # On-device rANS ENCODE (entropy/device_encode.py): quantization +
        # entropy coding DOWNSTREAM of the shared synth_stats executable
        # (mu/sigma/idx arrive as device-resident arguments — the coding
        # indices must be bit-identical to the decoder's recompute, see
        # HiFiC.synth_stats). Fetches only head words + spilled stream
        # words (~the .hfc payload) instead of ~2 MB of raw symbols +
        # indices.
        def _dev_scan_pack_fn(p, y, mu, sigma, idx, z_sym, hb,
                              y_cdf, y_len, y_off, z_cdf, z_len, z_off):
            from hific_tpu.entropy.device_encode import (
                Z_SPILL_BITS, default_caps, encode_scan)

            y_sym, lb = model.apply({"params": p}, y, mu, sigma, None,
                                    method=HiFiC.latent_symbols)
            _, hy, wy, cy = y_sym.shape
            _, hz, wz, cz = z_sym.shape
            y_l = y_sym.reshape(hy * wy, cy).astype(jnp.int32)
            yi_l = idx.reshape(hy * wy, cy).astype(jnp.int32)
            z_l = z_sym.reshape(hz * wz, cz).astype(jnp.int32)
            zi_l = jnp.broadcast_to(
                jnp.arange(cz, dtype=jnp.int32)[None], (hz * wz, cz))
            y_out = encode_scan(y_l, yi_l, y_cdf, y_len, y_off)
            z_sp, z_le = default_caps(hz * wz, cz, Z_SPILL_BITS)
            z_out = encode_scan(z_l, zi_l, z_cdf, z_len, z_off,
                                spill_cap=z_sp, lens_cap=z_le)
            scalars = jnp.stack([y_out[4], y_out[5], z_out[4], z_out[5]])
            bits = jax.lax.bitcast_convert_type(
                jnp.stack([hb.astype(jnp.float32),
                           lb.astype(jnp.float32)]), jnp.uint32)
            return jnp.concatenate([
                scalars, bits,
                y_out[0], y_out[1], z_out[0], z_out[1],     # heads
                y_out[3], z_out[3],                         # lens buffers
                y_out[2], z_out[2],                         # spill buffers
            ])

        self._dev_scan_pack_p = jax.jit(_dev_scan_pack_fn)
        # Chunked front stage: B same-shape images as ONE upload + ONE
        # dispatch, returning B PER-IMAGE (y, z_sym, hb) tuples (not a
        # stacked batch) so each image's z_sym feeds the per-image shared
        # synth_stats executable directly — no slice dispatches, and the
        # coding indices stay bit-identical to every decode path.
        # Deliberately an UNROLLED tuple of the per-image program, not a
        # vmap (vmap select-ifies per-image `lax.cond`s into always-
        # executed branches — measured ~2x slower).
        self._front_batch_p = jax.jit(
            lambda p, xs: tuple(
                model.apply({"params": p},
                            _u8_to_model(xs[i]) if xs.dtype == jnp.uint8
                            else xs[i],
                            method=HiFiC.compress_front)
                for i in range(xs.shape[0])))
        # Chunked scan-pack stage: B images' buffers in ONE dispatch + ONE
        # stacked fetch (each RPC leg pays ~30 ms flat on relayed
        # transports).
        self._dev_scan_pack_batch_p = jax.jit(
            lambda p, ys, mus, sigmas, idxs, z_syms, hbs, *tabs: jnp.stack(
                [_dev_scan_pack_fn(p, ys[i], mus[i], sigmas[i], idxs[i],
                                   z_syms[i], hbs[i], *tabs)
                 for i in range(len(ys))]))

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
    # Packed wire format (see HiFiC.compress_symbols_packed)

    def _symbol_shapes(self, x_shape, from_latents: bool = False):
        """(z_shape, y_shape) for a given input (or latent) shape, via
        eval_shape (no device work)."""
        key = (bool(from_latents),) + tuple(int(s) for s in x_shape)
        if key not in self._shape_cache:
            method = (HiFiC.compress_symbols_from_latents if from_latents
                      else HiFiC.compress_symbols)
            out = jax.eval_shape(
                lambda p, xx, t: self._model.apply(
                    {"params": p}, xx, t, method=method),
                self.params,
                jax.ShapeDtypeStruct(tuple(x_shape), jnp.float32),
                self._scale_table_dev)
            self._shape_cache[key] = (tuple(out[0].shape),
                                      tuple(out[1].shape))
        return self._shape_cache[key]

    def _unpack_compressed(self, buf: np.ndarray, z_shape, y_shape):
        """Parse the packed uint8 buffer. Returns
        (z_sym, y_sym int16 or None-on-escape-overflow, idx, hyper_bits,
        latent_bits)."""
        from hific_tpu.models.hific import N_LATENT_ESCAPES as K

        nz = int(np.prod(z_shape))
        ny = int(np.prod(y_shape))
        esc_count = int(buf[0:4].view(np.int32)[0])
        hyper_bits = float(buf[4:8].view(np.float32)[0])
        latent_bits = float(buf[8:12].view(np.float32)[0])
        off = 12
        z_sym = buf[off:off + 2 * nz].view(np.int16).reshape(z_shape)
        off += 2 * nz
        y8 = buf[off:off + ny].view(np.int8)
        off += ny
        idx = buf[off:off + ny].reshape(y_shape)
        off += ny
        if esc_count > K:
            return z_sym, None, idx, hyper_bits, latent_bits
        y_sym = y8.astype(np.int16)
        if esc_count:
            esc_pos = buf[off:off + 4 * K].view(np.int32)
            off += 4 * K
            esc_val = buf[off:off + 2 * K].view(np.int16)
            live = esc_pos >= 0
            y_sym[esc_pos[live]] = esc_val[live]
        return (z_sym, y_sym.reshape(y_shape), idx, hyper_bits, latent_bits)

    def _enqueue_host_compress(self, x, tile_image=None, halo_image=64):
        """Enqueue the three device stages of host-coder compression
        (front -> shared synth_stats -> packed fetch buffer); returns the
        device buffer + shapes + the stage handles needed for the escape-
        overflow fallback. All stages exchange device-resident arrays; the
        only fetch is the packed buffer (async until read).

        The coding indices inside the buffer come from `_synth_stats_p` —
        the SAME executable every decode path runs (see that method's
        docstring for the determinism requirement).

        tile_image: run the encoder on image tiles of this size with
        `halo_image` pixels of context (both multiples of 16) — bounded
        HBM for arbitrary resolutions, bit-identical latents for halos
        >= the encoder's one-sided receptive extent (49 px; default 64)."""
        is_u8 = x.dtype == jnp.uint8
        if tile_image:
            from hific_tpu.tiling import tiled_downsample_apply

            enc_tile = (self._encoder_tile_u8_p if is_u8
                        else self._encoder_tile_p)
            y_raw = tiled_downsample_apply(
                lambda t: enc_tile(self.params, t), x,
                scale=ENC_SCALE, tile=tile_image, halo=halo_image)
            y, z_sym, hb = self._front_lat_p(self.params, y_raw)
            z_shape, y_shape = self._symbol_shapes(y_raw.shape,
                                                   from_latents=True)
        else:
            front = self._front_u8_p if is_u8 else self._front_p
            y, z_sym, hb = front(self.params, x)
            z_shape, y_shape = self._symbol_shapes(x.shape)
        mu, sigma, idx = self._synth_stats_p(self.params, z_sym,
                                             self._scale_table_dev)
        buf = self._pack_p(self.params, y, mu, sigma, idx, z_sym, hb)
        return buf, z_shape, y_shape, (y, mu, sigma)

    def _device_compress(self, x, spatial_shape, tile_image=None,
                         halo_image=64):
        """Device transforms + quantization for host-coder compression.
        Returns numpy (z_sym, y_sym, idx, hyper_bits, latent_bits); ONE
        packed fetch (plus an int16 symbol fetch on the statistically-rare
        escape overflow)."""
        buf, z_shape, y_shape, stats = self._enqueue_host_compress(
            x, tile_image=tile_image, halo_image=halo_image)
        z_sym, y_sym, idx, hb, lb = self._unpack_compressed(
            np.asarray(buf), z_shape, y_shape)
        if y_sym is None:  # >N_LATENT_ESCAPES int8 escapes: unpacked path
            y_res, mu, sigma = stats
            y16, _ = self._latent_syms_p(self.params, y_res, mu, sigma, None)
            y_sym = np.asarray(y16)
        return z_sym, y_sym, idx, hb, lb

    # ------------------------------------------------------------------ #
    # Device-side entropy ENCODE path

    def _enc_tables(self):
        if getattr(self, "_enc_tables_dev", None) is None:
            def as_dev(t):
                return (jnp.asarray(np.asarray(t.cdf).astype(np.int64),
                                    jnp.int32),
                        jnp.asarray(t.cdf_length, jnp.int32),
                        jnp.asarray(t.cdf_offset, jnp.int32))

            self._enc_tables_dev = (as_dev(self.conditional.tables)
                                    + as_dev(self.factorized.tables))
        return self._enc_tables_dev

    def _enqueue_device_compress(self, x):
        """Enqueue the device-coder compression stages (front -> shared
        synth_stats -> entropy-coding scan); returns (device buffer,
        z_shape, y_shape) — caller unpacks (async-safe)."""
        z_shape, y_shape = self._symbol_shapes(x.shape)
        front = self._front_u8_p if x.dtype == jnp.uint8 else self._front_p
        y, z_sym, hb = front(self.params, x)
        mu, sigma, idx = self._synth_stats_p(self.params, z_sym,
                                             self._scale_table_dev)
        buf = self._dev_scan_pack_p(self.params, y, mu, sigma, idx, z_sym,
                                    hb, *self._enc_tables())
        return buf, z_shape, y_shape

    def _unpack_device_compress(self, buf, z_shape, y_shape, spatial_shape):
        """Parse the packed encode output into a CompressionOutput, or None
        when a capacity cap was exceeded (caller falls back to the host
        coder — statistically impossible at sane bitrates, but checked)."""
        from hific_tpu.entropy.device_encode import (Z_SPILL_BITS,
                                                     assemble_stream,
                                                     default_caps)

        buf = np.asarray(buf)
        _, hz, wz, cz = z_shape
        _, hy, wy, cy = y_shape
        py, pz = hy * wy, hz * wz
        y_sp, y_le = default_caps(py, cy)
        z_sp, z_le = default_caps(pz, cz, Z_SPILL_BITS)
        y_scur, y_ecur, z_scur, z_ecur = (int(v) for v in buf[0:4])
        if (y_scur > y_sp or y_ecur > y_le or z_scur > z_sp
                or z_ecur > z_le):
            return None
        hyper_bits, latent_bits = (float(v) for v in buf[4:6].view(np.float32))
        o = 6
        y_hi = buf[o:o + cy]; o += cy
        y_lo = buf[o:o + cy]; o += cy
        z_hi = buf[o:o + cz]; o += cz
        z_lo = buf[o:o + cz]; o += cz
        y_lens = buf[o:o + y_le]; o += y_le
        z_lens = buf[o:o + z_le]; o += z_le
        y_spill = buf[o:o + y_sp]; o += y_sp
        z_spill = buf[o:o + z_sp]; o += z_sp

        y_enc = assemble_stream(y_hi, y_lo, y_spill, y_lens, y_scur, y_ecur)
        z_enc = assemble_stream(z_hi, z_lo, z_spill, z_lens, z_scur, z_ecur)
        n_pixels = float(np.prod(spatial_shape))
        return CompressionOutput(
            hyperlatents_encoded=z_enc,
            latents_encoded=y_enc,
            hyperlatent_spatial_shape=(hz, wz),
            spatial_shape=spatial_shape,
            hyper_coding_shape=(cz, 1, 1),
            latent_coding_shape=(cy, 1, 1),
            batch_shape=1,
            hyperlatent_bits=hyper_bits,
            latent_bits=latent_bits,
            total_bits=hyper_bits + latent_bits,
            hyperlatent_bpp=hyper_bits / n_pixels,
            latent_bpp=latent_bits / n_pixels,
            total_bpp=(hyper_bits + latent_bits) / n_pixels,
        )

    def _device_encode_eligible(self, x, tile_image) -> bool:
        return (self.vectorize and self.coder_threads == 1
                and tile_image is None and int(x.shape[0]) == 1)

    # ------------------------------------------------------------------ #

    def compress(self, x, shape_bucket: Optional[int] = None,
                 tile_image: Optional[int] = None,
                 halo_image: int = 64,
                 device_encode: Optional[bool] = None) -> CompressionOutput:
        """x: (1,H,W,3) float in [0,1] (NHWC, device or numpy).

        shape_bucket: reflect-pad H,W up to multiples of this value before
        encoding. Costs a few extra coded latents but caps the number of
        distinct compiled shapes on mixed-size datasets (each new shape
        otherwise pays a fresh XLA compile).

        tile_image: encode on image tiles of this size (+halo_image
        context, both multiples of 16): bounds compression HBM for
        arbitrary resolutions (the reference OOMs >~4000x4000 and needs
        ~8 GB/MP, src/README.md:113-114). Bit-identical to whole-image
        compression (tested) when halo_image >= the encoder's one-sided
        receptive extent (49 px; default 64).

        x may also be uint8 (1,H,W,3): it uploads at 3 B/px and maps to
        the model's input range on device — the preferred ingestion path
        (bit-identical to passing the same pixels as float, tested).

        device_encode: run the rANS encoder ON DEVICE too (see
        entropy/device_encode.py): one program from pixels to stream
        words, fetching ~the .hfc payload instead of raw symbols.
        Byte-identical output either way. The encode scan trades ~30 ms
        of on-chip compute for ~35 ms of wire — a wash serially, a win
        whenever the compute overlaps other transfers — so the default
        here is the host coder; `compress_many` auto-selects the device
        coder (where the overlap is real).
        """
        if not self._tables_built:
            self.build_tables()
        x = jnp.asarray(x)
        if x.dtype != jnp.uint8:
            x = x.astype(jnp.float32)
        spatial_shape = tuple(int(s) for s in x.shape[1:3])
        if shape_bucket:
            from hific_tpu.ops.padding import pad_factor

            x = pad_factor(x, shape_bucket)

        if device_encode:
            if not self._device_encode_eligible(x, tile_image):
                raise ValueError(
                    "device_encode=True but the input is not eligible for "
                    "the device encoder (requires vectorize, batch 1, "
                    "no tiling, coder_threads == 1)")
            out = self._unpack_device_compress(
                *self._enqueue_device_compress(x), spatial_shape)
            if out is not None:
                return out
            # capacity fallback: host coder below

        # Device: transforms + quantization + rate estimates as three
        # chained async dispatches and ONE packed fetch (int8 symbols +
        # uint8 indices). The middle dispatch is the shared synth_stats
        # executable — the same compiled program every decoder runs on the
        # decoded hyperlatent symbols, which is what makes the coding
        # indices bit-identical across encode/decode (HiFiC.synth_stats).
        z_sym, y_sym, idx, hyper_bits, latent_bits = self._device_compress(
            x, spatial_shape, tile_image=tile_image, halo_image=halo_image)
        return self._finish_compress(z_sym, y_sym, idx, hyper_bits,
                                     latent_bits, spatial_shape)

    def _finish_compress(self, z_sym, y_sym, idx, hyper_bits, latent_bits,
                         spatial_shape) -> CompressionOutput:
        """Host rANS coding of the device-produced symbol planes."""
        z_sym_np = _to_nchw(z_sym).astype(np.int32)
        y_sym_np = _to_nchw(y_sym).astype(np.int32)
        idx_np = _to_nchw(idx).astype(np.int32)
        batch = z_sym_np.shape[0]
        hyper_spatial = z_sym_np.shape[2:]

        n_pixels = float(np.prod(spatial_shape))
        hyper_bpp = hyper_bits / n_pixels
        latent_bpp = latent_bits / n_pixels

        z_encoded, hyper_coding_shape = self.factorized.compress_symbols(
            z_sym_np, vectorize=self.vectorize, shards=self.coder_threads)
        y_encoded, latent_coding_shape = self.conditional.compress_symbols(
            y_sym_np, idx_np, vectorize=self.vectorize,
            shards=self.coder_threads)

        return CompressionOutput(
            hyperlatents_encoded=z_encoded,
            latents_encoded=y_encoded,
            sharded=self.coder_threads > 1,
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

    def _device_decode_eligible(self, out: CompressionOutput) -> bool:
        """The on-device decoder covers the serving path: single image,
        lane-vectorized v1 streams (sharded v2 payloads and batch>1 lane
        layouts stay on the multithreaded host path)."""
        return (self.vectorize and not out.sharded
                and int(out.batch_shape) == 1)

    def _device_decode_input(self, out: CompressionOutput):
        """Host side of the fused device decode: hyper rANS (host, ~1 ms)
        + the packed single-upload buffer. Returns (buf, z_shape, out_hw)."""
        from hific_tpu.entropy.device_decode import (
            build_device_tables, pack_decode_input)

        if self._dd_tables is None:
            t = self.conditional.tables
            dt = build_device_tables(t.cdf, t.cdf_length, t.cdf_offset,
                                     t.inverse)
            self._dd_tables = tuple(jnp.asarray(a) for a in dt)
        z_sym_np = self.factorized.decompress_symbols(
            out.hyperlatents_encoded, out.batch_shape,
            out.hyperlatent_spatial_shape, vectorize=True)
        z_nhwc = _to_nhwc_int(z_sym_np).astype(np.int16)
        buf = pack_decode_input(z_nhwc, out.latents_encoded)
        return buf, tuple(z_nhwc.shape), tuple(
            int(s) for s in out.spatial_shape)

    def _device_decode_u8(self, out: CompressionOutput):
        """Enqueue the device decode for one image (unpack -> shared
        synth_stats -> scan+generate, chained async); returns the device
        array (caller converts/blocks — keeps batch pipelining async)."""
        buf, z_shape, out_hw = self._device_decode_input(out)
        z_sym, stream = self._dd_unpack_p(jnp.asarray(buf), z_shape)
        mu, _, idx = self._synth_stats_p(self.params, z_sym,
                                         self._scale_table_dev)
        return self._dd_finish_p(self.params, stream, mu, idx,
                                 *self._dd_tables, out_hw)

    def decompress(self, out: CompressionOutput,
                   tile_latents: Optional[int] = None,
                   halo_latents: int = 16,
                   as_uint8: bool = False,
                   device_decode: Optional[bool] = None) -> np.ndarray:
        """Returns the reconstruction, (1,H,W,3): float in [0,1], or uint8
        when `as_uint8` (quantized ON DEVICE to the PNG pixel mapping —
        ships 3 bytes/px instead of 12 over relayed transports; preferred
        for serving/file output).

        tile_latents: run the generator on latent tiles of this size (with
        `halo_latents` context) instead of the whole latent map — bounds HBM
        for very large images (the reference OOMs beyond ~4000x4000,
        src/README.md:113-114).

        device_decode: rANS-decode the latents ON DEVICE (one upload, one
        dispatch, one image download; see entropy/device_decode.py).
        Default (None) auto-selects it for the uint8 single-image
        non-tiled path it covers; the result is identical either way.
        """
        if not self._tables_built:
            self.build_tables()
        if device_decode is None:
            device_decode = (as_uint8 and tile_latents is None
                             and self._device_decode_eligible(out))
        if device_decode:
            if not (as_uint8 and tile_latents is None
                    and self._device_decode_eligible(out)):
                raise ValueError(
                    "device_decode=True but this payload is not eligible: "
                    "the device decoder covers the uint8, non-tiled, "
                    "single-image, unsharded-v1 path only")
            return np.asarray(self._device_decode_u8(out))
        z_sym_np = self.factorized.decompress_symbols(
            out.hyperlatents_encoded, out.batch_shape,
            out.hyperlatent_spatial_shape, vectorize=self.vectorize,
            sharded=out.sharded)
        z_sym = jnp.asarray(_to_nhwc_int(z_sym_np), jnp.int16)
        # Same jitted program as the encoder side -> identical indices.
        mu, sigma, idx = self._synth_stats_p(self.params, z_sym,
                                             self._scale_table_dev)
        idx_np = _to_nchw(idx).astype(np.int32)
        y_sym_np = self.conditional.decompress_symbols(
            out.latents_encoded, idx_np, vectorize=self.vectorize,
            sharded=out.sharded)
        y_nhwc = _to_nhwc_int(y_sym_np)

        h, w = out.spatial_shape
        if tile_latents is not None:
            from hific_tpu.tiling import tiled_upsample_apply

            y_hat = jnp.asarray(y_nhwc, jnp.float32) + mu
            ext = tile_latents + 2 * halo_latents
            if as_uint8:
                # uint8 tiles on the wire: 4x less download per tile.
                gen = lambda lat: self._generate_u8_p(
                    self.params, lat, (ext * 16, ext * 16))
                recon = tiled_upsample_apply(
                    gen, y_hat, scale=16, tile=tile_latents,
                    halo=halo_latents)
                return recon[:, :h, :w, :]
            gen = lambda lat: self._generate(lat, (ext * 16, ext * 16))
            recon = tiled_upsample_apply(gen, y_hat, scale=16,
                                         tile=tile_latents, halo=halo_latents)
            return np.clip(recon[:, :h, :w, :], 0.0, 1.0)
        if as_uint8:
            from hific_tpu.models.hific import N_LATENT_ESCAPES as K

            # int8 + escapes upload (half the bytes of int16 symbols).
            y_flat = y_nhwc.reshape(-1)
            y8 = np.clip(y_flat, -128, 127).astype(np.int8)
            esc = np.nonzero(y_flat != y8.astype(np.int64))[0]
            if len(esc) <= K:
                pos = np.full(K, -1, np.int32)
                val = np.zeros(K, np.int16)
                pos[: len(esc)] = esc
                val[: len(esc)] = y_flat[esc]
                y8_dev = jnp.asarray(y8.reshape(y_nhwc.shape))
                return np.asarray(self._gen_packed_u8_p(
                    self.params, y8_dev, jnp.asarray(pos), jnp.asarray(val),
                    mu, (h, w)))
            return np.asarray(self._gen_syms_u8_p(
                self.params, jnp.asarray(y_nhwc, jnp.int16), mu, (h, w)))
        return np.asarray(self._gen_syms_p(
            self.params, jnp.asarray(y_nhwc, jnp.int16), mu, (h, w)))

    def decompress_many(self, outs, as_uint8: bool = True,
                        as_numpy: bool = True,
                        tile_latents: Optional[int] = None,
                        halo_latents: int = 16,
                        device_decode: Optional[bool] = None) -> list:
        """Pipelined batch decompression (mirror of compress_many): the
        host rANS-decodes and uploads image i+1's symbols while the device
        synthesizes stats / generates image i, via JAX async dispatch.

        Per-image serial decode pays two full device round trips back to
        back; here every upload/compute for later images is enqueued before
        the host blocks on earlier images' downloads.

        as_numpy=False returns DEVICE arrays (no image download) — for
        device-resident consumers and the transport-independent bench
        metric (bench.py pipelined_device_mp_s), which fences with a
        scalar fetch instead of paying the pixel wire legs.

        tile_latents: generate on latent tiles (see `decompress`) — bounds
        HBM for very large images while KEEPING the cross-image stage-1
        pipelining (all hyper decodes + synth_stats staged before any
        generator tile runs) and per-tile download/compute overlap
        (tiling.tiled_upsample_apply inflight window). Implies numpy
        results.
        """
        if not self._tables_built:
            self.build_tables()
        if device_decode is None:
            device_decode = (as_uint8 and tile_latents is None
                             and all(self._device_decode_eligible(o)
                                     for o in outs))
        elif device_decode and not (
                as_uint8 and tile_latents is None
                and all(self._device_decode_eligible(o) for o in outs)):
            raise ValueError(
                "device_decode=True but a payload is not eligible "
                "(needs as_uint8, no tiling, unsharded single-image "
                "streams)")
        if device_decode:
            chunk = self.pipeline_chunk
            if chunk == 1:
                # On-device rANS decode: every image is ONE upload + ONE
                # dispatch; all of them are enqueued before blocking on
                # any download, so device work rides ahead of the wire.
                pending = [self._device_decode_u8(o) for o in outs]
                if not as_numpy:
                    return pending
                return [np.asarray(r) for r in pending]
            # Chunk-batched variant: consecutive images with identical
            # packed-input/output shapes ride ONE [B, buflen] upload + ONE
            # dispatch + ONE [B,...] uint8 download per chunk (the decode
            # input is stream-bucketed precisely so these shapes coincide
            # across images). All chunks are enqueued before blocking on
            # any download.
            inputs = [self._device_decode_input(o) for o in outs]
            staged, i, n = [], 0, len(inputs)
            while i < n:
                buf, z_shape, out_hw = inputs[i]
                j = i + 1
                key = (len(buf), z_shape, out_hw)
                while (j < n and j - i < chunk
                       and (len(inputs[j][0]),) + inputs[j][1:] == key):
                    j += 1
                if j - i == 1:
                    z_sym, stream = self._dd_unpack_p(jnp.asarray(buf),
                                                      z_shape)
                    mu, _, idx = self._synth_stats_p(self.params, z_sym,
                                                     self._scale_table_dev)
                    img = self._dd_finish_p(self.params, stream, mu, idx,
                                            *self._dd_tables, out_hw)
                    staged.append((img, 0))
                else:
                    bufs = jnp.asarray(np.stack([b for b, _, _ in
                                                 inputs[i:j]]))
                    unpacked = self._dd_unpack_batch_p(bufs, z_shape)
                    stats = [self._synth_stats_p(self.params, zs,
                                                 self._scale_table_dev)
                             for zs, _ in unpacked]
                    imgs = self._dd_finish_batch_p(
                        self.params,
                        tuple(st for _, st in unpacked),     # streams
                        tuple(s[0] for s in stats),          # mus
                        tuple(s[2] for s in stats),          # idxs
                        *self._dd_tables, out_hw)
                    staged.append((imgs, j - i))
                i = j
            results = []
            for arr, b in staged:
                if as_numpy:
                    arr = np.asarray(arr)      # ONE download per chunk
                if b:
                    results.extend(arr[k] for k in range(b))
                else:
                    results.append(arr)
            return results
        from hific_tpu.models.hific import N_LATENT_ESCAPES as K

        # Stage 1: hyper rANS (host) + synth_stats (device, async) for all.
        staged = []
        for out in outs:
            z_sym_np = self.factorized.decompress_symbols(
                out.hyperlatents_encoded, out.batch_shape,
                out.hyperlatent_spatial_shape, vectorize=self.vectorize,
                sharded=out.sharded)
            z_sym = jnp.asarray(_to_nhwc_int(z_sym_np), jnp.int16)
            mu, sigma, idx = self._synth_stats_p(self.params, z_sym,
                                                 self._scale_table_dev)
            staged.append((out, mu, idx))

        if self.wire_chunk > 1 and as_uint8 and tile_latents is None:
            return self._host_decode_wire_chunked(staged, as_numpy)

        # Stage 2: per image, block on idx, latent rANS (host), enqueue the
        # generator; downloads of earlier reconstructions overlap later
        # images' host work.
        pending = []
        for out, mu, idx in staged:
            idx_np = _to_nchw(idx).astype(np.int32)
            y_sym_np = self.conditional.decompress_symbols(
                out.latents_encoded, idx_np, vectorize=self.vectorize,
                sharded=out.sharded)
            y_nhwc = _to_nhwc_int(y_sym_np)
            h, w = out.spatial_shape
            if tile_latents is not None:
                from hific_tpu.tiling import tiled_upsample_apply

                y_hat = jnp.asarray(y_nhwc, jnp.float32) + mu
                ext = tile_latents + 2 * halo_latents
                if as_uint8:
                    gen = lambda lat: self._generate_u8_p(  # noqa: E731
                        self.params, lat, (ext * 16, ext * 16))
                    recon = tiled_upsample_apply(
                        gen, y_hat, scale=16, tile=tile_latents,
                        halo=halo_latents)[:, :h, :w, :]
                else:
                    gen = lambda lat: self._generate(  # noqa: E731
                        lat, (ext * 16, ext * 16))
                    recon = np.clip(tiled_upsample_apply(
                        gen, y_hat, scale=16, tile=tile_latents,
                        halo=halo_latents)[:, :h, :w, :], 0.0, 1.0)
                pending.append(recon)
                continue
            if as_uint8:
                y_flat = y_nhwc.reshape(-1)
                y8 = np.clip(y_flat, -128, 127).astype(np.int8)
                esc = np.nonzero(y_flat != y8.astype(np.int64))[0]
                if len(esc) <= K:
                    pos = np.full(K, -1, np.int32)
                    val = np.zeros(K, np.int16)
                    pos[: len(esc)] = esc
                    val[: len(esc)] = y_flat[esc]
                    recon = self._gen_packed_u8_p(
                        self.params, jnp.asarray(y8.reshape(y_nhwc.shape)),
                        jnp.asarray(pos), jnp.asarray(val), mu, (h, w))
                else:
                    recon = self._gen_syms_u8_p(
                        self.params, jnp.asarray(y_nhwc, jnp.int16), mu,
                        (h, w))
            else:
                recon = self._gen_syms_p(
                    self.params, jnp.asarray(y_nhwc, jnp.int16), mu, (h, w))
            pending.append(recon)
        if not as_numpy:
            return pending
        return [np.asarray(r) for r in pending]

    def _host_decode_wire_chunked(self, staged, as_numpy):
        """Host-rANS decode leg with chunk-batched wire legs: per
        `wire_chunk` same-shape images, ONE stacked coding-index fetch
        (uint8) and ONE stacked int8 symbol upload, with the per-image
        C++ rANS decodes fanned across a thread pool. Device programs
        stay per-image (synth_stats is the shared determinism-critical
        executable; generators enqueue as their symbols arrive), so
        earlier images' generator time hides later images' host work.

        Rationale (PERF.md round 5): each host sync on this transport
        costs ~28 ms flat + ~21 ms/MB; the per-image host path pays two
        of them per image (idx fetch, symbol upload) serially. Batching
        only the WIRE — not the compute, which measured slower chunked —
        amortizes the flat cost wire_chunk-fold.

        staged: [(CompressionOutput, mu_device, idx_device), ...] from
        stage 1 (all synth_stats already enqueued).
        """
        from concurrent.futures import ThreadPoolExecutor

        from hific_tpu.models.hific import N_LATENT_ESCAPES as K

        wire = self.wire_chunk
        groups, i, n = [], 0, len(staged)
        while i < n:
            j = i + 1
            key = tuple(staged[i][2].shape)
            while (j < n and j - i < wire
                   and tuple(staged[j][2].shape) == key):
                j += 1
            grp = staged[i:j]
            stack = (self._stack_p(*[g[2] for g in grp])
                     if j - i > 1 else None)
            groups.append((grp, stack))
            i = j

        pending = []
        with ThreadPoolExecutor(max_workers=wire) as pool:
            for grp, stack in groups:
                idxs = (np.asarray(stack) if stack is not None
                        else np.asarray(grp[0][2])[None])   # ONE fetch

                def dec(k, _grp=grp, _idxs=idxs):
                    out = _grp[k][0]
                    idx_np = _to_nchw(_idxs[k]).astype(np.int32)
                    y = self.conditional.decompress_symbols(
                        out.latents_encoded, idx_np,
                        vectorize=self.vectorize, sharded=out.sharded)
                    return _to_nhwc_int(y)

                ys = list(pool.map(dec, range(len(grp))))
                packed = []
                for (out, mu, _), y_nhwc in zip(grp, ys):
                    y_flat = y_nhwc.reshape(-1)
                    y8 = np.clip(y_flat, -128, 127).astype(np.int8)
                    esc = np.nonzero(y_flat != y8.astype(np.int64))[0]
                    packed.append((out, mu, y_nhwc, y8, esc))
                ok = [p for p in packed if len(p[4]) <= K]
                if ok:
                    # ONE stacked symbol upload for the whole chunk; the
                    # per-image generator input is a lazy device slice.
                    y8s = jax.device_put(
                        np.stack([p[3].reshape(p[2].shape) for p in ok]))
                    pos = np.full((len(ok), K), -1, np.int32)
                    val = np.zeros((len(ok), K), np.int16)
                    for r, p in enumerate(ok):
                        esc = p[4]
                        pos[r, :len(esc)] = esc
                        val[r, :len(esc)] = p[2].reshape(-1)[esc]
                    pos_d, val_d = jnp.asarray(pos), jnp.asarray(val)
                kk = 0
                for out, mu, y_nhwc, y8, esc in packed:
                    h, w = out.spatial_shape
                    if len(esc) <= K:
                        recon = self._gen_packed_u8_p(
                            self.params, y8s[kk], pos_d[kk], val_d[kk],
                            mu, (h, w))
                        kk += 1
                    else:   # escape overflow: full int16 symbols (rare)
                        recon = self._gen_syms_u8_p(
                            self.params, jnp.asarray(y_nhwc, jnp.int16),
                            mu, (h, w))
                    pending.append(recon)
        if not as_numpy:
            return pending
        return [np.asarray(r) for r in pending]

    # ------------------------------------------------------------------ #
    # Spatially-partitioned (multi-chip) codec: ONE huge image across the
    # mesh's data axis (parallel/spatial.py row bands + ppermute halos),
    # composed with the standard hyper/symbol/entropy stages.

    def _sp_params(self, mesh):
        """Params replicated over `mesh` for the shard_mapped SP programs.
        Restored checkpoints are committed to the default device; shard_map
        rejects single-device-committed inputs, so replicate once per mesh
        (a no-op broadcast for uncommitted params)."""
        if not hasattr(self, "_sp_params_cache"):
            self._sp_params_cache = {}
        key = id(mesh)
        if key not in self._sp_params_cache:
            from hific_tpu.parallel.mesh import replicate

            self._sp_params_cache[key] = replicate(self.params, mesh)
        return self._sp_params_cache[key]

    def compress_spatial(self, x, mesh, halo_image: int = 64
                         ) -> CompressionOutput:
        """Compress ONE image with the encoder sharded over `mesh`'s data
        axis. Streams are byte-identical to `compress(x)` whenever the
        padded height is unchanged by the extra mesh constraint, i.e.
        H % (n_devices * 16) == 0 (tested); otherwise extra bottom rows
        are reflect-padded in (more latent rows than the single-device
        file — decodes fine, not byte-comparable).

        The reference OOMs beyond ~4000x4000 on one device
        (src/README.md:113-114); this bounds per-chip HBM by the band
        size, scaling max resolution linearly in chips.
        """
        from hific_tpu.ops.padding import pad_factor
        from hific_tpu.parallel.mesh import DATA_AXIS
        from hific_tpu.parallel.spatial import spatial_encode_fn

        if not self._tables_built:
            self.build_tables()
        x = jnp.asarray(x)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
            if self.config.normalize_input_image:
                x = x * 2.0 - 1.0
        else:
            x = x.astype(jnp.float32)
        spatial_shape = tuple(int(s) for s in x.shape[1:3])
        n = mesh.shape[DATA_AXIS]
        x = pad_factor(x, (n * ENC_SCALE, ENC_SCALE))

        if not hasattr(self, "_sp_encode_cache"):
            self._sp_encode_cache = {}
        key = (id(mesh), halo_image)
        if key not in self._sp_encode_cache:
            enc = lambda p, t: self._model.apply(
                {"params": p}, t, method=HiFiC.encoder_forward)
            self._sp_encode_cache[key] = spatial_encode_fn(
                enc, mesh, halo=halo_image)
        y = self._sp_encode_cache[key](self._sp_params(mesh), x)
        # Reshard the assembled latents onto the default device for the
        # hyper/symbol stages (image-resolution/256 work): device_put keeps
        # the gather inside the runtime (ICI on a real mesh) instead of a
        # blocking host round trip, and dispatch stays async. The symbol
        # stages route through the SAME per-image synth_stats executable as
        # every other encode/decode path (idx bit-identity requirement) —
        # its latent-resolution work is small next to the sharded encoder.
        y_raw = jax.device_put(y, jax.devices()[0])
        y, z_sym_d, hb = self._front_lat_p(self.params, y_raw)
        mu, sigma, idx_d = self._synth_stats_p(self.params, z_sym_d,
                                               self._scale_table_dev)
        buf = np.asarray(self._pack_p(self.params, y, mu, sigma, idx_d,
                                      z_sym_d, hb))
        z_shape, y_shape = self._symbol_shapes(y_raw.shape,
                                               from_latents=True)
        z_sym, y_sym, idx, hb, lb = self._unpack_compressed(
            buf, z_shape, y_shape)
        if y_sym is None:  # escape overflow: unpacked int16 path
            y16, _ = self._latent_syms_p(self.params, y, mu, sigma, None)
            y_sym = np.asarray(y16)
        return self._finish_compress(z_sym, y_sym, idx, hb, lb,
                                     spatial_shape)

    def decompress_spatial(self, out: CompressionOutput, mesh,
                           halo_latents: int = 16,
                           as_uint8: bool = False) -> np.ndarray:
        """Decompress with the generator sharded over `mesh`'s data axis.
        Same symbols as `decompress(out)` by construction and SP windows
        are exact; pixels agree to float noise (<=1 u8 step) because the
        d2s packed tail's conv summation order is slab-shape-dependent
        (tests/test_spatial.py). Files whose latent rows don't divide the
        mesh's data axis (not written by compress_spatial) decode through
        the single-device generator instead — identical to
        decompress(out)."""
        from hific_tpu.parallel.mesh import DATA_AXIS
        from hific_tpu.parallel.spatial import spatial_generate_fn

        if not self._tables_built:
            self.build_tables()
        z_sym_np = self.factorized.decompress_symbols(
            out.hyperlatents_encoded, out.batch_shape,
            out.hyperlatent_spatial_shape, vectorize=self.vectorize,
            sharded=out.sharded)
        z_sym = jnp.asarray(_to_nhwc_int(z_sym_np), jnp.int16)
        mu, sigma, idx = self._synth_stats_p(self.params, z_sym,
                                             self._scale_table_dev)
        idx_np = _to_nchw(idx).astype(np.int32)
        y_sym_np = self.conditional.decompress_symbols(
            out.latents_encoded, idx_np, vectorize=self.vectorize,
            sharded=out.sharded)
        y_nhwc = _to_nhwc_int(y_sym_np)
        y_hat = jnp.asarray(y_nhwc, jnp.float32) + mu

        n = mesh.shape[DATA_AXIS]
        h, w = out.spatial_shape
        rows = int(y_hat.shape[1])
        if rows % n != 0 or (n > 1 and
                             (rows // n) * (n - 1) < 2 * halo_latents):
            # Latent rows don't band evenly over the mesh, or the image is
            # too small for the halo'd windows (file wasn't written by
            # compress_spatial, which pads rows for the mesh): fall back to
            # the single-device generator — the same program decompress()
            # runs, so the result is identical to decompress(out). Padding
            # rows here instead would perturb bottom-edge pixels through
            # the generator's receptive field.
            if as_uint8:
                return np.asarray(self._gen_syms_u8_p(
                    self.params, jnp.asarray(y_nhwc, jnp.int16), mu, (h, w)))
            return np.asarray(self._gen_syms_p(
                self.params, jnp.asarray(y_nhwc, jnp.int16), mu, (h, w)))
        if not hasattr(self, "_sp_generate_cache"):
            self._sp_generate_cache = {}
        key = (id(mesh), halo_latents)
        if key not in self._sp_generate_cache:
            def gen(p, lat):
                shape = (lat.shape[1] * ENC_SCALE, lat.shape[2] * ENC_SCALE)
                return self._model.apply({"params": p}, lat, shape,
                                         method=HiFiC.generate)
            self._sp_generate_cache[key] = spatial_generate_fn(
                gen, mesh, halo_latents=halo_latents)
        from hific_tpu.parallel.mesh import replicate

        img = np.asarray(self._sp_generate_cache[key](self._sp_params(mesh),
                                                      replicate(y_hat, mesh)))
        img = img[:, :h, :w]
        if as_uint8:
            img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
        return img

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

    def decompress_file(self, path: str, **kw) -> np.ndarray:
        return self.decompress(load_compressed(path), **kw)

    # ------------------------------------------------------------------ #

    def compress_many(self, images,
                      shape_bucket: Optional[int] = None) -> list:
        """Pipelined batch compression: the TPU runs image i+1's transforms
        while the host rANS-codes image i (the reference serializes these —
        its coder is the acknowledged bottleneck, src/README.md:89).

        JAX's async dispatch does the overlap: stage-1 device work for the
        next image is enqueued before the host blocks on the previous
        image's arrays.

        shape_bucket: same padding as `compress` — essential here on
        mixed-resolution datasets, since every distinct shape otherwise
        pays a fresh XLA compile inside the pipeline.
        """
        if not self._tables_built:
            self.build_tables()

        chunking = self.pipeline_chunk > 1
        prepped = []
        for x in images:
            # With chunking, host arrays stay on host here so a whole
            # chunk uploads as ONE stacked transfer; without it, images
            # upload via asarray right away (the per-image async pipeline —
            # the fastest measured configuration on this transport).
            if not (chunking and isinstance(x, np.ndarray)):
                x = jnp.asarray(x)
            if x.dtype != np.uint8:
                x = x.astype(np.float32) if isinstance(x, np.ndarray) \
                    else x.astype(jnp.float32)
            spatial_shape = tuple(int(s) for s in x.shape[1:3])
            if shape_bucket:
                if isinstance(x, np.ndarray):
                    # Host-side pad keeps the image host-resident (and so
                    # chunk-batchable); same even-reflect semantics as
                    # pad_factor.
                    h, w = x.shape[1], x.shape[2]
                    ph = (shape_bucket - h % shape_bucket) % shape_bucket
                    pw = (shape_bucket - w % shape_bucket) % shape_bucket
                    if ph or pw:
                        x = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                   mode="reflect")
                else:
                    from hific_tpu.ops.padding import pad_factor

                    x = pad_factor(x, shape_bucket)
            prepped.append((spatial_shape, x))

        if all(self._device_encode_eligible(x, None) for _, x in prepped):
            # Device entropy encode: per image, three chained async
            # dispatches (front -> shared synth_stats -> coding scan; the
            # middle one is the determinism-critical shared executable —
            # see HiFiC.synth_stats). Consecutive same-shape images batch
            # pipeline_chunk at a time: front and scan stages ride ONE
            # unrolled-stack program each (one upload, one dispatch, one
            # fetch per chunk; vmap would select-ify the escape lax.conds
            # for ~2x compute — PERF.md), while synth_stats stays PER-IMAGE
            # by requirement. All chunks are enqueued before blocking on
            # any fetch.
            chunk = self.pipeline_chunk
            staged_dev = []
            i, n = 0, len(prepped)
            while i < n:
                ss, x = prepped[i]
                j = i + 1
                if chunk > 1:
                    # Host images chunk into ONE stacked upload; device-
                    # resident images chunk too (jnp.stack is device-side)
                    # — the win there is one dispatch + one result fetch
                    # per chunk instead of per image.
                    is_np = isinstance(x, np.ndarray)
                    key = (is_np, tuple(x.shape), x.dtype)
                    while (j < n and j - i < chunk
                           and (isinstance(prepped[j][1], np.ndarray),
                                tuple(prepped[j][1].shape),
                                prepped[j][1].dtype) == key):
                        j += 1
                group = prepped[i:j]
                if len(group) == 1:
                    # Upload via an explicit asarray BEFORE the dispatch:
                    # passing host numpy straight into the jit call makes
                    # the arg transfer part of the (blocking) call and
                    # collapses the pipeline's overlap (measured: 276 vs
                    # ~190 ms/image).
                    staged_dev.append(
                        ("one", group,
                         self._enqueue_device_compress(jnp.asarray(x))))
                else:
                    xs = (jnp.asarray(np.stack([g[1] for g in group]))
                          if isinstance(group[0][1], np.ndarray)
                          else jnp.stack([g[1] for g in group]))
                    shapes = self._symbol_shapes(group[0][1].shape)
                    fronts = self._front_batch_p(self.params, xs)
                    stats = [self._synth_stats_p(self.params, zs,
                                                 self._scale_table_dev)
                             for _, zs, _ in fronts]
                    bufs = self._dev_scan_pack_batch_p(
                        self.params,
                        tuple(f[0] for f in fronts),         # ys
                        tuple(s[0] for s in stats),          # mus
                        tuple(s[1] for s in stats),          # sigmas
                        tuple(s[2] for s in stats),          # idxs
                        tuple(f[1] for f in fronts),         # z_syms
                        tuple(f[2] for f in fronts),         # hbs
                        *self._enc_tables())
                    staged_dev.append(("batch", group, (bufs,) + shapes))
                i = j

            # Wire-chunked fetch: consecutive per-image ("one") entries
            # with identical buffer shapes stack device-side so their
            # result fetches collapse into ONE sync RPC per wire_chunk
            # (stacks are enqueued for ALL groups before any fetch
            # blocks). "batch" entries already fetch once per chunk.
            fetch_stacks = {}
            if self.wire_chunk > 1:
                k, m = 0, len(staged_dev)
                while k < m:
                    if staged_dev[k][0] != "one":
                        k += 1
                        continue
                    l = k + 1
                    key = tuple(staged_dev[k][2][0].shape)
                    while (l < m and l - k < self.wire_chunk
                           and staged_dev[l][0] == "one"
                           and tuple(staged_dev[l][2][0].shape) == key):
                        l += 1
                    if l - k > 1:
                        fetch_stacks[k] = self._stack_p(
                            *[staged_dev[t][2][0] for t in range(k, l)])
                    k = l

            outputs = []
            fetched_rows, fetched_at = None, 0
            for pos, (kind, group, (buf, z_shape, y_shape)) \
                    in enumerate(staged_dev):
                if pos in fetch_stacks:
                    fetched_rows = np.asarray(fetch_stacks[pos])  # ONE RPC
                    fetched_at = pos
                if (fetched_rows is not None
                        and pos - fetched_at < len(fetched_rows)
                        and kind == "one"):
                    rows = fetched_rows[pos - fetched_at][None]
                else:
                    fetched_rows = None
                    rows = np.asarray(buf)       # ONE fetch per chunk
                    if kind == "one":
                        rows = rows[None]
                for row, (ss, x) in zip(rows, group):
                    out = self._unpack_device_compress(
                        row, z_shape, y_shape, ss)
                    if out is None:        # capacity fallback, host coder
                        out = self.compress(x, device_encode=False)
                        n_px = float(np.prod(ss))
                        out = out._replace(
                            spatial_shape=ss,
                            hyperlatent_bpp=out.hyperlatent_bits / n_px,
                            latent_bpp=out.latent_bits / n_px,
                            total_bpp=out.total_bits / n_px)
                    outputs.append(out)
            return outputs

        # Stage 1 (device, async): the full device side of every image is
        # enqueued before the host blocks on any symbols.
        staged = []
        for spatial_shape, x in prepped:
            buf, z_shape, y_shape, stats = self._enqueue_host_compress(
                jnp.asarray(x))
            staged.append((spatial_shape, buf, z_shape, y_shape, stats))

        if self.wire_chunk > 1:
            # Wire-chunked host coding: ONE stacked packed-buffer fetch per
            # chunk of same-shape images (all stacks enqueued before any
            # fetch blocks), then the per-image unpack + C++ rANS encodes
            # fan across a thread pool — the chip runs later images' front/
            # synth stages while the host codes earlier ones.
            from concurrent.futures import ThreadPoolExecutor

            groups, i, n = [], 0, len(staged)
            while i < n:
                j = i + 1
                key = tuple(staged[i][1].shape)
                while (j < n and j - i < self.wire_chunk
                       and tuple(staged[j][1].shape) == key):
                    j += 1
                grp = staged[i:j]
                stack = (self._stack_p(*[g[1] for g in grp])
                         if j - i > 1 else None)
                groups.append((grp, stack))
                i = j
            outputs = []
            with ThreadPoolExecutor(max_workers=self.wire_chunk) as pool:
                for grp, stack in groups:
                    rows = (np.asarray(stack) if stack is not None
                            else np.asarray(grp[0][1])[None])  # ONE fetch
                    outputs.extend(pool.map(
                        lambda t: self._host_encode_row(
                            t[0][0], t[1], t[0][2], t[0][3], t[0][4]),
                        zip(grp, rows)))
            return outputs

        return [self._host_encode_row(ss, np.asarray(buf), z_shape, y_shape,
                                      stats)
                for ss, buf, z_shape, y_shape, stats in staged]

    def _host_encode_row(self, spatial_shape, buf_np, z_shape, y_shape,
                         stats):
        """Unpack one fetched encode buffer and host-rANS it into a
        CompressionOutput (the per-image tail of compress_many's host
        path; thread-safe — the C++ coder is stateless on caller
        buffers)."""
        z_sym, y_sym, idx, hyper_bits, latent_bits = (
            self._unpack_compressed(buf_np, z_shape, y_shape))
        if y_sym is None:  # escape overflow: unpacked int16 path
            y_res, mu, sigma = stats
            y16, _ = self._latent_syms_p(self.params, y_res, mu, sigma,
                                         None)
            y_sym = np.asarray(y16)
        z_sym_np = _to_nchw(z_sym).astype(np.int32)
        y_sym_np = _to_nchw(y_sym).astype(np.int32)
        idx_np = _to_nchw(idx).astype(np.int32)
        batch, hyper_spatial = z_sym_np.shape[0], z_sym_np.shape[2:]
        n_pixels = float(np.prod(spatial_shape))
        hyper_bpp, latent_bpp = (hyper_bits / n_pixels,
                                 latent_bits / n_pixels)

        z_encoded, hyper_coding_shape = self.factorized.compress_symbols(
            z_sym_np, vectorize=self.vectorize, shards=self.coder_threads)
        y_encoded, latent_coding_shape = self.conditional.compress_symbols(
            y_sym_np, idx_np, vectorize=self.vectorize,
            shards=self.coder_threads)
        return CompressionOutput(
            hyperlatents_encoded=z_encoded,
            latents_encoded=y_encoded,
            sharded=self.coder_threads > 1,
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
