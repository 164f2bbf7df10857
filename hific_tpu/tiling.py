"""Padded tiling with halo overlap: megapixel+ images in bounded HBM.

The reference runs fully-convolutional inference on the whole image and
OOMs beyond ~4000x4000 (reference src/README.md:113-114, splitting into
crops is its acknowledged TODO). Here arbitrary resolution is handled by
sweeping fixed-shape tiles with a halo: each tile is processed with `halo`
pixels of real context on every side and only the tile's core is kept, so
boundary effects are pushed `halo` pixels away from every seam. Fixed tile
shapes mean ONE compiled executable regardless of image size.

Exactness: a reconstruction pixel matches the whole-image result when its
total receptive field fits inside tile+halo. HiFiC's generator has a large
RF (~340 px at 9 residual blocks), so halos of 128-256 px make seams
visually nonexistent while bounding memory at tile+2*halo squared.
"""

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def tiled_apply(fn: Callable, x, tile: int = 768, halo: int = 128):
    """Apply `fn` ((1,h,w,3) -> (1,h,w,3), same spatial size) tile-wise.

    x: (1,H,W,3). Returns (1,H,W,3). All tiles have shape
    (tile + 2*halo) x (tile + 2*halo); edge context is reflect-padded, so a
    single-tile image reproduces `fn(x)` exactly.
    """
    assert x.shape[0] == 1, "tiled_apply is per-image"
    _, h, w, c = x.shape
    if h <= tile and w <= tile:
        return fn(x)

    n_th = math.ceil(h / tile)
    n_tw = math.ceil(w / tile)
    pad_h = n_th * tile - h
    pad_w = n_tw * tile - w
    # halo context + square-out padding, reflected. Reflect padding is only
    # defined for pad < dim, so apply it in chunks when the halo exceeds the
    # image size.
    xp = x
    pads = [halo, halo + pad_h, halo, halo + pad_w]  # top, bottom, left, right
    while any(p > 0 for p in pads):
        cur_h, cur_w = xp.shape[1], xp.shape[2]
        step = [min(pads[0], cur_h - 1), min(pads[1], cur_h - 1),
                min(pads[2], cur_w - 1), min(pads[3], cur_w - 1)]
        xp = jnp.pad(xp, ((0, 0), (step[0], step[1]), (step[2], step[3]),
                          (0, 0)), mode="reflect")
        pads = [p - s for p, s in zip(pads, step)]

    out = np.zeros((1, h, w, c), np.float32)
    ext = tile + 2 * halo
    for ti in range(n_th):
        for tj in range(n_tw):
            y0, x0 = ti * tile, tj * tile
            tile_in = jax.lax.dynamic_slice(
                xp, (0, y0, x0, 0), (1, ext, ext, c))
            tile_out = fn(tile_in)
            core = np.asarray(tile_out[:, halo : halo + tile,
                                       halo : halo + tile, :])
            ch = min(tile, h - y0)
            cw = min(tile, w - x0)
            out[:, y0 : y0 + ch, x0 : x0 + cw, :] = core[:, :ch, :cw, :]
    return out


def reconstruct_tiled(model_apply_fn, x, tile: int = 768, halo: int = 128):
    """Evaluation-mode reconstruction of an arbitrary-resolution image with
    bounded memory. model_apply_fn: jitted (1,h,w,3)->(1,h,w,3) eval forward
    (pad -> encode -> quantize -> generate -> unpad)."""
    return tiled_apply(model_apply_fn, x, tile=tile, halo=halo)


def tiled_downsample_apply(fn: Callable, x, scale: int, tile: int = 1024,
                           halo: int = 64):
    """Tile-wise application of a downsampling map (e.g. the HiFiC encoder:
    image (1,h,w,3) -> latents (1, h/scale, w/scale, C)) with bounded
    memory. Returns a DEVICE array of shape (1, ceil(h/scale),
    ceil(w/scale), C) — callers feed it straight into the (small) hyper /
    symbol programs without a host round trip.

    Used by the codec to COMPRESS megapixel+ images in bounded HBM: the
    encoder's image-resolution activations dominate memory (the reference
    needs ~8 GB and OOMs beyond ~4000x4000, src/README.md:113-114). With
    `halo` >= the encoder's receptive-field radius (18 px for the HiFiC
    stack) tile cores are EXACT, and the bottom/right reflect padding
    matches pad_factor's, so the assembled latents equal the whole-image
    encode bit-for-bit.

    Tile windows are CLAMPED inside the image (never padded with synthetic
    context): near an image border the window slides inward so its edge
    coincides with the true image edge, and the conv stack's own boundary
    padding fires exactly as it would whole-image. Interior tiles keep the
    core >= halo away from every window edge. Both together make the
    assembly exact EVERYWHERE, not just in the interior.

    tile and halo must be multiples of `scale` (core cropping happens in
    latent units).
    """
    from hific_tpu.ops.padding import pad_factor

    assert x.shape[0] == 1
    assert tile % scale == 0 and halo % scale == 0
    # Same bottom/right reflect padding as the whole-image encode path.
    x = pad_factor(jnp.asarray(x), scale)
    _, h, w, c = x.shape

    ext = tile + 2 * halo
    ext_h, ext_w = min(ext, h), min(ext, w)
    n_th = math.ceil(h / tile) if h > ext_h else 1
    n_tw = math.ceil(w / tile) if w > ext_w else 1
    if n_th == 1 and n_tw == 1:
        return fn(x)

    sl = scale
    rows = []
    for ti in range(n_th):
        c_h0 = ti * tile
        c_h1 = min(c_h0 + tile, h)
        s_h = min(max(c_h0 - halo, 0), h - ext_h)
        row = []
        for tj in range(n_tw):
            c_w0 = tj * tile
            c_w1 = min(c_w0 + tile, w)
            s_w = min(max(c_w0 - halo, 0), w - ext_w)
            tile_out = fn(jax.lax.dynamic_slice(
                x, (0, s_h, s_w, 0), (1, ext_h, ext_w, c)))
            row.append(tile_out[:, (c_h0 - s_h) // sl : (c_h1 - s_h) // sl,
                                (c_w0 - s_w) // sl : (c_w1 - s_w) // sl, :])
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


def tiled_upsample_apply(fn: Callable, x, scale: int, out_channels: int = 3,
                         tile: int = 48, halo: int = 16, inflight: int = 4):
    """Tile-wise application of an upsampling map (e.g. the HiFiC generator:
    latents (1,hl,wl,C) -> image (1, hl*scale, wl*scale, out_channels)).

    Used by the codec to decode megapixel+ images with bounded HBM: the
    generator's activations at full resolution dominate memory, so it runs
    on latent tiles with `halo` latent pixels of real context (halo*scale
    image pixels) and only tile cores are stitched.

    inflight: tiles ride JAX async dispatch in a bounded window — up to
    this many tile programs are enqueued before the host blocks on the
    oldest tile's download, so the device computes tile i+1..i+k while the
    host drains tile i's pixels over the wire. HBM for finished-but-
    undownloaded cores is bounded at inflight * (tile*scale)^2 * 3 bytes
    (a few MB at the defaults); 1 restores strictly serial behavior.
    """
    assert x.shape[0] == 1
    _, h, w, c = x.shape
    if h <= tile and w <= tile:
        return fn(x)

    n_th = math.ceil(h / tile)
    n_tw = math.ceil(w / tile)
    pad_h = n_th * tile - h
    pad_w = n_tw * tile - w
    xp = x
    pads = [halo, halo + pad_h, halo, halo + pad_w]
    while any(p > 0 for p in pads):
        cur_h, cur_w = xp.shape[1], xp.shape[2]
        step = [min(pads[0], cur_h - 1), min(pads[1], cur_h - 1),
                min(pads[2], cur_w - 1), min(pads[3], cur_w - 1)]
        xp = jnp.pad(xp, ((0, 0), (step[0], step[1]), (step[2], step[3]),
                          (0, 0)), mode="reflect")
        pads = [p - s for p, s in zip(pads, step)]

    out = None  # dtype follows fn's output (float32 or uint8 wire format)
    ext = tile + 2 * halo
    inflight = max(1, int(inflight))
    pending = []  # (y0, x0, device core) awaiting download

    def _drain(entry):
        nonlocal out
        y0, x0, core_dev = entry
        core = np.asarray(core_dev)  # the only blocking download
        if out is None:
            out = np.zeros((1, h * scale, w * scale, out_channels),
                           core.dtype)
        ch = min(tile, h - y0) * scale
        cw = min(tile, w - x0) * scale
        out[:, y0 * scale : y0 * scale + ch,
            x0 * scale : x0 * scale + cw, :] = core[:, :ch, :cw, :]

    for ti in range(n_th):
        for tj in range(n_tw):
            y0, x0 = ti * tile, tj * tile
            tile_in = jax.lax.dynamic_slice(xp, (0, y0, x0, 0),
                                            (1, ext, ext, c))
            tile_out = fn(tile_in)
            # Core sliced ON DEVICE so only core bytes cross the wire.
            core_dev = tile_out[:, halo * scale : (halo + tile) * scale,
                                halo * scale : (halo + tile) * scale, :]
            pending.append((y0, x0, core_dev))
            if len(pending) >= inflight:
                _drain(pending.pop(0))
    for entry in pending:
        _drain(entry)
    return out
