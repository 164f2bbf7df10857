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


def tiled_upsample_apply(fn: Callable, x, scale: int, out_channels: int = 3,
                         tile: int = 48, halo: int = 16):
    """Tile-wise application of an upsampling map (e.g. the HiFiC generator:
    latents (1,hl,wl,C) -> image (1, hl*scale, wl*scale, out_channels)).

    Used by the codec to decode megapixel+ images with bounded HBM: the
    generator's activations at full resolution dominate memory, so it runs
    on latent tiles with `halo` latent pixels of real context (halo*scale
    image pixels) and only tile cores are stitched.
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

    out = np.zeros((1, h * scale, w * scale, out_channels), np.float32)
    ext = tile + 2 * halo
    for ti in range(n_th):
        for tj in range(n_tw):
            y0, x0 = ti * tile, tj * tile
            tile_in = jax.lax.dynamic_slice(xp, (0, y0, x0, 0),
                                            (1, ext, ext, c))
            tile_out = fn(tile_in)
            core = np.asarray(
                tile_out[:, halo * scale : (halo + tile) * scale,
                         halo * scale : (halo + tile) * scale, :])
            ch = min(tile, h - y0) * scale
            cw = min(tile, w - x0) * scale
            out[:, y0 * scale : y0 * scale + ch,
                x0 * scale : x0 * scale + cw, :] = core[:, :ch, :cw, :]
    return out
