"""Spatial partitioning (SP): ONE image's conv stacks sharded over the
device mesh, with ppermute halo exchange over ICI.

Data parallelism scales batches; SP scales a SINGLE image: the image (or
latent map) is split into row bands across the mesh's data axis, each
device computes its band with `halo` rows of true neighbor context fetched
via `jax.lax.ppermute`, and only band cores are kept. This is the
multi-chip analog of hific_tpu.tiling (which sweeps tiles serially on one
chip): same clamped-window exactness argument, but the "tiles" run
simultaneously on n chips and the context moves over ICI instead of
through HBM re-reads.

Exactness: windows are CLAMPED to the (padded) image, so a window edge
coincides with a true image edge whenever it is within `halo` of one, and
the conv stack's own boundary padding fires exactly as it would on the
whole image; interior cores sit >= halo away from window edges. For the
HiFiC encoder use halo >= 64 (one-sided receptive extent 49 px); for the
generator halo is in latent rows (extent ~= 2 + n_residual_blocks latent
rows for the 16x synthesis stack; 16 is ample).

The reference has no multi-device story at all (its --multigpu raises
NotImplementedError, train.py:303-308, and it OOMs on large single images,
src/README.md:113-114).
"""

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from hific_tpu.parallel.mesh import DATA_AXIS


def _gather_neighborhood(xb, hops: int, axis_name: str, n: int):
    """Extend each device's band with the bands of its `hops` nearest
    neighbors on both sides, via chained ppermute over ICI. Devices past
    the array edge contribute zeros — never used, because window clamping
    keeps them outside every core's receptive field.

    Returns rows [start - hops*band, start + (1+hops)*band) per device."""
    up, down = xb, xb
    parts = [xb]
    for _ in range(hops):
        # after k applications, device i holds the band of device i-k / i+k
        up = jax.lax.ppermute(
            up, axis_name, [(j, j + 1) for j in range(n - 1)])
        down = jax.lax.ppermute(
            down, axis_name, [(j + 1, j) for j in range(n - 1)])
        parts = [up] + parts + [down]
    return jnp.concatenate(parts, axis=1)


def make_spatial_map(fn: Callable, mesh, scale: int, halo: int,
                     axis_name: str = DATA_AXIS, downsample: bool = True):
    """Wrap `fn(params, window) -> mapped window` (a pure conv stack that
    down- or up-samples H,W by `scale`) into a shard_map program that
    applies it to a FULL image/latent map sharded in row bands over
    `axis_name`.

    Requirements (asserted): H % (n * scale) == 0, halo % scale == 0
    (downsample), and H >= band + 2*halo (the clamped window must fit in
    the image). The neighbor exchange runs ceil(2*halo / band) hops.

    Returns sharded_fn(params, x_global) -> y_global (committed to the
    mesh, band-sharded on H).
    """
    n = mesh.shape[axis_name]
    h2 = 2 * halo

    def sharded(params, x):
        H = x.shape[1]
        assert H % n == 0, f"H={H} not divisible by {n} devices"
        band = H // n
        if downsample:
            assert band % scale == 0 and halo % scale == 0
        assert n == 1 or band * (n - 1) >= h2, (
            f"band {band} too small for halo {halo}: window does not fit "
            f"in the image (need H >= band + 2*halo)")

        if n == 1:
            return fn(params, x)

        hops = -(-h2 // band)

        def body(p, xb):
            i = jax.lax.axis_index(axis_name)
            ext = _gather_neighborhood(xb, hops, axis_name, n)
            start = i * band
            w = jnp.clip(start - halo, 0, H - band - h2)
            win = jax.lax.dynamic_slice_in_dim(
                ext, w - start + hops * band, band + h2, axis=1)
            y_win = fn(p, win)
            if downsample:
                core_off = (start - w) // scale
                return jax.lax.dynamic_slice_in_dim(
                    y_win, core_off, band // scale, axis=1)
            core_off = (start - w) * scale
            return jax.lax.dynamic_slice_in_dim(
                y_win, core_off, band * scale, axis=1)

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(None, axis_name)),
            out_specs=P(None, axis_name))(params, x)

    return sharded


def spatial_encode_fn(model_apply, mesh, halo: int = 64,
                      axis_name: str = DATA_AXIS):
    """SP wrapper for the bare HiFiC encoder (16x downsample).
    model_apply: (params, x) -> latents (e.g. Codec's encoder_forward)."""
    return make_spatial_map(model_apply, mesh, scale=16, halo=halo,
                            axis_name=axis_name, downsample=True)


def spatial_generate_fn(model_apply, mesh, halo_latents: int = 16,
                        axis_name: str = DATA_AXIS):
    """SP wrapper for the HiFiC generator (16x upsample). model_apply:
    (params, latents) -> image rows (no final crop inside)."""
    return make_spatial_map(model_apply, mesh, scale=16, halo=halo_latents,
                            axis_name=axis_name, downsample=False)


def pad_rows_for_mesh(x, mesh, factor: int, axis_name: str = DATA_AXIS):
    """Reflect-pad H (bottom) to a multiple of n_devices * factor; returns
    (padded, original_h). Mirrors ops.padding.pad_factor semantics so the
    first pad rows agree with the single-device path."""
    n = mesh.shape[axis_name]
    h = x.shape[1]
    target = math.ceil(h / (n * factor)) * (n * factor)
    pads = target - h
    while pads > 0:
        step = min(pads, x.shape[1] - 1)
        x = jnp.pad(x, ((0, 0), (0, step), (0, 0), (0, 0)), mode="reflect")
        pads -= step
    return x, h
