"""Overlap-tiled large-frame inference (the 1080p+ VMEM strategy,
SURVEY.md §5.7).

A full 1080p frame through the decoder keeps a (1, 540, 960, 384) f32
middle activation alive — too large to tile comfortably through VMEM and a
fresh XLA compile per frame size. Instead the frame is cut into fixed-size
LR tiles with a halo of `halo` pixels of *real neighbor context* on every
interior side; each tile runs through the (jitted once) materialized subnet,
and the output centers are stitched.

Exactness: an output pixel depends on inputs within the network's receptive
field (radius ~3 per 7x7 depthwise block + 2 per 5x5 conv — ~60 LR px for
the max-depth subnet). With halo >= that radius the interior of every tile
is window-exact vs the full-frame execution (same dot products over the
same operand windows; bitwise on matched XLA reduction schedules, within
summation-order ULPs otherwise); at the true frame border
the tile sees the same zero padding (SAME convs) the full frame would.
`receptive_field_radius` computes the exact bound per subnet so callers can
pick a sufficient halo (validated in tests/test_tiled_infer.py).
"""

from __future__ import annotations

import numpy as np


def receptive_field_radius(cfg, space, conv_ks: int = 5) -> int:
    """RF radius (in LR pixels before the shuffle head) of a decoder subnet:
    first conv + per-block depthwise + two final convs, plus the shuffle
    head's convs mapped back to LR resolution."""
    r = conv_ks // 2                      # dec_first_conv
    n_stages = space.n_stages
    d = cfg.d[-n_stages:] if len(cfg.d) > n_stages else cfg.d
    ks = cfg.ks[-space.blocks_per_trunk:] if len(cfg.ks) > space.blocks_per_trunk else cfg.ks
    bi = 0
    for stage in range(n_stages):
        for i in range(space.max_depth):
            if i < min(d[stage], space.max_depth):
                r += ks[bi] // 2          # depthwise
            bi += 1
    r += 2 * (conv_ks // 2)               # two dec_final convs
    # shuffle head: conv at LR, then conv at 2x (halves back to LR), ...
    scale = 1
    for _ in range(cfg.pixel_d):
        r += (conv_ks // 2 + scale - 1) // scale
        scale *= 2
    r += (conv_ks // 2 + scale - 1) // scale  # output conv at HR
    return r


def receptive_field_radius_autoencoder(cfg, space, conv_ks: int = 5) -> int:
    """RF radius in *HR-input* pixels of an X4 autoencoder subnet
    (encoder unshuffle chain + encoder trunk + decoder), aligned up to a
    multiple of 2**pixel_d so halos preserve the pixel-unshuffle grid.

    Conservative: every encoder conv is counted at full k//2 LR pixels even
    when it runs above LR resolution (where its LR-unit radius is smaller).
    """
    sc = 2 ** cfg.pixel_d
    r = cfg.pixel_d * (conv_ks // 2)          # enc_unshuffle convs
    d = cfg.d[:space.n_stages]
    ks = cfg.ks[:space.blocks_per_trunk]
    bi = 0
    for stage in range(space.n_stages):
        for i in range(space.max_depth):
            if i < min(d[stage], space.max_depth):
                r += ks[bi] // 2              # encoder depthwise
            bi += 1
    r += 3 * (conv_ks // 2)                   # enc_final convs
    r += receptive_field_radius(cfg, space, conv_ks)  # decoder side
    return r * sc  # LR-unit radius -> HR pixels (a multiple of sc by form)


def _positions(extent, t):
    """Output-tile start positions covering [0, extent): stride t, with the
    last tile flush against the end (overlap re-computes identical pixels)."""
    pos = list(range(0, max(extent - t, 0) + 1, t))
    if pos[-1] != extent - t:
        pos.append(extent - t)
    return pos


def _windows(x, tile, halo):
    """Collect the clamped overlap windows of an LR frame.

    Returns (windows [N, win, win, C], placements [(ti, tj, off_i, off_j)]).
    """
    _, h, w, _ = x.shape
    win = tile + 2 * halo
    wins, place = [], []
    for ti in _positions(h, tile):
        src_i = min(max(ti - halo, 0), h - win)
        for tj in _positions(w, tile):
            src_j = min(max(tj - halo, 0), w - win)
            wins.append(x[0, src_i:src_i + win, src_j:src_j + win])
            place.append((ti, tj, ti - src_i, tj - src_j))
    return np.stack(wins), place


def tiled_sr_infer_mesh(subnet_fn, x, *, tile: int, halo: int, scale: int,
                        mesh=None, windows_per_device: int = 1):
    """Mesh-parallel tiled inference: the frame's overlap windows are batched
    and the window batch is sharded over the mesh's devices, so one 1080p
    frame's tiles run on all chips of a slice concurrently (SURVEY.md §5.7's
    spatial-sharding strategy — tile-level sharding needs zero per-layer
    communication because each window already carries its receptive-field
    halo, unlike per-conv halo exchange which pays an ICI hop per layer).

    `subnet_fn` must accept a batched LR input (B, win, win, C). The window
    batch is padded up to a fixed (n_devices * windows_per_device) chunk so
    every dispatch reuses one compiled program. Per-window results are
    identical to `tiled_sr_infer` (same windows, batched execution).
    """
    import jax
    from ..parallel.mesh import batch_sharding, make_mesh

    x = np.asarray(x)
    b, h, w, c = x.shape
    assert b == 1, "frame-at-a-time inference (reference eval is bs=1)"
    win = tile + 2 * halo
    if h < win or w < win:
        return np.asarray(subnet_fn(x))

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    chunk = n_dev * windows_per_device
    sharding = batch_sharding(mesh)

    wins, place = _windows(x, tile, halo)
    n = wins.shape[0]
    out = np.zeros((1, h * scale, w * scale, c), x.dtype)
    for start in range(0, n, chunk):
        part = wins[start:start + chunk]
        if part.shape[0] < chunk:  # pad the tail chunk (one compile total)
            pad = np.repeat(part[-1:], chunk - part.shape[0], axis=0)
            part = np.concatenate([part, pad], axis=0)
        part = jax.device_put(part, sharding)
        res = np.asarray(subnet_fn(part))
        for k in range(min(chunk, n - start)):
            ti, tj, off_i, off_j = place[start + k]
            out[0, ti * scale:(ti + tile) * scale,
                tj * scale:(tj + tile) * scale] = res[
                k, off_i * scale:(off_i + tile) * scale,
                off_j * scale:(off_j + tile) * scale]
    return out


def tiled_sr_infer(subnet_fn, x, *, tile: int, halo: int, scale: int):
    """Run `subnet_fn` (LR (1,h,w,3) -> HR (1,h*scale,w*scale,3), jitted)
    over overlapping tiles of the LR frame `x` and stitch.

    Windows are *clamped inside the frame* (shifted, never zero-padded):
    every dispatched window has the identical (tile + 2*halo) shape — one
    compilation serves any frame size — and a window edge only ever
    coincides with the true frame edge, so the per-layer SAME zero-padding
    semantics match the full-frame execution exactly. With
    halo >= receptive_field_radius the stitched result is bit-identical to
    the full frame (up to conv tiling accumulation noise).
    """
    x = np.asarray(x)
    b, h, w, c = x.shape
    assert b == 1, "frame-at-a-time inference (reference eval is bs=1)"
    t = tile
    win = t + 2 * halo
    if h < win or w < win:
        return np.asarray(subnet_fn(x))  # frame smaller than a window

    out = np.zeros((1, h * scale, w * scale, c), x.dtype)
    for ti in _positions(h, t):
        src_i = min(max(ti - halo, 0), h - win)
        off_i = ti - src_i
        for tj in _positions(w, t):
            src_j = min(max(tj - halo, 0), w - win)
            off_j = tj - src_j
            tile_out = np.asarray(subnet_fn(
                x[:, src_i:src_i + win, src_j:src_j + win]))
            out[:, ti * scale:(ti + t) * scale,
                tj * scale:(tj + t) * scale] = tile_out[
                :, off_i * scale:(off_i + t) * scale,
                off_j * scale:(off_j + t) * scale]
    return out
