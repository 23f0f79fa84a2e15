"""Spatial sharding of full-frame SR inference over the device mesh with
ICI halo exchange (SURVEY.md §5.7's stretch strategy).

One large frame's rows are sharded over the mesh axis; each device holds an
H-slab. Inside one jitted shard_map program, every device exchanges its
receptive-field halo with its neighbors via `lax.ppermute` (two ICI hops,
once per frame — not per layer), runs the materialized subnet on
slab + halos, and keeps the center. The output stays device-sharded, so an
N-device slice processes one 1080p frame with N-way spatial parallelism and
~2*halo rows of communication per device (fetched in whole-slab hops).

Frame-edge and row-padding correctness: ppermute leaves non-receiving edge
devices with zero halos, and the frame's rows may be padded up to a multiple
of the mesh size; both are handled by the subnet's `row_valid` re-zeroing
(models/materialize.py) — rows outside the true frame are re-zeroed before
every spatial conv, which makes the valid region window-exact vs the
unpadded SAME-padded execution (the bucketed-eval equivalence; bitwise up
to XLA reduction scheduling, ULPs otherwise). Measured: with
fold_tail=False subnets slab-vs-full is exactly 0.0; with the fold_tail
default the folded convs' deep reductions get shape-dependent tiling, so
agreement is reassociation-bounded (~8e-7 relative; f64-verified exact
math — tests/test_autoencoder_infer.py).

Contrast with train/tiled_infer.tiled_sr_infer_mesh (tile-batch sharding,
zero communication, host-side stitching): halo exchange keeps the whole
frame on-device — the right shape when the frame pipeline (decode, metrics,
encode) also lives on the mesh.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map


def make_spatial_infer(subnet, mesh, *, halo: int, scale: int,
                       axis: str = "data", align: int = 1):
    """Build `infer(x, true_h) -> (1, Hpad*scale, W, C)` running `subnet`
    (a models.materialize.StaticSubnet) H-sharded over `mesh`.

    `halo` must be >= the subnet's receptive-field radius
    (train/tiled_infer.receptive_field_radius; the autoencoder variant for
    X4 deployment). x's row count must be a multiple of the mesh size (pad
    with `pad_rows`); `true_h` marks the real frame rows. Rows
    [0, true_h*scale) of the result are exact.

    `align`: slab/halo row alignment. For 'autoencoder' subnets pass
    2**pixel_d (and scale=1, halo in HR pixels from
    receptive_field_radius_autoencoder): halos and slab boundaries then land
    on the pixel-unshuffle grid, so every device groups the same 2x2 pixel
    blocks the full-frame execution does. true_h must be a multiple of
    align (the ModCrop contract).
    """
    n = int(np.prod(mesh.devices.shape))
    if halo % align:
        halo += align - halo % align

    def body(xs, true_h):
        # xs: (1, slab, W, C) local; true_h: replicated scalar
        slab = xs.shape[1]
        idx = lax.axis_index(axis)
        # halo may span several neighbor slabs (RF radius ~60 LR px vs a
        # 1080p/8 slab of 34): hop k fetches the whole slab of device idx-/+k;
        # ppermute leaves zeros where there is no sender (true frame edges)
        hops = -(-halo // slab)
        tops = [lax.ppermute(xs, axis, [(i, i + k) for i in range(n - k)])
                for k in range(hops, 0, -1)]
        bots = [lax.ppermute(xs, axis, [(i + k, i) for i in range(n - k)])
                for k in range(1, hops + 1)]
        top = jnp.concatenate(tops, axis=1)[:, -halo:] if hops > 1 \
            else tops[0][:, -halo:]
        bot = jnp.concatenate(bots, axis=1)[:, :halo] if hops > 1 \
            else bots[0][:, :halo]
        xh = jnp.concatenate([top, xs, bot], axis=1)
        # valid rows of xh in local coords: global row g = idx*slab - halo + r
        start = idx * slab - halo
        lo = jnp.clip(-start, 0, slab + 2 * halo)
        hi = jnp.clip(true_h[0] - start, 0, slab + 2 * halo)
        y = subnet(xh, row_valid=(lo, hi))
        return y[:, halo * scale:(halo + slab) * scale]

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None))

    @jax.jit
    def infer(x, true_h):
        return sharded(x, jnp.asarray([true_h], jnp.int32))

    def run(x, true_h=None):
        x = np.asarray(x)
        assert x.shape[0] == 1, "frame-at-a-time inference"
        if true_h is None:
            true_h = x.shape[1]
        if x.shape[1] % (n * align):
            pad = n * align - x.shape[1] % (n * align)
            x = np.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        xd = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
        y = infer(xd, true_h)
        return np.asarray(y)[:, :true_h * scale]

    return run


def pad_rows(h: int, n: int) -> int:
    """Rows after padding h up to a multiple of n."""
    return h if h % n == 0 else h + n - h % n
