"""BN recalibration — `set_running_statistics` (elastic_nn/utils.py:16-66).

Reference semantics: for the active subnet, run calibration batches with
every BN normalizing by its *current batch* stats, accumulate per-batch mean
and *biased* variance meters, then write the batch-averaged stats into the
active channel prefix; BNs the subnet never executes keep their old stats.

TPU-native formulation (one compiled forward, no hooks, no deep copy):
- run the training-mode forward with momentum=1.0 and biased-variance
  updates: the returned state holds exactly that batch's moments for every
  BN the subnet touched (training mode already normalizes by batch stats);
- start each batch from a sentinel-filled state, so untouched leaves
  (masked channels, gated-out blocks) still carry the sentinel afterwards;
- arithmetic-mean the per-batch states, then keep the original stats
  wherever the sentinel survived.

Under a data-sharded jit the batch moments are global-batch moments — the
distributed allreduce the reference does by hand
(distributed_run_manager.py:343-353) falls out of the sharding.
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp

_SENTINEL = 1e30


def _is_bn_leaf(path):
    names = [getattr(p, "key", None) for p in path]
    return ("mean" in names) or ("var" in names)


def bn_recalibrate(net, params, state, arch, pixel_d, batches, *,
                   mode=None, input_key="image"):
    """Recalibrate running stats for the subnet `arch` over `batches`.

    `input_key` defaults to 'image' — the reference calibrates on the HR
    image even for SR nets (elastic_nn/utils.py:57; a documented quirk).
    Pass 'x2'/'x4' to calibrate at the deployment input resolution.
    Returns the new state.
    """
    calib_net = copy.copy(net)
    calib_net.bn_cfg = dict(net.bn_cfg, momentum=1.0, update_var="biased")

    kw = {"mode": mode} if mode is not None else {}
    if pixel_d is not None:
        kw["pixel_d"] = pixel_d  # SR nets; classification nets take no pixel_d

    @jax.jit
    def one_batch(p, st, x):
        _, new_state = calib_net.apply(p, st, x, arch, training=True, **kw)
        return new_state

    st0 = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.full_like(leaf, _SENTINEL) if _is_bn_leaf(path) else leaf,
        state)

    # batch-size-weighted mean, matching the reference's AverageMeter
    # semantics (elastic_nn/utils.py:44-52) so a partial final calibration
    # batch doesn't skew the stats
    total, n = None, 0
    for batch in batches:
        x = jnp.asarray(batch[input_key])
        w = x.shape[0]
        st_i = one_batch(params, st0, x)
        weighted = jax.tree.map(lambda t: t * w, st_i)
        total = weighted if total is None else jax.tree.map(
            jnp.add, total, weighted)
        n += w
    if n == 0:
        return state
    avg = jax.tree.map(lambda t: t / n, total)
    # untouched leaves still average to the sentinel -> keep original stats
    return jax.tree.map(
        lambda a, orig: jnp.where(a >= _SENTINEL / 2, orig, a), avg, state)
