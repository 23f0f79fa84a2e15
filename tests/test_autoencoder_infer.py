"""X4 autoencoder-mode large-frame inference: row_valid through the encoder
(unshuffle-grid-aligned masking), overlap-tiled and spatially-sharded paths
== full-frame execution (VERDICT r2 §8)."""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.models import OFAMobileNetX4, SearchSpace
from ofa_sr_tpu.models.arch import uniform_subnet
from ofa_sr_tpu.models.materialize import get_active_subnet
from ofa_sr_tpu.parallel import make_mesh
from ofa_sr_tpu.parallel.spatial import make_spatial_infer
from ofa_sr_tpu.train.tiled_infer import (
    receptive_field_radius_autoencoder,
    tiled_sr_infer,
)

SPACE = SearchSpace(ks_list=[3, 5], expand_list=[3], depth_list=[2],
                    pixel_d_list=[1, 2], n_stages=2, width=16)


def _subnet(pd, seed=0, fold_tail=True):
    net = OFAMobileNetX4(SPACE)
    p, s = net.init(jax.random.PRNGKey(seed))
    cfg = uniform_subnet(SPACE, 5, 3, 2, pd, n_trunks=2)
    return get_active_subnet(net, p, s, cfg, mode="autoencoder",
                             fold_tail=fold_tail), cfg


def test_ae_row_valid_matches_unpadded():
    for pd in (1, 2):
        subnet, _ = _subnet(pd)
        x = np.random.RandomState(pd).rand(1, 24, 24, 3).astype(np.float32)
        y_ref = np.asarray(jax.jit(subnet)(jnp.asarray(x)))
        xp = np.pad(x, ((0, 0), (0, 8), (0, 0), (0, 0)))
        y_pad = np.asarray(subnet(jnp.asarray(xp),
                                  row_valid=(jnp.int32(0), jnp.int32(24))))
        np.testing.assert_allclose(y_pad[:, :24], y_ref,
                                   rtol=1e-5, atol=5e-6)


def test_ae_tiled_matches_full_frame():
    for pd in (1, 2):
        sc = 2 ** pd
        subnet, cfg = _subnet(pd, seed=pd)
        jsub = jax.jit(subnet)
        halo = receptive_field_radius_autoencoder(cfg, SPACE)
        assert halo % sc == 0
        x = np.random.RandomState(10 + pd).rand(
            1, 8 * sc, 12 * sc, 3).astype(np.float32)
        y_full = np.asarray(jsub(jnp.asarray(x)))
        y_tiled = tiled_sr_infer(lambda t: jsub(jnp.asarray(t)), x,
                                 tile=4 * sc, halo=halo, scale=1)
        np.testing.assert_allclose(y_tiled, y_full, rtol=1e-5, atol=5e-6)


def test_ae_spatial_sharded_matches_full_frame():
    """Window-exactness contract, both tail configs. Unfolded: bitwise-tight
    (XLA's small-conv reductions are shape-independent — measured 0.0).
    Folded (the deployment default): the folded convs' 2304-deep reductions
    get shape-dependent tiling, so slab-vs-full differs by reassociation
    only — verified exact math in f64 (1.4e-13 on outputs of magnitude 93);
    f32 bound set from the measured 7.2e-5 abs / ~8e-7 rel."""
    assert jax.device_count() >= 8
    mesh = make_mesh()
    for pd in (1, 2):
        for fold in (False, True):
            sc = 2 ** pd
            subnet, cfg = _subnet(pd, seed=pd, fold_tail=fold)
            jsub = jax.jit(subnet)
            halo = receptive_field_radius_autoencoder(cfg, SPACE)
            run = make_spatial_infer(subnet, mesh, halo=halo, scale=1,
                                     align=sc)
            frame = np.random.RandomState(20 + pd).rand(
                1, 32 * sc, 16, 3).astype(np.float32)
            y_full = np.asarray(jsub(jnp.asarray(frame)))
            y_sp = run(frame)
            assert y_sp.shape == y_full.shape
            if fold:
                np.testing.assert_allclose(y_sp, y_full,
                                           rtol=1e-5, atol=2e-4)
            else:
                np.testing.assert_allclose(y_sp, y_full,
                                           rtol=1e-5, atol=5e-6)
