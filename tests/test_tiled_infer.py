"""Overlap-tiled large-frame inference == full-frame execution."""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
from ofa_sr_tpu.models.arch import uniform_subnet
from ofa_sr_tpu.models.materialize import get_active_subnet
from ofa_sr_tpu.train.tiled_infer import receptive_field_radius, tiled_sr_infer


def test_tiled_matches_full_frame():
    space = SearchSpace(ks_list=[3, 5], expand_list=[3], depth_list=[2],
                        pixel_d_list=[1, 2], n_stages=2, width=16)
    net = OFAMobileNetS4(space)
    p, s = net.init(jax.random.PRNGKey(0))
    for pd in (1, 2):
        cfg = uniform_subnet(space, 5, 3, 2, pd)
        subnet = get_active_subnet(net, p, s, cfg)
        jsub = jax.jit(subnet)
        halo = receptive_field_radius(cfg, space)
        rng = np.random.RandomState(pd)
        x = rng.rand(1, 40, 56, 3).astype(np.float32)
        y_full = np.asarray(jsub(jnp.asarray(x)))
        y_tiled = tiled_sr_infer(lambda t: jsub(jnp.asarray(t)), x,
                                 tile=16, halo=halo, scale=2 ** pd)
        # window-exact (train/tiled_infer.py docstring): ULP-tight bound
        np.testing.assert_allclose(y_tiled, y_full, rtol=5e-6, atol=1e-6)


def test_insufficient_halo_actually_differs():
    """Sanity: with halo << receptive field the stitched result must
    diverge — proving the exactness test above is not vacuous."""
    space = SearchSpace(ks_list=[5], expand_list=[3], depth_list=[2],
                        pixel_d_list=[1], n_stages=2, width=16)
    net = OFAMobileNetS4(space)
    p, s = net.init(jax.random.PRNGKey(1))
    cfg = uniform_subnet(space, 5, 3, 2, 1)
    subnet = get_active_subnet(net, p, s, cfg)
    jsub = jax.jit(subnet)
    x = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    y_full = np.asarray(jsub(jnp.asarray(x)))
    y_bad = tiled_sr_infer(lambda t: jsub(jnp.asarray(t)), x,
                           tile=16, halo=1, scale=2)
    assert np.abs(y_bad - y_full).max() > 1e-4


def test_mesh_tiled_matches_sequential_and_full():
    """Window batch sharded over the 8-device CPU mesh == sequential tiled
    == full frame (tile-level spatial sharding, SURVEY §5.7)."""
    from ofa_sr_tpu.parallel import make_mesh
    from ofa_sr_tpu.train.tiled_infer import tiled_sr_infer_mesh

    assert jax.device_count() >= 8
    space = SearchSpace(ks_list=[3, 5], expand_list=[3], depth_list=[2],
                        pixel_d_list=[1, 2], n_stages=2, width=16)
    net = OFAMobileNetS4(space)
    p, s = net.init(jax.random.PRNGKey(2))
    cfg = uniform_subnet(space, 5, 3, 2, 1)
    subnet = get_active_subnet(net, p, s, cfg)
    jsub = jax.jit(subnet)
    halo = receptive_field_radius(cfg, space)
    x = np.random.RandomState(5).rand(1, 48, 64, 3).astype(np.float32)

    y_full = np.asarray(jsub(jnp.asarray(x)))
    y_seq = tiled_sr_infer(lambda t: jsub(jnp.asarray(t)), x,
                           tile=16, halo=halo, scale=2)
    mesh = make_mesh()
    y_mesh = tiled_sr_infer_mesh(jsub, x, tile=16, halo=halo, scale=2,
                                 mesh=mesh)
    # same windows, batched+sharded execution: ULP-tight (VERDICT r2 §7)
    np.testing.assert_allclose(y_mesh, y_seq, rtol=5e-6, atol=1e-6)
    np.testing.assert_allclose(y_mesh, y_full, rtol=5e-6, atol=1e-6)
