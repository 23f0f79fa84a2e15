"""Spatially-sharded full-frame inference (shard_map + ppermute halo
exchange) == full-frame execution, on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
from ofa_sr_tpu.models.arch import uniform_subnet
from ofa_sr_tpu.models.materialize import get_active_subnet
from ofa_sr_tpu.parallel import make_mesh
from ofa_sr_tpu.parallel.spatial import make_spatial_infer
from ofa_sr_tpu.train.tiled_infer import receptive_field_radius

SPACE = SearchSpace(ks_list=[3, 5], expand_list=[3], depth_list=[2],
                    pixel_d_list=[1, 2], n_stages=2, width=16)


def _subnet(pd, seed=0):
    net = OFAMobileNetS4(SPACE)
    p, s = net.init(jax.random.PRNGKey(seed))
    cfg = uniform_subnet(SPACE, 5, 3, 2, pd)
    return get_active_subnet(net, p, s, cfg), cfg


def test_row_valid_masking_matches_unpadded():
    """StaticSubnet(row-padded x, row_valid) == StaticSubnet(x) on the valid
    rows — the single-device version of the frame-edge equivalence."""
    subnet, cfg = _subnet(pd=1)
    x = np.random.RandomState(0).rand(1, 20, 24, 3).astype(np.float32)
    y_ref = np.asarray(jax.jit(subnet)(jnp.asarray(x)))
    xp = np.pad(x, ((0, 0), (0, 12), (0, 0), (0, 0)))
    y_pad = np.asarray(subnet(jnp.asarray(xp),
                              row_valid=(jnp.int32(0), jnp.int32(20))))
    # window-exact claim (parallel/spatial.py): ULP-tight (VERDICT r2 §7)
    np.testing.assert_allclose(y_pad[:, :40], y_ref, rtol=5e-6, atol=1e-6)
    # padded region output is garbage by contract; only the valid rows count


def test_spatial_sharded_matches_full_frame():
    assert jax.device_count() >= 8
    mesh = make_mesh()
    for pd in (1, 2):
        subnet, cfg = _subnet(pd, seed=pd)
        halo = receptive_field_radius(cfg, SPACE)
        scale = 2 ** pd
        run = make_spatial_infer(subnet, mesh, halo=halo, scale=scale)
        # H=40: slab=5 < halo (~20) -> exercises multi-hop halo gathering;
        # H=44 is not divisible by 8 -> exercises row padding + true_h
        for h in (40, 44):
            x = np.random.RandomState(h + pd).rand(1, h, 32, 3).astype(
                np.float32)
            y_full = np.asarray(jax.jit(subnet)(jnp.asarray(x)))
            y_sh = run(x)
            assert y_sh.shape == y_full.shape
            np.testing.assert_allclose(y_sh, y_full, rtol=5e-6, atol=1e-6)
