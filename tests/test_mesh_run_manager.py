"""SRRunManager on an 8-device CPU mesh: end-to-end data-parallel epoch."""

import jax
import numpy as np

from ofa_sr_tpu.data import SyntheticSRProvider
from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
from ofa_sr_tpu.parallel import make_mesh
from ofa_sr_tpu.train import RunConfig, SRRunManager

SMALL = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=1, width=8)


def test_run_manager_on_mesh(tmp_path):
    assert jax.device_count() >= 8
    mesh = make_mesh()
    net = OFAMobileNetS4(SMALL)
    cfg = RunConfig(n_epochs=1, base_lr=1e-3, train_batch_size=8,
                    print_frequency=1, validation_frequency=1,
                    test_batch_size=1)
    prov = SyntheticSRProvider(n_train=16, n_valid=2, hr_size=16,
                               train_batch_size=8, test_batch_size=1)
    rm = SRRunManager(str(tmp_path), net, cfg, prov, mesh=mesh)
    best = rm.train()
    assert np.isfinite(best)
    # params remain replicated after the epoch
    leaf = jax.tree.leaves(rm.params)[0]
    assert len(leaf.sharding.device_set) == 8
