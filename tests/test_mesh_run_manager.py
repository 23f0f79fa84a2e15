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


def test_cls_run_manager_on_mesh(tmp_path):
    """ClsRunManager(mesh=) end-to-end: sharded batches, replicated params,
    scan (steps_per_dispatch) path included (VERDICT r2 §5)."""
    from ofa_sr_tpu.data.cls_providers import SyntheticClsProvider
    from ofa_sr_tpu.models.ofa_cls import ElasticClassifierNet, StageSpec
    from ofa_sr_tpu.train.cls_run_manager import ClsRunManager

    assert jax.device_count() >= 8
    mesh = make_mesh()
    net = ElasticClassifierNet(
        n_classes=10,
        stage_specs=[StageSpec(16, 2, "relu", False, 2),
                     StageSpec(24, 2, "h_swish", True, 2)],
        first_conv_width=8, first_conv_act="h_swish",
        first_block_act="relu", final_expand_width=64,
        feature_mix_width=96, ks_list=[3, 5], expand_list=[2, 3],
        depth_list=[1, 2])
    net._first_block_out = net.first_conv_width
    cfg = RunConfig(n_epochs=1, base_lr=1e-2, opt_type="sgd",
                    train_batch_size=8, test_batch_size=8,
                    print_frequency=1, validation_frequency=1,
                    steps_per_dispatch=2)
    prov = SyntheticClsProvider(n_train=32, n_test=8, image_size=16,
                                n_classes=10, train_batch_size=8,
                                test_batch_size=8)
    rm = ClsRunManager(str(tmp_path), net, cfg, prov, mesh=mesh)
    best = rm.train()
    assert np.isfinite(best)
    leaf = jax.tree.leaves(rm.params)[0]
    assert len(leaf.sharding.device_set) == 8
