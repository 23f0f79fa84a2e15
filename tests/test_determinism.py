"""End-to-end training determinism: the reference's seed contracts must make
two identically-configured runs bit-identical (SURVEY.md §4 'determinism as
a testing aid')."""

import jax
import numpy as np

from ofa_sr_tpu.data import SyntheticSRProvider
from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
from ofa_sr_tpu.train import RunConfig, SRRunManager

SMALL = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=1, width=8)


def _run(tmp_path, tag):
    net = OFAMobileNetS4(SMALL)
    cfg = RunConfig(n_epochs=2, base_lr=1e-3, train_batch_size=4,
                    dynamic_batch_size=2, print_frequency=100,
                    validation_frequency=10, manual_seed=0)
    prov = SyntheticSRProvider(n_train=8, n_valid=2, hr_size=16,
                               train_batch_size=4)
    rm = SRRunManager(str(tmp_path / tag), net, cfg, prov)
    for epoch in range(cfg.n_epochs):
        rm.train_one_epoch(epoch)
    return rm.params


def test_two_runs_bit_identical(tmp_path):
    p1 = _run(tmp_path, "a")
    p2 = _run(tmp_path, "b")
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
