"""End-to-end OFA-SR walkthrough (the reference tutorial/ofa.ipynb as a
runnable script): train a small supernet, evaluate subnet corners, build an
efficiency table, fit a quality predictor, run evolutionary search under a
FLOPs constraint, and deploy the winner as a materialized jitted subnet.

Runs on CPU or TPU with synthetic data in a couple of minutes:
    python tutorial/ofa_tpu_tutorial.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.data import SyntheticSRProvider
from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet
from ofa_sr_tpu.models.arch import uniform_subnet
from ofa_sr_tpu.models.materialize import get_active_subnet
from ofa_sr_tpu.search import (
    AccuracyPredictor,
    EvolutionFinder,
    FLOPsTable,
    encode_sr_subnet,
    measure_latency,
)
from ofa_sr_tpu.train import RunConfig, SRRunManager


def main():
    # -- 1. a small SR supernet + a short progressive-shrinking-style run ----
    space = SearchSpace(ks_list=[3, 5, 7], expand_list=[3, 4, 6],
                        depth_list=[2, 3, 4], pixel_d_list=[1, 2],
                        n_stages=2, width=16)
    net = OFAMobileNetS4(space)
    provider = SyntheticSRProvider(n_train=32, n_valid=4, hr_size=32,
                                   train_batch_size=8)
    cfg = RunConfig(n_epochs=2, base_lr=1e-3, train_batch_size=8,
                    dynamic_batch_size=2, print_frequency=2)
    rm = SRRunManager("exp/tutorial", net, cfg, provider)
    print("== training the supernet (2 epochs, 2 subnets/step) ==")
    rm.train()

    # -- 2. validate the corners of every elastic dimension ------------------
    print("\n== subnet corners ==")
    corners = {}
    for name, c in {
        "max (k7 e6 d4 pd2)": uniform_subnet(space, 7, 6, 4, 2),
        "min (k3 e3 d2 pd1)": uniform_subnet(space, 3, 3, 2, 1),
        "mid (k5 e4 d3 pd1)": uniform_subnet(space, 5, 4, 3, 1),
    }.items():
        loss, psnr = rm.validate(c)
        corners[name] = psnr
        print("  %-20s psnr %.3f" % (name, psnr))

    # -- 3. efficiency: closed-form FLOPs table + measured latency -----------
    table = FLOPsTable(space, hr_size=32, conv_ks=5)
    max_macs = table.predict_efficiency(uniform_subnet(space, 7, 6, 4, 1))
    print("\n== efficiency ==")
    print("  max-subnet MACs @32px: %.1fM" % (max_macs / 1e6))
    sub = get_active_subnet(net, rm.params, rm.state,
                            uniform_subnet(space, 7, 6, 4, 1))
    x = jnp.asarray(np.random.rand(1, 16, 16, 3), jnp.float32)
    ms = measure_latency(jax.jit(sub), x, warmup=2, iters=5)
    print("  materialized max subnet: %.2f ms/frame" % ms)

    # -- 4. quality predictor: sample subnets, measure, fit the MLP ----------
    print("\n== fitting the PSNR predictor on 48 sampled subnets ==")
    cfgs = [sample_subnet(space, seed=i) for i in range(48)]
    feats = np.stack([encode_sr_subnet(c, space) for c in cfgs])
    targets = np.asarray([rm.validate(c)[1] for c in cfgs], np.float32)
    pred = AccuracyPredictor(in_dim=feats.shape[1], hidden=64, n_layers=2)
    pred.fit(feats, targets, epochs=60, lr=3e-3)

    # -- 5. evolutionary search under a FLOPs constraint ----------------------
    constraint = 0.5 * max_macs
    print("\n== evolution: maximize predicted PSNR under %.1fM MACs =="
          % (constraint / 1e6))

    def quality(c):
        return float(pred.predict(encode_sr_subnet(c, space))[0])

    finder = EvolutionFinder(space, table.predict_efficiency, quality,
                             population_size=24, max_time_budget=8, seed=0)
    best, score, history = finder.run(constraint)
    print("  winner: %s" % best.describe()[:70])
    print("  predicted psnr %.3f | MACs %.1fM (constraint %.1fM)"
          % (score, table.predict_efficiency(best) / 1e6, constraint / 1e6))
    loss, true_psnr = rm.validate(best)
    print("  measured psnr %.3f" % true_psnr)

    # -- 6. deploy: materialize + jit the winner ------------------------------
    winner = get_active_subnet(net, rm.params, rm.state, best)
    jwin = jax.jit(winner)
    lr_hw = 32 // (2 ** best.pixel_d)
    xin = jnp.asarray(np.random.rand(1, lr_hw, lr_hw, 3), jnp.float32)
    y = jwin(xin)
    ms = measure_latency(jwin, xin, warmup=2, iters=5)
    print("\n== deployed ==")
    print("  %s -> %s in %.2f ms/frame (BN folded, jitted static subnet)"
          % (tuple(xin.shape), tuple(y.shape), ms))

    # -- 7. serialize the winner (the ofa_specialized deployment contract) ----
    import json

    arch_json = json.dumps(best.to_dict())
    print("\n== serialized winner (SubnetConfig JSON) ==")
    print("  %s" % arch_json[:76])
    from ofa_sr_tpu.models.arch import SubnetConfig
    assert SubnetConfig.from_dict(json.loads(arch_json)) == best

    # -- 7b. AOT serving artifact: weights + program, no model code needed ----
    import tempfile

    from ofa_sr_tpu.models.export import export_subnet, load_subnet

    with tempfile.TemporaryDirectory() as tdir:
        art = os.path.join(tdir, "winner.stablehlo")
        blob = export_subnet(net, rm.params, rm.state, best,
                             (xin.shape[1], xin.shape[2]), path=art)
        served = load_subnet(art)
        assert jnp.array_equal(served(xin), y)
    print("\n== AOT export ==")
    print("  %d-byte StableHLO artifact (cpu+tpu), serves bit-identically"
          % len(blob))

    # -- 8. big frames: overlap-tiled inference (one compile, any size) -------
    from ofa_sr_tpu.train import receptive_field_radius, tiled_sr_infer

    halo = receptive_field_radius(best, space)
    big = np.random.rand(1, 72, 88, 3).astype(np.float32)
    y_big = tiled_sr_infer(lambda t: jwin(jnp.asarray(t)), big,
                           tile=16, halo=halo, scale=2 ** best.pixel_d)
    print("\n== tiled large-frame inference ==")
    print("  %s -> %s via 16px tiles, halo %d (receptive-field exact)"
          % (tuple(big.shape), tuple(y_big.shape), halo))


if __name__ == "__main__":
    main()
