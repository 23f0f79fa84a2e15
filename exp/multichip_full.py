"""Out-of-band multichip evidence the driver's budget can't afford
(VERDICT r4 next #6 and #7).

The committed dryrun (__graft_entry__.dryrun_multichip) narrows its
production pass to a 2x2 ks/e sub-space — 4 dw branches — because the
full-space compile broke the driver's budget in r3 (~700 s on this 1-CPU
container). This script runs the two gaps ONCE, unbudgeted, and writes
MULTICHIP_FULL_r05.json:

1. full-space production step — ks [3,5,7] x e [3,4,6] = the 9 dw
   branches the real TPU step compiles (bench.py envelope: bf16 compute,
   remat='all_save_bn', dw_switch), jitted + executed over an 8-device
   virtual CPU mesh. Closes the "branch-count-dependent multichip compile
   bug would slip through" gap.
2. X4 autoencoder step — the flagship deployment model (encoder+decoder,
   mirrored pixel_d, /root/reference/ofa/elastic_nn/networks/ofa_mbx4.py:360-376)
   has only ever run multichip as OFAMobileNetS4. One vanilla-config X4
   train step on the same mesh, plus its spatial halo-exchange inference
   path (rows sharded over the mesh, autoencoder scale=1) checked against
   the single-device full-frame result.

Run: python exp/multichip_full.py [--n_devices 8] [--out MULTICHIP_FULL_r05.json]
Self-hosts the virtual CPU mesh exactly like dryrun_multichip.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def child(n_devices, out):
    import jax
    import jax.numpy as jnp

    from ofa_sr_tpu.models import (OFAMobileNetS4, OFAMobileNetX4,
                                   SearchSpace, sample_subnet)
    from ofa_sr_tpu.models.arch import uniform_subnet
    from ofa_sr_tpu.models.materialize import get_active_subnet
    from ofa_sr_tpu.parallel import make_mesh, shard_batch, shard_params
    from ofa_sr_tpu.parallel.spatial import make_spatial_infer
    from ofa_sr_tpu.train import SRTrainer
    from ofa_sr_tpu.train.tiled_infer import (
        receptive_field_radius_autoencoder)

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices
    mesh = make_mesh(devices)
    rng = np.random.RandomState(0)
    b = max(2 * n_devices, 8)
    report = {"n_devices": n_devices, "platform": devices[0].platform,
              "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}

    def run_train(net, space, trainer_kw, archs, batch, tag):
        params, state = net.init(jax.random.PRNGKey(0))
        trainer = SRTrainer(net, opt_type="adam", weight_decay=3e-5,
                            **trainer_kw)
        opt_state = trainer.init_opt_state(params)
        step = trainer.make_train_step(n_subnets=len(archs), donate=False)
        params = shard_params(params, mesh)
        state = shard_params(state, mesh)
        opt_state = shard_params(opt_state, mesh)
        archs = tuple(shard_params(a, mesh) for a in archs)
        batch = shard_batch(batch, mesh)
        t0 = time.time()
        new_params, new_state, _, metrics = step(
            params, state, opt_state, batch, archs, jnp.asarray(1e-3))
        jax.block_until_ready((new_params, metrics))
        rec = {"ok": True, "loss": round(float(metrics["loss"]), 5),
               "psnr": round(float(metrics["psnr"]), 2),
               "compile_plus_step_s": round(time.time() - t0, 1)}
        print("%s: %s" % (tag, rec), flush=True)
        report[tag] = rec
        return net, new_params, new_state

    # -- 1. full 9-branch production space (S4, bench.py trainer config) ----
    space9 = SearchSpace(ks_list=[3, 5, 7], expand_list=[3, 4, 6],
                         depth_list=[2, 3], pixel_d_list=[1, 2],
                         n_stages=2, width=16)
    net9 = OFAMobileNetS4(space9)
    batch = {"image": jnp.asarray(rng.rand(b, 16, 16, 3), jnp.float32),
             "x2": jnp.asarray(rng.rand(b, 8, 8, 3), jnp.float32),
             "x4": jnp.asarray(rng.rand(b, 4, 4, 3), jnp.float32)}
    archs9 = tuple(sample_subnet(space9, seed=i).to_device(space9)
                   for i in range(2))
    run_train(net9, space9,
              dict(compute_dtype=jnp.bfloat16, remat="all_save_bn",
                   dw_switch=True),
              archs9, batch,
              "production_full_space_9dw_branches")

    # -- 2. X4 autoencoder train step on the mesh ---------------------------
    space_x4 = SearchSpace(ks_list=[3, 5], expand_list=[3, 4],
                           depth_list=[2, 3], pixel_d_list=[1, 2],
                           n_stages=2, width=16)
    net_x4 = OFAMobileNetX4(space_x4)
    batch_x4 = {"image": jnp.asarray(rng.rand(b, 16, 16, 3), jnp.float32)}
    archs_x4 = tuple(
        uniform_subnet(space_x4, k, e, d, pd, n_trunks=net_x4.n_trunks
                       ).to_device(space_x4)
        for (k, e, d, pd) in ((5, 4, 3, 2), (3, 3, 2, 1)))
    _, px4, sx4 = run_train(net_x4, space_x4, dict(mode="autoencoder"),
                            archs_x4, batch_x4, "x4_autoencoder_step")

    # -- 2b. X4 spatial halo-exchange inference on the mesh -----------------
    cfg = uniform_subnet(space_x4, 5, 3, 2, 2, n_trunks=net_x4.n_trunks)
    halo = receptive_field_radius_autoencoder(cfg, space_x4)
    frame = jnp.asarray(
        rng.rand(1, 4 * max(halo, 2) * n_devices, 24, 3), jnp.float32)
    for fold, bound in ((False, 1e-5), (True, 2e-4)):
        subnet = get_active_subnet(net_x4, px4, sx4, cfg,
                                   mode="autoencoder", fold_tail=fold)
        t0 = time.time()
        y_sp = make_spatial_infer(subnet, mesh, halo=halo, scale=1)(frame)
        y_ref = np.asarray(jax.jit(subnet)(frame))
        err = float(np.max(np.abs(np.asarray(y_sp) - y_ref)))
        rec = {"ok": bool(err <= bound), "halo": int(halo),
               "max_err": err, "bound": bound,
               "wall_s": round(time.time() - t0, 1)}
        print("x4_spatial_fold_%s: %s" % (fold, rec), flush=True)
        report["x4_spatial_fold_%s" % fold] = rec
        assert err <= bound, rec

    report["ok"] = True
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote %s" % out, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_devices", type=int, default=8)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "MULTICHIP_FULL_r05.json"))
    ap.add_argument("--_child", action="store_true")
    a = ap.parse_args()
    import jax  # noqa: deferred so the parent never initializes a backend

    if not a._child:
        env = dict(os.environ)
        env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                    "XLA_FLAGS": "--xla_force_host_platform_device_count=%d"
                                 % a.n_devices})
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_child",
             "--n_devices", str(a.n_devices), "--out", a.out],
            env=env, cwd=REPO).returncode
        raise SystemExit(rc)
    child(a.n_devices, a.out)


if __name__ == "__main__":
    main()
