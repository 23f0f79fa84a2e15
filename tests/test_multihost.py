"""True multi-process data parallelism over a global mesh.

The reference's multi-node story is Horovod: one process per GPU,
allreduced gradients, rank-0 checkpointing (train_ofa_net.py:121-130,
distributed_run_manager.py:72-75). The TPU-native equivalent is
jax.distributed + a global mesh: every process initializes identically,
contributes its local batch rows (make_array_from_process_local_data), and
the jitted global-batch step keeps parameters bit-identical on every host.

This test launches TWO real processes (4 virtual CPU devices each) against
a jax.distributed coordinator and checks (a) both ranks see the same loss
trajectory, (b) parameters stay in sync, (c) the trajectory matches a
single-process 8-device run of the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

WORKER = r"""
import json, os, sys
import numpy as np
import jax, jax.numpy as jnp

port, pid, nprocs, outdir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

from ofa_sr_tpu.parallel import init_distributed, make_mesh, shard_batch, shard_params
rank, world = init_distributed("localhost:%s" % port, nprocs, pid)
assert world == nprocs and rank == pid
assert jax.device_count() == 4 * nprocs, jax.device_count()
assert len(jax.local_devices()) == 4

from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet, subnet_seed
from ofa_sr_tpu.train import SRTrainer

space = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=1, width=8)
net = OFAMobileNetS4(space)
params, state = net.init(jax.random.PRNGKey(0))     # same seed on every host
trainer = SRTrainer(net, opt_type="adam", weight_decay=3e-5)
opt_state = trainer.init_opt_state(params)
step = trainer.make_train_step(n_subnets=1, donate=False)

mesh = make_mesh()
params = shard_params(params, mesh)
state = shard_params(state, mesh)
opt_state = shard_params(opt_state, mesh)

gbs, hr = 8, 16
rng = np.random.RandomState(0)
full = {
    "image": rng.rand(gbs, hr, hr, 3).astype(np.float32),
    "x2": rng.rand(gbs, hr // 2, hr // 2, 3).astype(np.float32),
    "x4": rng.rand(gbs, hr // 4, hr // 4, 3).astype(np.float32),
}
local_rows = gbs // nprocs
local = {k: v[pid * local_rows:(pid + 1) * local_rows] for k, v in full.items()}
batch = shard_batch(local, mesh)

losses = []
for i in range(3):
    arch = sample_subnet(space, seed=subnet_seed(0, 10, i, 0)).to_device(space)
    arch = shard_params(arch, mesh)
    params, state, opt_state, m = step(params, state, opt_state, batch,
                                       (arch,), 1e-3)
    losses.append(float(np.asarray(m["loss"])))

checksum = float(np.asarray(
    sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in jax.tree.leaves(params))))
with open(os.path.join(outdir, "out_%d.json" % pid), "w") as f:
    json.dump({"losses": losses, "checksum": checksum}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",   # disable the axon backend hook
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": REPO,
    })
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(pid), "2", str(tmp_path)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode()[-2000:]

    results = [json.load(open(tmp_path / ("out_%d.json" % pid)))
               for pid in range(2)]
    # both ranks computed the identical global step
    assert results[0] == results[1], results

    # the 2-process trajectory matches a single-process 8-device run
    import jax
    import jax.numpy as jnp

    from ofa_sr_tpu.models import (OFAMobileNetS4, SearchSpace, sample_subnet,
                                   subnet_seed)
    from ofa_sr_tpu.parallel import make_mesh, shard_batch, shard_params
    from ofa_sr_tpu.train import SRTrainer

    assert jax.device_count() >= 8
    space = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                        pixel_d_list=[1, 2], n_stages=1, width=8)
    net = OFAMobileNetS4(space)
    params, state = net.init(jax.random.PRNGKey(0))
    trainer = SRTrainer(net, opt_type="adam", weight_decay=3e-5)
    opt_state = trainer.init_opt_state(params)
    step = trainer.make_train_step(n_subnets=1, donate=False)
    mesh = make_mesh(jax.devices()[:8])
    params = shard_params(params, mesh)
    state = shard_params(state, mesh)
    opt_state = shard_params(opt_state, mesh)
    gbs, hr = 8, 16
    rng = np.random.RandomState(0)
    batch = shard_batch({
        "image": rng.rand(gbs, hr, hr, 3).astype(np.float32),
        "x2": rng.rand(gbs, hr // 2, hr // 2, 3).astype(np.float32),
        "x4": rng.rand(gbs, hr // 4, hr // 4, 3).astype(np.float32),
    }, mesh)
    ref_losses = []
    for i in range(3):
        arch = sample_subnet(space, seed=subnet_seed(0, 10, i, 0)).to_device(space)
        params, state, opt_state, m = step(params, state, opt_state, batch,
                                           (arch,), 1e-3)
        ref_losses.append(float(np.asarray(m["loss"])))
    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=1e-5)
