"""K-step training-trajectory parity against the torch reference trainer.

Drives the reference's exact multi-subnet training semantics
(progressive_shrinking.py:94-224: per batch, loop dynamic_batch_size subnets
with the int('%d%.3d%.3d') seed contract, the sampled pixel_d selecting the
2x- or 4x-down input (:177-180), MSE loss, loss.backward() accumulation, one
optimizer.step(); Adam with the no_decay_keys='bn#bias' two-group split,
run_manager.py:115-133; per-batch cosine LR, run_manager.py:67-80) side by
side with SRTrainer from an identical imported init, and requires the
per-step losses and the final parameters to agree within float tolerance.

This proves gradients, the Adam two-group decay, the LR schedule, train-mode
BN statistics threading, and the subnet-sampling contract — not just the
forward. The reference net runs in the *published SR config*: OFAMobileNetX4
with the encoder comment-toggle applied (ofa_mbx4.py:186-218 commented out —
the config behind the README's 39.15/31.01 dB numbers). The toggle is
applied here by binding a forward that mirrors the remaining (decoder) lines
219-246 verbatim in structure, since the reference chooses it by editing
source.
"""

import math
import os
import random
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")

N_BATCH = 4  # optimizer steps per dynamic_batch_size setting
BASE_LR = 1e-3
WD = 3e-5
HR = 16  # tiny frames keep the CPU compile/run affordable


@pytest.fixture(scope="module")
def ref_x4_cls():
    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda *a, **k: a[0]
    tv.utils = tvu
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tvu)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ofa.elastic_nn.modules.dynamic_op import DynamicSeparableConv2d
    from ofa.elastic_nn.networks.ofa_mbx4 import OFAMobileNetX4 as RefX4
    DynamicSeparableConv2d.KERNEL_TRANSFORM_MODE = 1
    return RefX4


def _sr_mode_forward(self, x):
    """ofa_mbx4.py forward with the SR comment-toggle applied: lines 186-218
    (encoder) removed, decoder lines 219-246 kept as written — including the
    enumerate-from-0 runtime_depth indexing that produces the reference
    quirks (arch.reference_quirk_arch_x4)."""
    x = self.dec_first_conv_block(x)
    dec_big_skip = x
    for stage_id, block_idx in enumerate(self.block_group_info[5:9]):
        depth = self.runtime_depth[stage_id]
        active_idx = block_idx[:depth]
        for idx in active_idx:
            x = self.blocks[idx](x)
    for i, dec_final_conv_block in enumerate(self.dec_final_conv_blocks):
        x = dec_final_conv_block(x)
        if i == 0:
            x += dec_big_skip
    for stage_id, block_idx in enumerate(self.block_group_info[9:]):
        depth = self.runtime_depth[stage_id]
        active_idx = block_idx[:depth]
        for idx in active_idx:
            x = self.blocks[idx](x)
    return self.dec_final_output_conv_block(x)


def _batches(seed=0, n=2 * N_BATCH, b=1, hr=HR):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        out.append({
            "image": rng.rand(b, hr, hr, 3).astype(np.float32),
            "x2": rng.rand(b, hr // 2, hr // 2, 3).astype(np.float32),
            "x4": rng.rand(b, hr // 4, hr // 4, 3).astype(np.float32),
        })
    return out


def _fresh_ref(RefX4):
    import torch
    torch.manual_seed(42)
    ref = RefX4(ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                depth_list=[2, 3, 4], pixelshuffle_depth_list=[1, 2])
    ref.forward = types.MethodType(_sr_mode_forward, ref)
    return ref


def _run_reference(RefX4, batches, dynamic_batch_size):
    import torch
    import torch.nn.functional as F

    ref = _fresh_ref(RefX4)
    ref.train()
    # SRRunManager's no_decay_keys='bn#bias' split (sr_run_manager.py:180-191)
    keys = ["bn", "bias"]
    wd_params, no_wd = [], []
    for name, p in ref.named_parameters():
        (no_wd if any(k in name for k in keys) else wd_params).append(p)
    opt = torch.optim.Adam([
        {"params": wd_params, "weight_decay": WD},
        {"params": no_wd, "weight_decay": 0},
    ], BASE_LR)

    losses = []
    for i in range(N_BATCH):
        hr = torch.from_numpy(batches[i]["image"].transpose(0, 3, 1, 2))
        lrs = {1: torch.from_numpy(batches[i]["x2"].transpose(0, 3, 1, 2)),
               2: torch.from_numpy(batches[i]["x4"].transpose(0, 3, 1, 2))}
        lr = 0.5 * BASE_LR * (1 + math.cos(math.pi * i / N_BATCH))
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        step_losses = []
        for k in range(dynamic_batch_size):
            random.seed(int("%d%.3d%.3d" % (i, k, 0)))
            settings = ref.sample_active_subnet()
            out = ref(lrs[settings["pixel_d"][0]])
            loss = F.mse_loss(out, hr)
            step_losses.append(float(loss))
            loss.backward()
        opt.step()
        losses.append(float(np.mean(step_losses)))
    return ref, losses


def _run_ours(ref_sd, batches, dynamic_batch_size):
    import jax
    import jax.numpy as jnp

    from ofa_sr_tpu.models import OFAMobileNetX4, SearchSpace, sample_subnet
    from ofa_sr_tpu.models.arch import reference_quirk_arch_x4, subnet_seed
    from ofa_sr_tpu.train.checkpoint import import_torch_x4
    from ofa_sr_tpu.train.schedules import lr_at_step
    from ofa_sr_tpu.train.touched import sr_touched_mask
    from ofa_sr_tpu.train.train_step import SRTrainer

    space = SearchSpace()
    net = OFAMobileNetX4(space)
    params, state = import_torch_x4(ref_sd, net)
    trainer = SRTrainer(net, opt_type="adam", weight_decay=WD, mode="sr")
    opt_state = trainer.init_opt_state(params)
    step = trainer.make_train_step(n_subnets=dynamic_batch_size,
                                   donate=False)

    losses = []
    for i in range(N_BATCH):
        batch = {k: jnp.asarray(v) for k, v in batches[i].items()}
        lr = lr_at_step(BASE_LR, 0, i, N_BATCH, 1, warmup_epochs=0,
                        warmup_lr=-1, lr_schedule_type="cosine")
        archs, descs = [], []
        for k in range(dynamic_batch_size):
            cfg = sample_subnet(space, n_trunks=2,
                                seed=subnet_seed(0, N_BATCH, i, k))
            eff = reference_quirk_arch_x4(cfg)
            descs.append(eff)
            archs.append(eff.to_device(space))
        touched = sr_touched_mask(net, params, descs, mode="sr")
        params, state, opt_state, metrics = step(
            params, state, opt_state, batch, tuple(archs),
            jnp.asarray(lr, jnp.float32), touched)
        losses.append(float(metrics["loss"]))
    return net, params, state, losses


@pytest.mark.parametrize("dynamic_batch_size", [1, 2])
def test_training_trajectory_parity(ref_x4_cls, dynamic_batch_size):
    import jax.numpy as jnp
    import torch

    batches = _batches()
    ref, ref_losses = _run_reference(ref_x4_cls, batches, dynamic_batch_size)
    ref_sd = _fresh_ref(ref_x4_cls).state_dict()  # identical torch seed
    net, params, state, our_losses = _run_ours(ref_sd, batches,
                                               dynamic_batch_size)

    # per-step losses track each other through all optimizer steps
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-5)

    # final-state parity: identical eval forward after the updates
    from ofa_sr_tpu.models import SearchSpace, sample_subnet
    from ofa_sr_tpu.models.arch import reference_quirk_arch_x4
    space = SearchSpace()
    cfg = sample_subnet(space, seed=999, n_trunks=2)
    ref.eval()
    ref.set_active_subnet(ks=list(cfg.ks), e=list(cfg.e), d=list(cfg.d),
                          pixel_d=[cfg.pixel_d])
    eff = reference_quirk_arch_x4(cfg)
    hw = HR // (2 ** eff.pixel_d)
    x = np.random.RandomState(123).rand(1, hw, hw, 3).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    y_ours, _ = net.apply(params, state, jnp.asarray(x),
                          eff.to_device(space), pixel_d=eff.pixel_d,
                          mode="sr", training=False)
    np.testing.assert_allclose(np.asarray(y_ours),
                               y_ref.transpose(0, 2, 3, 1),
                               rtol=5e-3, atol=5e-4)
