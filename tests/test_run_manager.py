"""End-to-end orchestration on synthetic data: run manager, checkpointing,
torch-checkpoint import parity, BN recalibration, channel reorganization,
progressive shrinking stage machine."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofa_sr_tpu.data import SyntheticSRProvider
from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet
from ofa_sr_tpu.models.arch import max_subnet, uniform_subnet
from ofa_sr_tpu.models.reorganize import reorganize_s4
from ofa_sr_tpu.train import (
    RunConfig,
    SRRunManager,
    bn_recalibrate,
    import_torch_s4,
    load_checkpoint,
    save_checkpoint,
    supporting_elastic,
    validate_grid,
)

SMALL = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=1, width=8)


def _manager(tmp_path, **cfg_kw):
    net = OFAMobileNetS4(SMALL)
    defaults = dict(n_epochs=1, base_lr=1e-3, train_batch_size=4,
                    print_frequency=1, validation_frequency=1)
    defaults.update(cfg_kw)
    cfg = RunConfig(**defaults)
    prov = SyntheticSRProvider(n_train=8, n_valid=2, hr_size=16,
                               train_batch_size=4)
    return SRRunManager(str(tmp_path), net, cfg, prov)


def test_run_manager_train_and_logs(tmp_path):
    rm = _manager(tmp_path)
    best = rm.train()
    assert np.isfinite(best)
    assert os.path.exists(os.path.join(str(tmp_path), "logs", "valid_console.txt"))
    assert os.path.exists(os.path.join(str(tmp_path), "net_info.txt"))
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoint", "latest.txt"))
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoint", "model_best.ckpt"))


def test_checkpoint_roundtrip(tmp_path):
    rm = _manager(tmp_path / "a")
    rm.train()
    p_before = jax.tree.leaves(rm.params)[0]

    rm2 = _manager(tmp_path / "a")
    rm2.load_model()
    assert rm2.start_epoch == 1
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(rm2.params)[0]),
                                  np.asarray(p_before))
    # structure fully restored: training can continue
    rm2.run_config.n_epochs = 2
    rm2.train()


def test_save_frequency_skips_intermediate_epochs(tmp_path):
    """save_frequency=N saves every Nth non-validation epoch plus the final
    one (the relay-attached-chip knob: a save fetches the full
    params+opt_state from device). Validation epochs keep saving so best-
    checkpoint gating is unaffected."""
    saves = []
    rm = _manager(tmp_path, n_epochs=5, validation_frequency=1000,
                  save_frequency=3)
    orig = rm.save_model
    rm.save_model = lambda **kw: (saves.append(kw["epoch"]), orig(**kw))[1]
    rm.train()
    # epoch index is 0-based: (epoch+1) % 3 == 0 -> epochs 2; final epoch 4
    assert saves == [2, 4]
    # the final save landed on disk for warm-start chaining
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoint",
                                       "latest.txt"))
    ck = load_checkpoint(os.path.join(str(tmp_path), "checkpoint"))
    assert int(ck["epoch"]) == 4


def test_checkpoint_load_missing_is_graceful(tmp_path):
    rm = _manager(tmp_path / "fresh")
    rm.load_model(str(tmp_path / "nope"))
    assert rm.start_epoch == 0


def test_load_weights_lenient_across_spaces(tmp_path):
    """The reference chains checkpoints across different elastic spaces with
    load_state_dict(strict=False) (ofa_mbx4.py:303-341): a ks_list=[7]
    max-net pretrain has no kernel-transform matrices, yet its checkpoint
    warm-starts the ks=[3,5,7] kernel phase (train_ofa_net_sr_simple.py:
    236-240). Shared leaves must come from the checkpoint, absent ones keep
    the fresh init."""
    from ofa_sr_tpu.train.checkpoint import load_weights_lenient

    sp_max = SearchSpace(ks_list=[7], expand_list=[6], depth_list=[2],
                         pixel_d_list=[1], n_stages=2, width=8)
    net_max = OFAMobileNetS4(sp_max)
    p_max, s_max = net_max.init(jax.random.PRNGKey(0))
    p_max = jax.tree.map(lambda t: t + 1.0, p_max)  # make values distinctive
    save_checkpoint(str(tmp_path), {"epoch": 0, "best_acc": 0.0,
                                    "params": p_max, "state": s_max})

    sp_el = SearchSpace(ks_list=[3, 5, 7], expand_list=[6], depth_list=[2],
                        pixel_d_list=[1], n_stages=2, width=8)
    net_el = OFAMobileNetS4(sp_el)
    p_el, s_el = net_el.init(jax.random.PRNGKey(1))
    p2, s2, stats = load_weights_lenient(str(tmp_path), p_el, s_el)
    # same tree structure as the elastic net (kt matrices present)
    assert jax.tree.structure(p2) == jax.tree.structure(p_el)
    assert stats["kept_template"] > 0  # the kt leaves stayed fresh
    # a shared leaf (block depthwise conv) came from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(p2["blocks"][0]["depth_conv"]["conv"]["w"]),
        np.asarray(p_max["blocks"][0]["depth_conv"]["conv"]["w"]))
    # and a kt leaf kept the elastic net's own init
    np.testing.assert_array_equal(
        np.asarray(p2["blocks"][0]["depth_conv"]["kt"]["7to5"]),
        np.asarray(p_el["blocks"][0]["depth_conv"]["kt"]["7to5"]))


def test_torch_import_s4_parity(tmp_path):
    """Build a reference-shaped torch state_dict synthetically, import it,
    and check a forward agrees with manually-transposed weights."""
    torch = pytest.importorskip("torch")
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(0))

    # fabricate a torch state_dict from our params (the inverse mapping),
    # then re-import and require bit-identical trees
    sd = {}

    def put_conv(prefix, lp, ls):
        sd[prefix + ".conv.weight"] = torch.from_numpy(
            np.transpose(np.asarray(lp["conv"]["w"]), (3, 2, 0, 1)).copy())
        sd[prefix + ".bn.weight"] = torch.from_numpy(np.asarray(lp["bn"]["scale"]).copy())
        sd[prefix + ".bn.bias"] = torch.from_numpy(np.asarray(lp["bn"]["bias"]).copy())
        sd[prefix + ".bn.running_mean"] = torch.from_numpy(np.asarray(ls["bn"]["mean"]).copy())
        sd[prefix + ".bn.running_var"] = torch.from_numpy(np.asarray(ls["bn"]["var"]).copy())

    put_conv("dec_first_conv_block", p["dec_first_conv_block"], s["dec_first_conv_block"])
    n_mb = SMALL.blocks_per_trunk
    for i in range(n_mb):
        mic = "blocks.%d.mobile_inverted_conv" % i
        bp, bs = p["blocks"][i], s["blocks"][i]
        put_conv(mic + ".inverted_bottleneck", bp["inverted_bottleneck"],
                 bs["inverted_bottleneck"])
        put_conv(mic + ".depth_conv", bp["depth_conv"], bs["depth_conv"])
        for name, m in bp["depth_conv"]["kt"].items():
            sd[mic + ".depth_conv.conv.%s_matrix" % name] = torch.from_numpy(
                np.asarray(m).copy())
        put_conv(mic + ".point_linear", bp["point_linear"], bs["point_linear"])
    for i in range(2):
        put_conv("dec_final_conv_blocks.%d" % i, p["dec_final_conv_blocks"][i],
                 s["dec_final_conv_blocks"][i])
    for i in range(max(SMALL.pixel_d_list)):
        put_conv("blocks.%d" % (n_mb + i), p["shuffle_blocks"][i],
                 s["shuffle_blocks"][i])
    put_conv("dec_final_output_conv_block", p["dec_final_output_conv_block"],
             s["dec_final_output_conv_block"])

    # save as a torch checkpoint with module. prefix + state_dict wrapper
    sd_pref = {"module." + k: v for k, v in sd.items()}
    path = str(tmp_path / "ref.pth.tar")
    torch.save({"state_dict": sd_pref, "epoch": 3}, path)

    p2, s2 = import_torch_s4(path, net)
    for a, b in zip(jax.tree.leaves((p, s)), jax.tree.leaves((p2, s2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bn_recalibrate_sets_batch_average_stats():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(1))
    cfg = max_subnet(SMALL)
    rng = np.random.RandomState(0)
    batches = [{"image": rng.rand(4, 16, 16, 3).astype(np.float32) + 0.5}
               for _ in range(3)]
    s2 = bn_recalibrate(net, p, s, cfg.to_device(SMALL), cfg.pixel_d, batches)
    m_new = np.asarray(s2["dec_first_conv_block"]["bn"]["mean"])
    m_old = np.asarray(s["dec_first_conv_block"]["bn"]["mean"])
    assert np.abs(m_new - m_old).max() > 1e-4

    # inactive mid channels for a narrow subnet stay untouched
    cfg_small = uniform_subnet(SMALL, 3, 2, 1, 1)
    mid_small = SMALL.mid_channels(2)
    s3 = bn_recalibrate(net, p, s, cfg_small.to_device(SMALL), 1, batches)
    dw_mean = np.asarray(s3["blocks"][0]["depth_conv"]["bn"]["mean"])
    np.testing.assert_array_equal(
        dw_mean[mid_small:],
        np.asarray(s["blocks"][0]["depth_conv"]["bn"]["mean"])[mid_small:])
    assert np.abs(dw_mean[:mid_small]).max() > 0


def test_bn_recalibrate_average_is_exact():
    """running_mean must be the arithmetic mean of per-batch means
    (AverageMeter semantics, elastic_nn/utils.py:40-41,61-66)."""
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(2))
    cfg = max_subnet(SMALL)
    arch = cfg.to_device(SMALL)
    rng = np.random.RandomState(1)
    batches = [{"image": rng.rand(2, 16, 16, 3).astype(np.float32)}
               for _ in range(3)]
    s_all = bn_recalibrate(net, p, s, arch, cfg.pixel_d, batches)
    per = [bn_recalibrate(net, p, s, arch, cfg.pixel_d, [b]) for b in batches]
    want = np.mean([np.asarray(x["dec_first_conv_block"]["bn"]["mean"]) for x in per], axis=0)
    got = np.asarray(s_all["dec_first_conv_block"]["bn"]["mean"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_reorganize_preserves_max_subnet_function():
    """Permuting middle channels must not change the max subnet's function."""
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.RandomState(2).rand(1, 8, 8, 3).astype(np.float32))
    arch = max_subnet(SMALL).to_device(SMALL)
    y0, _ = net.apply(p, s, x, arch, pixel_d=2, training=False)
    p2, s2 = reorganize_s4(p, s, SMALL, expand_ratio_stage=0)
    # channels actually moved
    assert not np.array_equal(
        np.asarray(p["blocks"][0]["depth_conv"]["conv"]["w"]),
        np.asarray(p2["blocks"][0]["depth_conv"]["conv"]["w"]))
    y1, _ = net.apply(p2, s2, x, arch, pixel_d=2, training=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-4,
                               atol=2e-5)


def test_reorganize_stage_keeps_prefix_identity():
    """With expand_ratio_stage > 0, channels beyond the target width must all
    land after the kept prefix (dynamic_layers.py:158-163)."""
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(4))
    target = round(SMALL.width * sorted(SMALL.expand_list, reverse=True)[1])
    p2, _ = reorganize_s4(p, s, SMALL, expand_ratio_stage=1)
    w0 = np.abs(np.asarray(p["point_linear_importance"])) if False else None
    # kept prefix is a permutation of the original first `target` channels
    orig = np.asarray(p["blocks"][0]["point_linear"]["conv"]["w"])[0, 0]
    new = np.asarray(p2["blocks"][0]["point_linear"]["conv"]["w"])[0, 0]
    orig_set = {tuple(np.round(r, 6)) for r in orig[:target]}
    new_set = {tuple(np.round(r, 6)) for r in new[:target]}
    assert orig_set == new_set


def test_validate_grid_and_shrink_stage_machine(tmp_path):
    rm = _manager(tmp_path, n_epochs=1)
    loss, psnr, log = validate_grid(rm, ks_list=[3], expand_list=[2],
                                    depth_list=[1], pixel_d_list=[1, 2])
    assert "PD1-D1-E2-K3" in log and "PD2-D1-E2-K3" in log

    best = supporting_elastic(rm, "depth")
    assert np.isfinite(best)
    info = json.load(open(os.path.join(str(tmp_path), "depth.stage")))
    assert info["stage"] == 1
    # resumable: second call starts past the completed stage (no-op)
    best2 = supporting_elastic(rm, "depth")
    assert best2 == -1e9  # no stages left -> untouched sentinel


def test_shrink_mid_stage_resume(tmp_path, monkeypatch):
    """A process killed mid-stage (relay wedge) must resume at the next
    epoch of the SAME stage in a fresh process, then clear the
    running_stage marker when the stage completes."""
    orig = SRRunManager.train_one_epoch

    def crashing(self, epoch, *a, **k):
        if epoch == 1:
            raise RuntimeError("simulated wedge")
        return orig(self, epoch, *a, **k)

    rm = _manager(tmp_path, n_epochs=2)
    monkeypatch.setattr(SRRunManager, "train_one_epoch", crashing)
    with pytest.raises(RuntimeError, match="simulated wedge"):
        supporting_elastic(rm, "depth")
    info = json.load(open(os.path.join(str(tmp_path), "depth.stage")))
    assert info == {"stage": 0, "running_stage": 0}

    seen = []

    def recording(self, epoch, *a, **k):
        seen.append(epoch)
        return orig(self, epoch, *a, **k)

    monkeypatch.setattr(SRRunManager, "train_one_epoch", recording)
    rm2 = _manager(tmp_path, n_epochs=2)
    best = supporting_elastic(rm2, "depth")
    assert np.isfinite(best)
    assert seen[0] == 1  # resumed mid-stage, epoch 0 not retrained
    info = json.load(open(os.path.join(str(tmp_path), "depth.stage")))
    assert info["stage"] == 1 and "running_stage" not in info


def test_shrink_kernel_phase_resume(tmp_path, monkeypatch):
    """Single-stage tasks (kernel/pretrain) resume from their per-epoch
    checkpoint too — a rerun must not retrain from the warmstart."""
    orig = SRRunManager.train_one_epoch

    def crashing(self, epoch, *a, **k):
        if epoch == 1:
            raise RuntimeError("simulated wedge")
        return orig(self, epoch, *a, **k)

    rm = _manager(tmp_path, n_epochs=2)
    monkeypatch.setattr(SRRunManager, "train_one_epoch", crashing)
    with pytest.raises(RuntimeError, match="simulated wedge"):
        supporting_elastic(rm, "kernel")

    seen = []

    def recording(self, epoch, *a, **k):
        seen.append(epoch)
        return orig(self, epoch, *a, **k)

    monkeypatch.setattr(SRRunManager, "train_one_epoch", recording)
    rm2 = _manager(tmp_path, n_epochs=2)
    best = supporting_elastic(rm2, "kernel")
    assert np.isfinite(best)
    assert seen == [1]


def test_steps_per_dispatch_matches_per_step_training():
    """Device-side multi-step training (steps_per_dispatch > 1, lax.scan)
    produces the same parameters as one-dispatch-per-step training."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ofa_sr_tpu.data import SyntheticSRProvider
    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
    from ofa_sr_tpu.train import RunConfig, SRRunManager

    space = SearchSpace(ks_list=[3, 5], expand_list=[3], depth_list=[1, 2],
                        pixel_d_list=[1], n_stages=2, width=16)

    def run(spd):
        net = OFAMobileNetS4(space)
        provider = SyntheticSRProvider(n_train=20, n_valid=2, hr_size=16,
                                       train_batch_size=4)
        cfg = RunConfig(n_epochs=1, base_lr=1e-3, image_size=16,
                        validation_frequency=10, print_frequency=2,
                        steps_per_dispatch=spd)
        rm = SRRunManager("exp/test_spd/%d" % spd, net, cfg, provider)
        rm.params, rm.state = net.init(jax.random.PRNGKey(7))
        rm.opt_state = rm.trainer.init_opt_state(rm.params)
        loss, psnr = rm.train_one_epoch(0)
        return rm.params, loss

    p1, l1 = run(1)
    p2, l2 = run(2)  # 5 steps: two windows of 2 + a 1-step tail
    np.testing.assert_allclose(l2, l1, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)
