"""Supernet forward: shapes, depth gating, subnet sampling determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.models import (
    OFAMobileNetS4,
    OFAMobileNetX4,
    SearchSpace,
    sample_subnet,
    subnet_seed,
)
from ofa_sr_tpu.models.arch import max_subnet, uniform_subnet

SMALL = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=2, width=8)


def _x(b, h, w, c=3, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(b, h, w, c).astype(np.float32))


def test_s4_forward_shapes():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(0))
    arch = max_subnet(SMALL).to_device(SMALL)

    y, _ = net.apply(p, s, _x(2, 12, 12), arch, pixel_d=1, training=True)
    assert y.shape == (2, 24, 24, 3)
    y, _ = net.apply(p, s, _x(2, 12, 12), arch, pixel_d=2, training=True)
    assert y.shape == (2, 48, 48, 3)


def test_s4_depth_gating_changes_output():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(1))
    x = _x(1, 8, 8)
    a_full = uniform_subnet(SMALL, 5, 3, 2, 1).to_device(SMALL)
    a_short = uniform_subnet(SMALL, 5, 3, 1, 1).to_device(SMALL)
    y_full, _ = net.apply(p, s, x, a_full, pixel_d=1)
    y_short, _ = net.apply(p, s, x, a_short, pixel_d=1)
    assert np.abs(np.asarray(y_full) - np.asarray(y_short)).max() > 1e-6


def test_s4_depth_gating_matches_fewer_blocks_model():
    """depth=d must equal literally running only the first d blocks: compare
    the gated forward against a hand-truncated forward."""
    space = SearchSpace(ks_list=[3], expand_list=[2], depth_list=[1, 2],
                        pixel_d_list=[1], n_stages=1, width=8)
    net = OFAMobileNetS4(space)
    p, s = net.init(jax.random.PRNGKey(2))
    x = _x(1, 8, 8)

    a1 = uniform_subnet(space, 3, 2, 1, 1).to_device(space)
    y1, s1 = net.apply(p, s, x, a1, pixel_d=1, training=True)

    # manual: drop block 1's params entirely; reference semantics say the
    # block simply isn't executed, so output must be identical.
    from ofa_sr_tpu.models.layers import conv_layer_apply, mbconv_apply
    h, _ = conv_layer_apply(p["dec_first_conv_block"], s["dec_first_conv_block"],
                            x, act=None, training=True)
    skip = h
    out0, _ = mbconv_apply(p["blocks"][0], s["blocks"][0], h, space,
                           jnp.asarray(0), jnp.asarray(16), training=True)
    h = out0 + h
    for i in range(2):
        h, _ = conv_layer_apply(p["dec_final_conv_blocks"][i],
                                s["dec_final_conv_blocks"][i], h,
                                act=None, training=True)
        if i == 0:
            h = h + skip
    h, _ = conv_layer_apply(p["shuffle_blocks"][0], s["shuffle_blocks"][0], h,
                            act=None, shuffle="shuffle", training=True)
    h, _ = conv_layer_apply(p["dec_final_output_conv_block"],
                            s["dec_final_output_conv_block"], h,
                            act=None, training=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(h), rtol=1e-5, atol=1e-5)

    # gated-out block's BN state must be untouched
    m0 = np.asarray(s["blocks"][1]["depth_conv"]["bn"]["mean"])
    m1 = np.asarray(s1["blocks"][1]["depth_conv"]["bn"]["mean"])
    np.testing.assert_array_equal(m0, m1)
    # active block's BN state must have moved
    a0 = np.asarray(s["blocks"][0]["depth_conv"]["bn"]["mean"])
    a1_ = np.asarray(s1["blocks"][0]["depth_conv"]["bn"]["mean"])
    assert np.abs(a0 - a1_).max() > 0


def test_x4_autoencoder_shapes():
    net = OFAMobileNetX4(SMALL)
    p, s = net.init(jax.random.PRNGKey(3))
    arch = max_subnet(SMALL, n_trunks=2).to_device(SMALL)
    x = _x(1, 16, 16)
    for pd in (1, 2):
        lr, _ = net.encode(p, s, x, arch, pixel_d=pd)
        assert lr.shape == (1, 16 // 2 ** pd, 16 // 2 ** pd, 3)
        y, _ = net.apply(p, s, x, arch, pixel_d=pd, mode="autoencoder")
        assert y.shape == x.shape


def test_x4_sr_mode_decoder_only():
    net = OFAMobileNetX4(SMALL)
    p, s = net.init(jax.random.PRNGKey(4))
    arch = max_subnet(SMALL, n_trunks=2).to_device(SMALL)
    y, _ = net.apply(p, s, _x(1, 8, 8), arch, pixel_d=2, mode="sr")
    assert y.shape == (1, 32, 32, 3)


def test_sample_subnet_deterministic():
    space = SearchSpace()
    seed = subnet_seed(epoch=3, n_batch=50, batch_idx=7, subnet_idx=1)
    a = sample_subnet(space, seed=seed)
    b = sample_subnet(space, seed=seed)
    assert a == b
    c = sample_subnet(space, seed=seed + 1)
    assert a != c  # overwhelmingly likely


def test_subnet_seed_contract():
    # int('%d%.3d%.3d' % (epoch*nBatch+i, sub, 0))
    assert subnet_seed(0, 100, 5, 2) == int("5002000")
    assert subnet_seed(2, 100, 5, 0) == int("205000000")


def test_sample_respects_constraints():
    space = SearchSpace()
    cfg = sample_subnet(space, seed=0, depth_candidates=[2],
                        pixel_d_candidates=[1], ks_candidates=[7])
    assert all(k == 7 for k in cfg.ks)
    assert all(d == 2 for d in cfg.d)
    assert cfg.pixel_d == 1


def test_jit_no_recompile_across_subnets():
    """One compiled program must serve every (ks, e, d) subnet."""
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(5))
    x = _x(1, 8, 8)

    calls = {"n": 0}

    def fwd(params, state, xx, arch):
        calls["n"] += 1
        return net.apply(params, state, xx, arch, pixel_d=1, training=True)[0]

    jfwd = jax.jit(fwd)
    for seed in range(4):
        cfg = sample_subnet(SMALL, seed=seed, pixel_d_candidates=[1], n_trunks=1)
        jfwd(p, s, x, cfg.to_device(SMALL)).block_until_ready()
    assert calls["n"] == 1, "retraced %d times" % calls["n"]


def test_zero_last_gamma():
    import jax
    import numpy as np

    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
    from ofa_sr_tpu.models.ofa_cls import OFAMobileNetV3
    from ofa_sr_tpu.models.reorganize import zero_last_gamma

    space = SearchSpace(ks_list=[3, 5], expand_list=[3], depth_list=[2],
                        pixel_d_list=[1], n_stages=2, width=16)
    net = OFAMobileNetS4(space)
    p, _ = net.init(jax.random.PRNGKey(0))
    p2 = zero_last_gamma(net, p)
    for bp in p2["blocks"]:
        assert float(np.abs(bp["point_linear"]["bn"]["scale"]).max()) == 0.0
    # original untouched
    assert float(np.abs(p["blocks"][0]["point_linear"]["bn"]["scale"]).max()) == 1.0

    cls = OFAMobileNetV3(n_classes=10)
    cp, _ = cls.init(jax.random.PRNGKey(1))
    cp2 = zero_last_gamma(cls, cp)
    # first block of each stage (stride/width change): untouched
    assert float(np.abs(cp2["blocks"][0]["point_linear"]["bn"]["scale"]).max()) == 1.0
    # later blocks in a stage: zeroed
    assert float(np.abs(cp2["blocks"][1]["point_linear"]["bn"]["scale"]).max()) == 0.0


def test_icnr_shuffle_head_init():
    """icnr=True: at init the (conv -> PixelShuffle) head is checkerboard-
    free — the shuffled output equals a nearest-neighbor upsample of the
    r^2-x-narrower conv (arXiv:1707.02937)."""
    from ofa_sr_tpu.models import OFAMobileNetS4, OFAMobileNetX4, SearchSpace
    from ofa_sr_tpu.ops.conv import conv2d
    from ofa_sr_tpu.ops.pixelshuffle import pixel_shuffle

    space = SearchSpace(ks_list=[3], expand_list=[3], depth_list=[1],
                        pixel_d_list=[1], n_stages=1, width=8)
    for cls in (OFAMobileNetS4, OFAMobileNetX4):
        net = cls(space, icnr=True)
        p, _ = net.init(jax.random.PRNGKey(0))
        w = p["shuffle_blocks"][0]["conv"]["w"]
        # the 4 sub-pixel filters of each output channel are identical
        w4 = np.asarray(w).reshape(w.shape[0], w.shape[1], w.shape[2], -1, 4)
        for j in range(1, 4):
            np.testing.assert_array_equal(w4[..., j], w4[..., 0])
        # shuffled conv output == nearest-neighbor upsample of the small conv
        x = jnp.asarray(np.random.RandomState(0).rand(1, 6, 6, w.shape[2]),
                        jnp.float32)
        y = pixel_shuffle(conv2d(x, w), 2)
        y_small = np.asarray(conv2d(x, jnp.asarray(w4[..., 0])))
        nn_up = np.repeat(np.repeat(y_small, 2, axis=1), 2, axis=2)
        np.testing.assert_allclose(np.asarray(y), nn_up, rtol=1e-6, atol=1e-7)
        # default stays reference he_fout (distinct sub-pixel filters)
        p2, _ = cls(space).init(jax.random.PRNGKey(0))
        w2 = np.asarray(p2["shuffle_blocks"][0]["conv"]["w"])
        assert np.abs(w2.reshape(w4.shape)[..., 1]
                      - w2.reshape(w4.shape)[..., 0]).max() > 0
