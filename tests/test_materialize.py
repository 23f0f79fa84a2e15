"""Materialized static subnet == masked supernet (eval mode), the deployment
parity the reference's broken get_active_subnet never had."""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.models import OFAMobileNetS4, OFAMobileNetX4, SearchSpace, sample_subnet
from ofa_sr_tpu.models.materialize import get_active_subnet

SMALL = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=2, width=8)


def _x(b, h, w, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(b, h, w, 3).astype(np.float32))


def test_s4_materialized_matches_masked_eval():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(0))
    for seed in range(3):
        cfg = sample_subnet(SMALL, seed=seed)
        x = _x(2, 12, 12, seed)
        y_super, _ = net.apply(p, s, x, cfg.to_device(SMALL),
                               pixel_d=cfg.pixel_d, training=False)
        for fold in (True, False):
            sub = get_active_subnet(net, p, s, cfg, fold_bn=fold)
            y_sub = sub(x)
            np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_super),
                                       rtol=2e-4, atol=2e-5)


def test_x4_materialized_autoencoder_matches():
    net = OFAMobileNetX4(SMALL)
    p, s = net.init(jax.random.PRNGKey(1))
    cfg = sample_subnet(SMALL, seed=7, n_trunks=2)
    x = _x(1, 16, 16, 1)
    y_super, _ = net.apply(p, s, x, cfg.to_device(SMALL),
                           pixel_d=cfg.pixel_d, mode="autoencoder",
                           training=False)
    sub = get_active_subnet(net, p, s, cfg, mode="autoencoder")
    np.testing.assert_allclose(np.asarray(sub(x)), np.asarray(y_super),
                               rtol=2e-4, atol=2e-5)


def test_x4_materialized_sr_mode_matches():
    net = OFAMobileNetX4(SMALL)
    p, s = net.init(jax.random.PRNGKey(2))
    cfg = sample_subnet(SMALL, seed=9, n_trunks=2)
    x = _x(1, 8, 8, 2)
    y_super, _ = net.apply(p, s, x, cfg.to_device(SMALL),
                           pixel_d=cfg.pixel_d, mode="sr", training=False)
    sub = get_active_subnet(net, p, s, cfg, mode="sr")
    np.testing.assert_allclose(np.asarray(sub(x)), np.asarray(y_super),
                               rtol=2e-4, atol=2e-5)


def test_materialized_is_jittable():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(3))
    cfg = sample_subnet(SMALL, seed=11)
    sub = get_active_subnet(net, p, s, cfg)
    y = jax.jit(sub)(_x(1, 8, 8))
    assert y.shape == (1, 8 * 2 ** cfg.pixel_d, 8 * 2 ** cfg.pixel_d, 3)


def test_export_roundtrip_matches_live_subnet(tmp_path):
    """AOT serving artifact (models/export.py): export -> serialize ->
    deserialize -> call is bit-identical to the live materialized subnet,
    and the artifact carries cpu+tpu lowerings."""
    import jax

    from ofa_sr_tpu.models.arch import uniform_subnet
    from ofa_sr_tpu.models.export import export_subnet, load_subnet

    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(0))
    cfg = uniform_subnet(SMALL, 5, 3, 2, 1)
    path = str(tmp_path / "subnet.stablehlo")
    blob = export_subnet(net, p, s, cfg, (24, 32), path=path)
    assert len(blob) > 1000

    from jax import export as jax_export
    assert set(jax_export.deserialize(blob).platforms) == {"cpu", "tpu"}

    fn = load_subnet(path)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 24, 32, 3), jnp.float32)
    y = fn(x)
    ref = jax.jit(get_active_subnet(net, p, s, cfg))(x)
    assert y.shape == (1, 48, 64, 3)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_fold_tail_exact():
    """fold_tail (output conv folded through the last pixel_shuffle,
    _fold_conv_through_shuffle) == the plain materialized subnet, for both
    pixel_d values and under row_valid masking. The fold is a pure weight
    rearrangement: identical arithmetic per output pixel up to conv
    reduction-order reassociation."""
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(3))
    for seed in range(4):
        cfg = sample_subnet(SMALL, seed=seed)
        x = _x(2, 12, 12, seed)
        plain = get_active_subnet(net, p, s, cfg, fold_tail=False)
        folded = get_active_subnet(net, p, s, cfg)
        assert folded.fold_tail, "fold must engage (fold_bn on, pixel_d>=1)"
        # atol 5e-6: the folded conv reduces 256-deep where the original
        # reduces 64-deep — pure reassociation (measured max 1.7e-6)
        np.testing.assert_allclose(np.asarray(folded(x)),
                                   np.asarray(plain(x)),
                                   rtol=1e-5, atol=5e-6)
    # row_valid path (the spatial/tiled deployment contract)
    cfg = sample_subnet(SMALL, seed=1)
    x = _x(1, 12, 12, 5)
    rv = (jnp.asarray(2), jnp.asarray(10))
    plain = get_active_subnet(net, p, s, cfg, fold_tail=False)
    folded = get_active_subnet(net, p, s, cfg)
    np.testing.assert_allclose(np.asarray(folded(x, row_valid=rv)),
                               np.asarray(plain(x, row_valid=rv)),
                               rtol=1e-5, atol=1e-6)


def test_fold_conv_through_shuffle_unit():
    """Direct identity: conv_k(pixel_shuffle(z)) == pixel_shuffle(conv(z, W'))
    for k in {1, 3, 5} on random data (exact up to float reassociation)."""
    from ofa_sr_tpu.models.materialize import _fold_conv_through_shuffle
    from ofa_sr_tpu.ops.conv import conv2d
    from ofa_sr_tpu.ops.pixelshuffle import pixel_shuffle
    rng = np.random.RandomState(0)
    for k in (1, 3, 5):
        z = jnp.asarray(rng.rand(2, 6, 7, 5 * 4).astype(np.float32))
        w = jnp.asarray(rng.rand(k, k, 5, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(3).astype(np.float32))
        ref = conv2d(pixel_shuffle(z, 2), w) + b
        wf, bf = _fold_conv_through_shuffle(w, b)
        out = pixel_shuffle(conv2d(z, wf) + bf, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_fold_tail_autoencoder_exact():
    """X4 autoencoder mode: the fold applies on BOTH ends — encoder convs
    folded through pixel_unshuffle and the output conv through the last
    pixel_shuffle — and must match the unfolded subnet, incl. row_valid."""
    net = OFAMobileNetX4(SMALL)
    p, s = net.init(jax.random.PRNGKey(4))
    cfg = sample_subnet(SMALL, seed=7, n_trunks=2)
    x = _x(1, 16, 16, 4)
    plain = get_active_subnet(net, p, s, cfg, mode="autoencoder",
                              fold_tail=False)
    folded = get_active_subnet(net, p, s, cfg, mode="autoencoder")
    assert folded.fold_tail
    # atol 2e-5: two folds' deeper reductions reassociate through the full
    # encoder+decoder (measured max 6.5e-6); same bound as the
    # materialized-vs-supernet tests above
    np.testing.assert_allclose(np.asarray(folded(x)), np.asarray(plain(x)),
                               rtol=1e-4, atol=2e-5)
    sc = 2 ** cfg.pixel_d
    rv = (jnp.asarray(0), jnp.asarray(16 - sc))  # ModCrop-aligned rows
    np.testing.assert_allclose(np.asarray(folded(x, row_valid=rv)),
                               np.asarray(plain(x, row_valid=rv)),
                               rtol=1e-4, atol=2e-5)


def test_fold_conv_through_unshuffle_unit():
    """Encoder direction: unshuffle(conv_k(x)) == conv(unshuffle(x), W')
    with the SAME weight transform (_fold_conv_through_shuffle)."""
    from ofa_sr_tpu.models.materialize import _fold_conv_through_shuffle
    from ofa_sr_tpu.ops.conv import conv2d
    from ofa_sr_tpu.ops.pixelshuffle import pixel_unshuffle
    rng = np.random.RandomState(1)
    for k in (1, 3, 5):
        x = jnp.asarray(rng.rand(2, 12, 14, 5).astype(np.float32))
        w = jnp.asarray(rng.rand(k, k, 5, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(3).astype(np.float32))
        ref = pixel_unshuffle(conv2d(x, w) + b, 2)
        wf, bf = _fold_conv_through_shuffle(w, b)
        out = conv2d(pixel_unshuffle(x, 2), wf) + bf
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
