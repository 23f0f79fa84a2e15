"""Materialize a static subnet from the supernet weight banks.

This is the deployment path (the reference's `get_active_subnet`,
dynamic_layers.py:112-154 — note the network-level version on S4/X4 is a
broken MBV3 leftover, ofa_mbs4.py:373-458; this is the working rebuild):
slice the active kernel (through the transform chain), the active middle
channels, and the BN prefix into a concrete small pytree, then jit the true
small network per config. This path — not masked execution — is what serves
a chosen architecture at speed-of-light (SURVEY.md §7.0).

`fold_bn=True` folds eval-mode BatchNorm into the preceding conv (exact in
eval mode): w' = w * gamma/sqrt(var+eps), b' = beta - mean*gamma/sqrt(var+eps)
— one fewer elementwise pass per layer at inference.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.activations import apply_act
from ..ops.conv import conv2d, depthwise_conv2d
from ..ops.elastic import transform_kernel_chain
from ..ops.norm import batch_norm
from ..ops.pixelshuffle import pixel_shuffle, pixel_unshuffle
from .arch import SearchSpace, SubnetConfig


def _slice_bn(bn_p, bn_s, n):
    return ({k: v[:n] for k, v in bn_p.items()},
            {k: v[:n] for k, v in bn_s.items()})


def _fold_bn_into_conv(w, bn_p, bn_s, eps):
    """Return (w', bias') folding eval-mode BN into an HWIO conv."""
    inv = 1.0 / np.sqrt(np.asarray(bn_s["var"]) + eps)
    g = np.asarray(bn_p["scale"]) * inv
    w2 = jnp.asarray(np.asarray(w) * g[None, None, None, :])
    b = jnp.asarray(np.asarray(bn_p["bias"]) - np.asarray(bn_s["mean"]) * g)
    return w2, b


def _materialize_conv_layer(p, s, *, fold_bn, eps):
    if fold_bn:
        w, b = _fold_bn_into_conv(p["conv"]["w"], p["bn"], s["bn"], eps)
        return {"w": w, "b": b}
    return {"w": p["conv"]["w"], "bn_p": p["bn"], "bn_s": s["bn"]}


def _materialize_mbconv(p, s, space: SearchSpace, ks: int, expand, *,
                        fold_bn, eps):
    """Slice one DynamicMBConvLayer into static weights (the semantics of
    dynamic_layers.py:112-154: transform-chain kernel + prefix slices +
    copy_bn)."""
    mid = space.mid_channels(expand)
    out = {"ks": ks, "mid": mid}

    w_ib = p["inverted_bottleneck"]["conv"]["w"][:, :, :, :mid]
    bn_p, bn_s = _slice_bn(p["inverted_bottleneck"]["bn"],
                           s["inverted_bottleneck"]["bn"], mid)
    if fold_bn:
        w_ib, b_ib = _fold_bn_into_conv(w_ib, bn_p, bn_s, eps)
        out["ib"] = {"w": w_ib, "b": b_ib}
    else:
        out["ib"] = {"w": w_ib, "bn_p": bn_p, "bn_s": bn_s}

    w_dw_full = transform_kernel_chain(
        p["depth_conv"]["conv"]["w"], p["depth_conv"].get("kt"),
        space.ks_list, ks, use_transform="kt" in p["depth_conv"])
    w_dw = w_dw_full[:, :, :, :mid]
    bn_p, bn_s = _slice_bn(p["depth_conv"]["bn"], s["depth_conv"]["bn"], mid)
    if fold_bn:
        w_dw, b_dw = _fold_bn_into_conv(w_dw, bn_p, bn_s, eps)
        out["dw"] = {"w": w_dw, "b": b_dw}
    else:
        out["dw"] = {"w": w_dw, "bn_p": bn_p, "bn_s": bn_s}

    w_pl = p["point_linear"]["conv"]["w"][:, :, :mid, :]
    if fold_bn:
        w_pl, b_pl = _fold_bn_into_conv(
            w_pl, p["point_linear"]["bn"], s["point_linear"]["bn"], eps)
        out["pl"] = {"w": w_pl, "b": b_pl}
    else:
        out["pl"] = {"w": w_pl, "bn_p": p["point_linear"]["bn"],
                     "bn_s": s["point_linear"]["bn"]}
    return out


def _fold_conv_through_shuffle(w, b, r=2):
    """Rewrite `conv_k(pixel_shuffle(z, r))` as
    `pixel_shuffle(conv_k'(z, W'), r)` — exact for odd k, SAME padding.

    Derivation (r=2): output HR row 2I+p (p in [0,r)) reads HR row
    2I+p+u-pad for tap u; writing it as 2(I+di)+a gives a unique LR tap
    di=(p+u-pad)//r and subpixel row a=(p+u-pad)%r per (p,u). HR SAME
    pad k//2 maps onto LR SAME pad k'//2 zeros exactly (HR size is even).
    Channel order follows ops/pixelshuffle.pixel_shuffle: LR channel
    c*r^2 + y*r + x holds HR channel c's subpixel (y, x) — so
    W'[di,dj, ci*r^2+a*r+bb, co*r^2+p*r+q] = W[u,v,ci,co] and
    b'[co*r^2+p*r+q] = b[co]. For k=5: k'=3, cin*4, cout*4 — same math,
    ~4x the MXU lane utilization for 1.44x the MACs (DESIGN.md §8)."""
    k, k2, cin, cout = w.shape
    assert k == k2 and k % 2 == 1, "odd square kernels only"
    pad = k // 2
    taps = [(p + u - pad) // r for p in range(r) for u in range(k)]
    di_min, di_max = min(taps), max(taps)
    kf = di_max - di_min + 1
    assert kf // 2 == -di_min, "folded kernel must stay SAME-paddable"
    wn = np.asarray(w)
    wf = np.zeros((kf, kf, cin * r * r, cout * r * r), wn.dtype)
    for p in range(r):
        for q in range(r):
            for u in range(k):
                for v in range(k):
                    t, s_ = p + u - pad, q + v - pad
                    ti, a = t // r - di_min, t % r
                    si, bb = s_ // r - di_min, s_ % r
                    wf[ti, si, a * r + bb::r * r, p * r + q::r * r] = \
                        wn[u, v]
    bf = jnp.repeat(jnp.asarray(b), r * r)
    return jnp.asarray(wf), bf


class StaticSubnet:
    """A concrete (non-elastic) SR net sliced out of an OFAMobileNetS4 / the
    decoder (or encoder+decoder) of an OFAMobileNetX4."""

    def __init__(self, net, params, state, cfg: SubnetConfig, *,
                 fold_bn: bool = True, mode: str = "sr",
                 use_pallas: bool = False, fold_tail: bool = True):
        self.space = net.space
        self.cfg = cfg
        self.pixel_d = cfg.pixel_d
        self.fold_bn = fold_bn
        self.mode = mode
        # fused conv+pixelshuffle tail (ops/pallas/shuffle_tail.py); the
        # dispatcher itself falls back to XLA off-TPU / when not opted in
        self.use_pallas = use_pallas
        self.eps = net.bn_cfg["eps"]
        self.is_x4 = hasattr(net, "decode")

        sp = net.space
        fb = dict(fold_bn=fold_bn, eps=self.eps)

        def trunk(blocks_p, blocks_s, base_b, base_s):
            stages = []
            for stage in range(sp.n_stages):
                d = cfg.d[base_s + stage]
                blocks = []
                for i in range(d):
                    bi = stage * sp.max_depth + i
                    blocks.append(_materialize_mbconv(
                        blocks_p[bi], blocks_s[bi], sp,
                        cfg.ks[base_b + stage * sp.max_depth + i],
                        cfg.e[base_b + stage * sp.max_depth + i], **fb))
                stages.append(blocks)
            return stages

        m = {}
        if self.is_x4 and mode == "autoencoder":
            m["enc_unshuffle"] = [
                _materialize_conv_layer(params["enc_unshuffle_blocks"][i],
                                        state["enc_unshuffle_blocks"][i], **fb)
                for i in range(self.pixel_d)]
            m["enc_stages"] = trunk(params["enc_blocks"], state["enc_blocks"], 0, 0)
            m["enc_final"] = [
                _materialize_conv_layer(params["enc_final_conv_blocks"][i],
                                        state["enc_final_conv_blocks"][i], **fb)
                for i in range(3)]

        dec_blocks_key = "dec_blocks" if self.is_x4 else "blocks"
        dec_trunk_base_b = self.space.blocks_per_trunk if self.is_x4 else 0
        dec_trunk_base_s = self.space.n_stages if self.is_x4 else 0
        m["dec_first"] = _materialize_conv_layer(
            params["dec_first_conv_block"], state["dec_first_conv_block"], **fb)
        m["dec_stages"] = trunk(params[dec_blocks_key], state[dec_blocks_key],
                                dec_trunk_base_b, dec_trunk_base_s)
        m["dec_final"] = [
            _materialize_conv_layer(params["dec_final_conv_blocks"][i],
                                    state["dec_final_conv_blocks"][i], **fb)
            for i in range(2)]
        m["shuffle"] = [
            _materialize_conv_layer(params["shuffle_blocks"][i],
                                    state["shuffle_blocks"][i], **fb)
            for i in range(self.pixel_d)]
        m["dec_out"] = _materialize_conv_layer(
            params["dec_final_output_conv_block"],
            state["dec_final_output_conv_block"], **fb)
        # fold_tail (DEFAULT ON): run the output conv BEFORE the last
        # pixel_shuffle. The deployment trace (exp/perf_deploy_trace.py,
        # DESIGN.md §8) put the 5x5 64->3 conv at full HR resolution at 29%
        # of the 720p frame at 2.3 TF/s — cout=3 uses 3 of the MXU's 128
        # lanes. Folding it through the shuffle to a 3x3 256->12 conv at
        # half resolution is mathematically exact (each HR tap u maps to
        # exactly one LR tap (u+p-2)//2 and phase (u+p-2)%2; HR SAME pad 2
        # == LR SAME pad 1; channel order matches pixel_shuffle's
        # c*r^2+y*r+x) and 4x the lane utilization for 1.44x the MACs.
        # Measured: 720p bf16 frame 13.88 -> 7.17 ms device (1.94x) — the
        # big conv 3.99 -> 0.73 ms AND the HR-layout formatting around it
        # 3.28 -> 0.57. Pinned exactly by
        # tests/test_materialize.py::test_fold_tail_exact.
        self.fold_tail = (fold_tail and fold_bn and self.pixel_d >= 1
                          and not use_pallas)
        if self.fold_tail:
            m["dec_out_folded"] = _fold_conv_through_shuffle(
                m["dec_out"]["w"], m["dec_out"]["b"])
            if "enc_unshuffle" in m:
                # encoder side of the same identity: unshuffle(conv(x, w))
                # == conv(unshuffle(x), W') (let z = unshuffle(x); the
                # decoder fold gives conv(shuffle(z), w) =
                # shuffle(conv(z, W')); unshuffle both sides). Moves the
                # full-HR-resolution 3->16 / 64->16 encode convs (16 of
                # 128 MXU lanes) to quarter resolution at 4x the lanes.
                m["enc_unshuffle_folded"] = [
                    _fold_conv_through_shuffle(lp["w"], lp["b"])
                    for lp in m["enc_unshuffle"]]
        self.params = m

    # -- forward ---------------------------------------------------------------

    @staticmethod
    def _row_mask(x, row_valid, f):
        """Re-zero rows outside [lo*f, hi*f) — `row_valid` is (lo, hi) traced
        ints at the *input* resolution, `f` the current upscale factor.

        This is the bucketed-eval equivalence (ops/elastic.spatial_valid_mask)
        restricted to rows: zeroing the out-of-frame region before every
        spatial conv makes the valid rows window-exact vs the SAME-padded
        execution of the unpadded frame (bitwise up to XLA reduction
        scheduling; see spatial_valid_mask). Used by parallel/spatial.py where a
        device's slab carries a zero halo at a true frame edge."""
        if row_valid is None:
            return x
        lo, hi = row_valid
        rows = jnp.arange(x.shape[1])
        m = ((rows >= lo * f) & (rows < hi * f)).astype(x.dtype)
        return x * m[None, :, None, None]

    def _conv_layer(self, lp, x, *, act=None, shuffle=None, row_valid=None,
                    f=1):
        x = self._row_mask(x, row_valid, f)
        y = conv2d(x, lp["w"])
        if self.fold_bn:
            y = y + lp["b"]
        else:
            y, _ = batch_norm(y, lp["bn_p"], lp["bn_s"], training=False,
                              eps=self.eps)
        if shuffle == "shuffle":
            y = pixel_shuffle(y, 2)
        elif shuffle == "unshuffle":
            y = pixel_unshuffle(y, 2)
        return apply_act(y, act)

    def _mbconv(self, bp, x, row_valid=None, f=1):
        # NB keep the 1x1s as convs, not reshape-matmuls. The matmul form
        # is 1.9x faster in isolation at these shapes (45 vs 24 TF/s,
        # slope-timed micro), but the 720p frame REGRESSED 7.17 -> 9.90 ms
        # when tried (2026-08-18): what the trace bins as a "slow 1x1 conv"
        # is really XLA's fused depthwise+project loop, and a dot severs
        # that fusion — the depthwise then stands alone at its 5.5 TF/s VPU
        # bound plus ~1.8 ms of layout moves between matmul and conv forms.
        # Same lesson as the Pallas BN kernel (DESIGN.md §6).
        y = conv2d(x, bp["ib"]["w"])
        y = self._post(bp["ib"], y, act="relu6")
        y = self._row_mask(y, row_valid, f)  # only the depthwise is spatial
        y = depthwise_conv2d(y, bp["dw"]["w"])
        y = self._post(bp["dw"], y, act="relu6")
        y = conv2d(y, bp["pl"]["w"])
        y = self._post(bp["pl"], y, act=None)
        return y

    def _post(self, lp, y, act):
        if self.fold_bn:
            y = y + lp["b"]
        else:
            y, _ = batch_norm(y, lp["bn_p"], lp["bn_s"], training=False,
                              eps=self.eps)
        return apply_act(y, act)

    def __call__(self, x, row_valid=None):
        """params are baked in; x is the LR input ('sr') or HR
        ('autoencoder'). Jit `subnet(x)` directly — each materialized config
        is its own small compiled program.

        `row_valid` (optional): (lo, hi) traced ints marking the valid input
        rows; rows outside are re-zeroed before every spatial conv so the
        valid region matches the unpadded execution exactly (used by
        parallel/spatial.py for mesh-sharded frames and for row-padded
        shapes). In 'autoencoder' mode lo/hi are HR-input rows and MUST be
        multiples of 2**pixel_d (the ModCrop contract) so the pixel-unshuffle
        grid of the valid region matches the unpadded frame's."""
        m = self.params
        if self.is_x4 and self.mode == "autoencoder":
            rv = None
            if row_valid is not None:
                # internal row_valid bookkeeping is in LR (bottleneck) row
                # units everywhere; the unshuffle-alignment contract makes
                # this division exact
                sc = 2 ** self.pixel_d
                rv = (row_valid[0] // sc, row_valid[1] // sc)
            f = 2 ** self.pixel_d
            for ei, lp in enumerate(m["enc_unshuffle"]):
                if self.fold_tail:
                    # unshuffle first (pure layout), conv with the folded
                    # weights at the lower resolution — exact, see __init__
                    wf, bf = m["enc_unshuffle_folded"][ei]
                    x = self._row_mask(x, rv, f)
                    x = conv2d(pixel_unshuffle(x, 2), wf) + bf
                else:
                    x = self._conv_layer(lp, x, shuffle="unshuffle",
                                         row_valid=rv, f=f)
                f //= 2
            skip = x
            for stage in m["enc_stages"]:
                for bp in stage:
                    x = self._mbconv(bp, x, row_valid=rv) + x
            for i, lp in enumerate(m["enc_final"]):
                x = self._conv_layer(lp, x, row_valid=rv)
                if i == 0:
                    x = x + skip
            row_valid = rv  # decoder continues in LR units
        rv = row_valid
        x = self._conv_layer(m["dec_first"], x, row_valid=rv)
        skip = x
        for stage in m["dec_stages"]:
            for bp in stage:
                x = self._mbconv(bp, x, row_valid=rv) + x
        for i, lp in enumerate(m["dec_final"]):
            x = self._conv_layer(lp, x, row_valid=rv)
            if i == 0:
                x = x + skip
        f = 1
        for li, lp in enumerate(m["shuffle"]):
            last = li == len(m["shuffle"]) - 1
            if self.fold_tail and last:
                # keep the last shuffle conv's output at LR (256 ch): the
                # folded output conv consumes the pre-shuffle layout
                x = self._conv_layer(lp, x, row_valid=rv, f=f)
                wf, bf = m["dec_out_folded"]
                x = self._row_mask(x, rv, f)
                x = conv2d(x, wf) + bf
                return pixel_shuffle(x, 2)
            if self.use_pallas and self.fold_bn:
                from ..ops.pallas.shuffle_tail import fused_shuffle_tail
                x = fused_shuffle_tail(self._row_mask(x, rv, f), lp["w"],
                                       lp["b"])
            else:
                x = self._conv_layer(lp, x, shuffle="shuffle", row_valid=rv,
                                     f=f)
            f *= 2
        return self._conv_layer(m["dec_out"], x, row_valid=rv, f=f)


def get_active_subnet(net, params, state, cfg: SubnetConfig, *,
                      fold_bn: bool = True, mode: str = "sr",
                      use_pallas: bool = False,
                      fold_tail: bool = True) -> StaticSubnet:
    return StaticSubnet(net, params, state, cfg, fold_bn=fold_bn, mode=mode,
                        use_pallas=use_pallas, fold_tail=fold_tail)
