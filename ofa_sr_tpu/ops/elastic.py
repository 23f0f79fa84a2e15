"""Elastic-dimension primitives: kernel-transform chains and channel masks.

This is the TPU-native replacement for the reference's per-forward weight
slicing (DynamicSeparableConv2d.get_active_filter, dynamic_op.py:46-71, and
DynamicPointConv2d.forward, dynamic_op.py:104-112). Instead of materializing
a differently-shaped weight per subnet (which would force an XLA recompile
per sampled architecture), every weight lives at max shape and the subnet
choice becomes data:

- *kernel size*: all candidate kernels (7, transformed-5, transformed-3) are
  computed, zero-embedded at the center of the max-size window, and selected
  with a one-hot contraction over a traced index. A zero-padded k-kernel
  convolved with SAME padding (k_max//2) is numerically identical to the
  sliced k-kernel with padding k//2, so masked execution == reference
  slicing.
- *channel width*: a (C_max,) 0/1 mask built from a traced active-width
  scalar. Masking the activations entering/leaving a conv is numerically and
  gradient-wise identical to slicing the weight, because zeroed inputs
  contribute nothing forward and receive nothing backward.

Kernel-transform semantics (KERNEL_TRANSFORM_MODE == 1, dynamic_op.py:32-71):
chained learned (k^2 x k^2) matrices, applied largest->smallest:
  K5 = reshape(M_7to5 @ vec(center5(K7)))   [torch F.linear: v @ M.T]
  K3 = reshape(M_5to3 @ vec(center3(K5)))
Matrices are identity-initialized (dynamic_op.py:40).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.common import sub_filter_start_end


def transform_matrices_init(ks_list, dtype=jnp.float32):
    """Identity-initialized transform matrices, keyed '%dto%d' like the
    reference parameter names (dynamic_op.py:36-42)."""
    ks_set = sorted(set(ks_list))
    mats = {}
    for i in range(len(ks_set) - 1):
        small, larger = ks_set[i], ks_set[i + 1]
        mats["%dto%d" % (larger, small)] = jnp.eye(small * small, dtype=dtype)
    return mats


def _center_slice(w, target_ks):
    """Center target_ks x target_ks window of an HWIO kernel."""
    k = w.shape[0]
    start, end = sub_filter_start_end(k, target_ks)
    return w[start:end, start:end]


def _apply_transform(w, mat):
    """Apply a (k^2 x k^2) transform to an HWIO depthwise kernel [k,k,1,C].

    Torch flattens [C,1,k,k] spatially row-major (ky, kx) and computes
    v @ M.T (F.linear). HWIO's leading two axes are already (ky, kx), so we
    move channels first, flatten, matmul, and restore layout.
    """
    k, _, i, c = w.shape
    v = w.transpose(3, 2, 0, 1).reshape(c * i, k * k)  # (C, k^2), row-major spatial
    # Tiny (<= 25x25) matmul on the effective weights: keep it in full f32 so
    # the effective kernel is bit-comparable with the reference regardless of
    # the MXU's default bf16 accumulation.
    v = jnp.matmul(v, mat.T, precision=jax.lax.Precision.HIGHEST)
    return v.reshape(c, i, k, k).transpose(2, 3, 1, 0)


def transform_kernel_chain(weight, matrices, ks_list, target_ks, use_transform=True):
    """The reference get_active_filter (dynamic_op.py:46-71): produce the
    effective target_ks kernel from the max-size bank `weight` [K,K,1,C]."""
    ks_set = sorted(set(ks_list))
    max_ks = max(ks_set)
    if target_ks == max_ks:
        return weight
    if not use_transform:
        return _center_slice(weight, target_ks)
    w = weight
    for i in range(len(ks_set) - 1, 0, -1):
        src_ks = ks_set[i]
        if src_ks <= target_ks:
            break
        tgt_ks = ks_set[i - 1]
        w = _apply_transform(_center_slice(w, tgt_ks), matrices["%dto%d" % (src_ks, tgt_ks)])
    return w


def embed_center(w, max_ks):
    """Zero-embed a k x k HWIO kernel at the center of a max_ks window."""
    k = w.shape[0]
    if k == max_ks:
        return w
    start, _ = sub_filter_start_end(max_ks, k)
    pad = ((start, max_ks - k - start), (start, max_ks - k - start), (0, 0), (0, 0))
    return jnp.pad(w, pad)


def kernel_candidates(weight, matrices, ks_list, use_transform=True):
    """All candidate effective kernels, zero-embedded at max size and stacked
    [n_ks, K, K, 1, C], ordered by ascending kernel size (sorted(set(ks)))."""
    ks_set = sorted(set(ks_list))
    max_ks = max(ks_set)
    cands = []
    for ks in ks_set:
        eff = transform_kernel_chain(weight, matrices, ks_list, ks, use_transform)
        # under mixed precision the transform runs in f32 (the matrices stay
        # f32 — train_step.cast_params_for_compute); bring the effective
        # kernel back to the bank dtype so the conv sees uniform dtypes
        cands.append(embed_center(eff, max_ks).astype(weight.dtype))
    return jnp.stack(cands, axis=0)


def select_kernel(candidates, ks_idx):
    """One-hot select over the stacked candidates with a traced index.

    Exact (the one-hot is 0/1) and differentiable: gradients flow only into
    the selected candidate's transform chain, matching the reference where
    only the active kernel participates in the graph.
    """
    n = candidates.shape[0]
    onehot = jnp.asarray(ks_idx == jnp.arange(n), candidates.dtype)
    return jnp.tensordot(onehot, candidates, axes=1)


def channel_mask(active_width, max_width, dtype=jnp.float32):
    """(max_width,) 0/1 mask: 1 for channels < active_width (a traced int).

    Replaces weight[:active_width] prefix slicing
    (dynamic_op.py:104-112,133-134,163-167)."""
    return (jnp.arange(max_width) < active_width).astype(dtype)


def spatial_valid_mask(valid_h, valid_w, h, w, dtype=jnp.float32):
    """(1, h, w, 1) 0/1 mask: 1 inside the valid top-left (valid_h, valid_w)
    region (traced ints), 0 in the padding.

    Shape-bucketed evaluation (SURVEY.md §5.7): frames are zero-padded up to
    a bucket shape so one compiled program serves many frame sizes. Re-zeroing
    the pad region before every *spatial* conv makes the valid-region outputs
    window-exact vs the unpadded SAME-padded execution: every valid output
    pixel is the same dot product over the same operand window — the conv at
    the true frame border sees exactly the zeros it would have padded itself.
    Equality is bitwise when XLA compiles the same reduction schedule for
    both shapes; otherwise within summation-order ULPs amplified through
    network depth (<= 2.9e-6 abs measured end-to-end); tests hold it to a
    tight bound."""
    mh = (jnp.arange(h) < valid_h).astype(dtype)
    mw = (jnp.arange(w) < valid_w).astype(dtype)
    return (mh[:, None] * mw[None, :])[None, :, :, None]
