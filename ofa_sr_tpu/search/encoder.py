"""Architecture one-hot encodings for the accuracy predictor.

Reference spec2feats (tutorial/accuracy_predictor.py:59-84): 20 blocks x
(ks one-hot over {3,5,7} + e one-hot over {3,4,6}) + resolution one-hot —
128 features. Generalized here to any SearchSpace; the SR variant appends
depth one-hots per stage and a pixel_d one-hot (the fourth elastic
dimension the reference never got to encode).
"""

from __future__ import annotations

import numpy as np

from ..models.arch import SearchSpace, SubnetConfig


def _onehot(value, choices):
    v = np.zeros(len(choices), np.float32)
    v[list(choices).index(value)] = 1.0
    return v


def encode_cls_arch(ks, e, d, image_size, *, ks_list=(3, 5, 7),
                    expand_list=(3, 4, 6), depth_list=(2, 3, 4),
                    n_stages=5, max_depth=4,
                    image_size_list=(160, 176, 192, 208, 224)):
    """Blockwise ks/e one-hots with depth masking (blocks beyond a stage's
    depth encode as zeros — the reference zeroes skipped blocks) +
    resolution one-hot."""
    feats = []
    for si in range(n_stages):
        for bi in range(max_depth):
            idx = si * max_depth + bi
            if bi < d[si]:
                feats.append(_onehot(ks[idx], ks_list))
                feats.append(_onehot(e[idx], expand_list))
            else:
                feats.append(np.zeros(len(ks_list), np.float32))
                feats.append(np.zeros(len(expand_list), np.float32))
    feats.append(_onehot(image_size, image_size_list))
    return np.concatenate(feats)


def encode_sr_subnet(cfg: SubnetConfig, space: SearchSpace, n_trunks=1):
    feats = []
    md = space.max_depth
    for si in range(space.n_stages * n_trunks):
        for bi in range(md):
            idx = si * md + bi
            if bi < cfg.d[si]:
                feats.append(_onehot(cfg.ks[idx], space.ks_list))
                feats.append(_onehot(cfg.e[idx], space.expand_list))
            else:
                feats.append(np.zeros(len(space.ks_list), np.float32))
                feats.append(np.zeros(len(space.expand_list), np.float32))
    feats.append(_onehot(cfg.pixel_d, space.pixel_d_list))
    return np.concatenate(feats)
