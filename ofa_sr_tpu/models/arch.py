"""Architecture (subnet) configuration and sampling.

The reference mutates module attributes (`set_active_subnet`,
ofa_mbs4.py:263-293) and samples with Python `random` under a deterministic
per-(epoch, batch, subnet) seed (progressive_shrinking.py:161-165). Here a
subnet is an immutable host-side `SubnetConfig`; `to_device()` turns it into
a pytree of small int arrays that feed the single compiled masked-execution
step (SURVEY.md §7.0) — no recompiles, no module mutation.

Sampling reproduces the reference contract exactly: `random.seed(subnet_seed)`
then per-block `random.choice(ks)`, per-block choice(e), per-stage choice(d),
one choice(pixel_d) — in that order (ofa_mbs4.py:316-370). Constraint
include-lists (`set_constraint`, ofa_mbs4.py:295-307) are plain arguments.
"""

from __future__ import annotations

import dataclasses
import random
from typing import List, Optional, Sequence

import jax.numpy as jnp

from ..utils.common import int2list, make_divisible


@dataclasses.dataclass(frozen=True)
class SearchSpace:
    """Static description of one elastic MBConv trunk's search space."""

    ks_list: Sequence[int] = (3, 5, 7)
    expand_list: Sequence[float] = (3, 4, 6)
    depth_list: Sequence[int] = (2, 3, 4)
    pixel_d_list: Sequence[int] = (1, 2)
    n_stages: int = 4          # elastic MBConv stages per trunk
    width: int = 64            # trunk channel width (base_stage_width, ofa_mbs4.py:37)

    def __post_init__(self):
        object.__setattr__(self, "ks_list", sorted(set(int2list(self.ks_list))))
        object.__setattr__(self, "expand_list", sorted(int2list(self.expand_list)))
        object.__setattr__(self, "depth_list", sorted(int2list(self.depth_list)))
        object.__setattr__(self, "pixel_d_list", sorted(int2list(self.pixel_d_list)))

    @property
    def max_depth(self) -> int:
        return max(self.depth_list)

    @property
    def max_ks(self) -> int:
        return max(self.ks_list)

    @property
    def max_expand(self):
        return max(self.expand_list)

    @property
    def blocks_per_trunk(self) -> int:
        return self.n_stages * self.max_depth

    @property
    def max_mid(self) -> int:
        return round(self.width * self.max_expand)

    def mid_channels(self, expand_ratio) -> int:
        """make_divisible(round(in * e), 8) — DynamicMBConvLayer.forward
        (dynamic_layers.py:75-77)."""
        return make_divisible(round(self.width * expand_ratio), 8)

    def mid_candidates(self) -> List[int]:
        return [self.mid_channels(e) for e in self.expand_list]


@dataclasses.dataclass(frozen=True)
class SubnetConfig:
    """One sampled subnet. `ks`/`e` are per MBConv block (over all trunks in
    network order), `d` per stage, `pixel_d` a single int mirrored to both
    the unshuffle and shuffle heads (ofa_mbx4.py:360-376)."""

    ks: tuple
    e: tuple
    d: tuple
    pixel_d: int

    def to_device(self, space: SearchSpace):
        """Pytree of int32 arrays for the masked supernet forward.

        ks becomes an index into sorted(set(ks_list)); e becomes the active
        middle-channel count (make_divisible applied host-side so the traced
        side only sees widths).
        """
        ks_set = list(space.ks_list)
        return {
            "ks_idx": jnp.asarray([ks_set.index(k) for k in self.ks], jnp.int32),
            "mid": jnp.asarray([space.mid_channels(e) for e in self.e], jnp.int32),
            "depth": jnp.asarray(self.d, jnp.int32),
            "pixel_d": jnp.asarray(self.pixel_d, jnp.int32),
        }

    def describe(self) -> str:
        return "ks%s_e%s_d%s_pd%d" % (list(self.ks), list(self.e), list(self.d), self.pixel_d)

    # -- JSON serialization (the SR-side net.config; the reference's own
    # S4/X4 config plumbing is broken leftovers — mobilenet_s4.py:47,69-73 —
    # so the schema here is the subnet setting itself) -----------------------

    def to_dict(self) -> dict:
        return {"name": "SubnetConfig", "ks": list(self.ks),
                "e": list(self.e), "d": list(self.d),
                "pixel_d": int(self.pixel_d)}

    @staticmethod
    def from_dict(d: dict) -> "SubnetConfig":
        if d.get("name", "SubnetConfig") != "SubnetConfig":
            raise ValueError("not a SubnetConfig dict: %r" % d.get("name"))
        return SubnetConfig(ks=tuple(d["ks"]), e=tuple(d["e"]),
                            d=tuple(d["d"]), pixel_d=int(d["pixel_d"]))


def max_subnet(space: SearchSpace, n_trunks: int = 1) -> SubnetConfig:
    n_blocks = space.blocks_per_trunk * n_trunks
    return SubnetConfig(
        ks=tuple([space.max_ks] * n_blocks),
        e=tuple([space.max_expand] * n_blocks),
        d=tuple([space.max_depth] * (space.n_stages * n_trunks)),
        pixel_d=max(space.pixel_d_list),
    )


def uniform_subnet(space: SearchSpace, ks, e, d, pixel_d, n_trunks: int = 1) -> SubnetConfig:
    """Broadcast scalars across blocks/stages (reference set_active_subnet's
    int2list broadcasting, ofa_mbs4.py:279-282)."""
    n_blocks = space.blocks_per_trunk * n_trunks
    return SubnetConfig(
        ks=tuple(int2list(ks, n_blocks)),
        e=tuple(int2list(e, n_blocks)),
        d=tuple(int2list(d, space.n_stages * n_trunks)),
        pixel_d=pixel_d if not isinstance(pixel_d, (list, tuple)) else pixel_d[0],
    )


def reference_quirk_arch_s4(cfg: SubnetConfig) -> SubnetConfig:
    """Map a sampled subnet to the architecture the reference S4 *actually
    executes*.

    Two reference quirks compose (verified against the live code in
    tests/test_reference_parity.py):
    - set_active_subnet inserts pixel_d at position -1 of the depth list
      (ofa_mbs4.py:283), so runtime_depth = [d0,d1,d2, pd, d3];
    - forward's shuffle loop enumerates block_group_info[4:] from 0 and
      reads runtime_depth[stage_id] (ofa_mbs4.py:165-169), so the shuffle
      stage uses runtime_depth[0] = d0, not the pixel_d entry.

    Net effect: stage depths = (d0, d1, d2, pixel_d); shuffle count =
    min(2, d0) — with d0 >= 2 the as-committed S4 always upsamples 4x, and
    the sampled pixel_d only truncates the last MBConv stage.
    """
    d_eff = (cfg.d[0], cfg.d[1], cfg.d[2], cfg.pixel_d)
    pd_eff = min(2, cfg.d[0])
    return SubnetConfig(ks=cfg.ks, e=cfg.e, d=d_eff, pixel_d=pd_eff)


def reference_quirk_arch_x4(cfg: SubnetConfig) -> SubnetConfig:
    """Reference X4 as-executed architecture.

    set_active_subnet inserts pixel_d at positions 0 and -1
    (ofa_mbx4.py:365-366) giving runtime_depth =
    [pd, d0..d6, pd, d7]; but every forward loop enumerates its group slice
    from 0 (ofa_mbx4.py:196-240), so the encoder stages AND the decoder
    stages both read runtime_depth[0:4] = [pd, d0, d1, d2], and the
    unshuffle/shuffle loops read runtime_depth[0] = pd (by accident, the
    intended value). Net effect: both trunks run stage depths
    (pd, d0, d1, d2); d3..d7 are sampled but never used; the up/downscale
    factor is 2^pd as intended.
    """
    n = len(cfg.d) // 2
    assert n == 4, "X4 has 4+4 stages"
    trunk = (cfg.pixel_d, cfg.d[0], cfg.d[1], cfg.d[2])
    return SubnetConfig(ks=cfg.ks, e=cfg.e, d=trunk + trunk,
                        pixel_d=cfg.pixel_d)


def subnet_seed(epoch: int, n_batch: int, batch_idx: int, subnet_idx: int) -> int:
    """The reference's determinism contract:
    int('%d%.3d%.3d' % (epoch * nBatch + i, subnet_idx, 0))
    (progressive_shrinking.py:161-165)."""
    return int("%d%.3d%.3d" % (epoch * n_batch + batch_idx, subnet_idx, 0))


def sample_subnet(
    space: SearchSpace,
    seed: Optional[int] = None,
    n_trunks: int = 1,
    ks_candidates: Optional[Sequence] = None,
    expand_candidates: Optional[Sequence] = None,
    depth_candidates: Optional[Sequence] = None,
    pixel_d_candidates: Optional[Sequence] = None,
    rng: Optional[random.Random] = None,
) -> SubnetConfig:
    """Uniform per-dimension sampling in the reference's exact draw order
    (sample_active_subnet, ofa_mbs4.py:316-370): all ks draws, then all e
    draws, then per-stage d draws, then one pixel_d draw.

    Candidate overrides implement `set_constraint` include-lists
    (ofa_mbs4.py:295-307). Passing `seed` reseeds the module-level Python
    RNG exactly like `random.seed(subnet_seed)` in the reference trainer.
    """
    if rng is None:
        if seed is not None:
            random.seed(seed)
        rng = random

    ks_c = list(ks_candidates) if ks_candidates is not None else list(space.ks_list)
    e_c = list(expand_candidates) if expand_candidates is not None else list(space.expand_list)
    d_c = list(depth_candidates) if depth_candidates is not None else list(space.depth_list)
    p_c = list(pixel_d_candidates) if pixel_d_candidates is not None else list(space.pixel_d_list)

    n_blocks = space.blocks_per_trunk * n_trunks
    ks = [rng.choice(ks_c) for _ in range(n_blocks)]
    e = [rng.choice(e_c) for _ in range(n_blocks)]
    d = [rng.choice(d_c) for _ in range(space.n_stages * n_trunks)]
    pixel_d = rng.choice(p_c)
    return SubnetConfig(ks=tuple(ks), e=tuple(e), d=tuple(d), pixel_d=pixel_d)
