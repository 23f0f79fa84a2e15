"""AOT export of materialized subnets for serving.

The reference's deployment endpoint is a torch state_dict plus the Python
model code to rebuild it (model_zoo.py:191-213). Here deployment goes one
step further: a materialized StaticSubnet (weights folded, elasticity gone
— models/materialize.py) is lowered once with jax.export into a
self-contained StableHLO artifact. The artifact embeds the weights and the
program; serving it needs jax but NOT this package's model code, and one
artifact can carry lowerings for several platforms (build on a CPU dev box,
serve on TPU).

Format: the jax.export serialization bytes, written as a single file.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .arch import SubnetConfig
from .materialize import get_active_subnet


def export_subnet(net, params, state, cfg: SubnetConfig, input_hw,
                  *, batch: int = 1, dtype=jnp.float32,
                  mode: str = "sr", fold_bn: bool = True,
                  platforms: Optional[Sequence[str]] = ("cpu", "tpu"),
                  path: Optional[str] = None) -> bytes:
    """Materialize `cfg` out of the supernet and AOT-export it for
    `(batch, *input_hw, 3)` inputs (LR resolution in 'sr' mode, HR in
    'autoencoder'). Returns the serialized artifact; also writes it to
    `path` when given.

    `platforms`: lowerings to embed ('cpu','tpu','cuda'); None = the
    current default backend only.
    """
    subnet = get_active_subnet(net, params, state, cfg, fold_bn=fold_bn,
                               mode=mode)
    fn = jax.jit(lambda x: subnet(x))
    spec = jax.ShapeDtypeStruct((batch, input_hw[0], input_hw[1], 3), dtype)
    exp = jax_export.export(
        fn, platforms=list(platforms) if platforms else None)(spec)
    blob = bytes(exp.serialize())
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_fn(fn, input_shape, *, dtype=jnp.float32,
              platforms: Optional[Sequence[str]] = ("cpu", "tpu"),
              path: Optional[str] = None) -> bytes:
    """Generic exporter: AOT-serialize any jittable `fn(x)` for a fixed
    input shape (used for nets that are already static, e.g.
    StaticNetFromConfig specialized nets)."""
    spec = jax.ShapeDtypeStruct(tuple(input_shape), dtype)
    exp = jax_export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None)(spec)
    blob = bytes(exp.serialize())
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_cls_subnet(net, params, state, arch, image_size: int,
                      *, batch: int = 1, dtype=jnp.float32,
                      fold_bn: bool = True,
                      platforms: Optional[Sequence[str]] = ("cpu", "tpu"),
                      path: Optional[str] = None) -> bytes:
    """Classification twin of export_subnet: materialize `arch` (ClsArch)
    out of an MBV3/Proxyless supernet and AOT-export `fn(image) -> logits`
    for `(batch, image_size, image_size, 3)` inputs."""
    from .materialize_cls import get_active_cls_subnet

    subnet = get_active_cls_subnet(net, params, state, arch, fold_bn=fold_bn)
    fn = jax.jit(lambda x: subnet(x))
    spec = jax.ShapeDtypeStruct((batch, image_size, image_size, 3), dtype)
    exp = jax_export.export(
        fn, platforms=list(platforms) if platforms else None)(spec)
    blob = bytes(exp.serialize())
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_subnet(blob_or_path):
    """Deserialize an exported subnet into a jit-callable `fn(x) -> sr`."""
    if isinstance(blob_or_path, (str, bytes, bytearray)):
        if isinstance(blob_or_path, str):
            with open(blob_or_path, "rb") as f:
                blob = f.read()
        else:
            blob = bytes(blob_or_path)
    else:
        raise TypeError("expected a path or serialized bytes")
    exp = jax_export.deserialize(blob)
    return jax.jit(exp.call)
