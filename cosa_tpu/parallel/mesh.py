"""Device mesh + sharding rules.

The reference scales with NCCL DDP only (utils/torch_helper.py:184-190,
main.py:49-50) — replicated parameters, per-iteration barrier, implicit
gradient all-reduce. Here the whole train step is one jit over a
('data', 'model') mesh:

  * batches shard over 'data'; XLA inserts the gradient reduce-scatter /
    all-reduce over ICI automatically — no barrier, no DDP wrapper, and the
    EMA teacher update happens inside the same program so rank drift is
    structurally impossible.
  * an optional 'model' axis tensor-shards the ViT attention heads and MLP
    (Megatron-style column/row splits), something the reference cannot do.
    For ViT-B this is off (tp=1) by default — it exists for larger backbones
    and to keep the mesh layout future-proof.

Sharding specs are assigned by key-path substring rules so the same rules
cover params, the EMA teacher copy, and optax's mu/nu mirrors.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != ndevices({n})"
    arr = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


# (path regex, PartitionSpec) — first match wins. Column-parallel for
# qkv/fc1 (output dim sharded), row-parallel for proj/fc2 (input dim
# sharded); everything else replicated.
_RULES: Tuple[Tuple[str, P], ...] = (
    (r"attn.*qkv.*kernel", P(None, "model")),
    (r"attn.*qkv.*bias", P("model")),
    (r"attn.*proj.*kernel", P("model", None)),
    (r"mlp.*fc1.*kernel", P(None, "model")),
    (r"mlp.*fc1.*bias", P("model")),
    (r"mlp.*fc2.*kernel", P("model", None)),
    # swin blocks keep fc1/fc2 directly on the block (models/zoo/swin.py),
    # not under an 'mlp' scope — same column/row split applies
    (r"stage\d+_block\d+.*fc1.*kernel", P(None, "model")),
    (r"stage\d+_block\d+.*fc1.*bias", P("model")),
    (r"stage\d+_block\d+.*fc2.*kernel", P("model", None)),
)


def param_spec(path_str: str, ndim: int) -> P:
    for pat, spec in _RULES:
        if re.search(pat, path_str) and len(spec) <= ndim:
            return spec
    return P()


def _path_to_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def state_sharding(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for any state-like tree (params, teacher copy,
    optax state): model-sharding rules where paths match, replicated
    otherwise. Works on concrete or ShapeDtypeStruct trees."""

    def leaf_sharding(path, leaf):
        ndim = len(getattr(leaf, "shape", ()))
        if mesh.shape["model"] == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_spec(_path_to_str(path), ndim))

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)
