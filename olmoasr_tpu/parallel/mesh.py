"""Device meshes and parameter sharding rules.

Replaces the reference's torch.distributed/NCCL layer
(``/root/reference/scripts/training/train_timestamps.py:564-574`` DDP init,
``train_fsdp_timestamps.py:2437-2442`` FSDP sharding strategies) with the JAX
SPMD model: one ``jax.sharding.Mesh`` with axes

  * ``data``  — pure data parallelism (DDP analog; gradient psum inserted by
    XLA). Spans DCN across slices in multi-slice deployments.
  * ``fsdp``  — parameter/optimizer-state sharding (FULL_SHARD / ZeRO-3
    analog; all-gather in fwd/bwd + reduce-scatter of grads inserted by XLA
    from sharding annotations). Spans ICI.

The four reference FSDP strategies map to mesh shapes + a zero2 flag
(training.train.shard_train_state):
  FULL_SHARD          -> (1, N)
  SHARD_GRAD_OP       -> (1, N)   + zero2=True (params replicated, grads/opt
                                    sharded; reduce-scatter in the update)
  HYBRID_SHARD        -> (R, N/R)
  _HYBRID_SHARD_ZERO2 -> (R, N/R) + zero2=True
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def make_mesh(
    n_data: Optional[int] = None,
    n_fsdp: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, fsdp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_fsdp
    assert n_data * n_fsdp == len(devices), (
        f"mesh {n_data}x{n_fsdp} != {len(devices)} devices"
    )
    arr = np.array(devices).reshape(n_data, n_fsdp)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS))


def _shardable(dim: int, n_shard: int) -> bool:
    return dim % n_shard == 0 and dim >= n_shard


def param_spec(path: Tuple[str, ...], shape: Tuple[int, ...], n_fsdp: int) -> P:
    """FSDP PartitionSpec for one parameter leaf.

    Stacked block leaves are (L, ...); we shard the largest non-layer axis on
    the ``fsdp`` axis when divisible, else replicate. The token embedding is
    sharded along the vocab axis.
    """
    if n_fsdp == 1:
        return P()
    name = path[-1]
    if name == "token_embedding":
        # training vocab is n_vocab+1 = 51865 (rarely divisible); shard the
        # feature axis instead when the vocab axis doesn't divide
        if _shardable(shape[0], n_fsdp):
            return P(FSDP_AXIS, None)
        if _shardable(shape[1], n_fsdp):
            return P(None, FSDP_AXIS)
        return P()
    if name == "positional_embedding" or name.startswith("conv"):
        return P()
    if len(shape) == 3:  # stacked (L, in, out) weights
        # shard the output-feature axis; fall back to the input axis
        if _shardable(shape[2], n_fsdp):
            return P(None, None, FSDP_AXIS)
        if _shardable(shape[1], n_fsdp):
            return P(None, FSDP_AXIS, None)
        return P()
    if len(shape) == 2:  # stacked (L, d) biases / LN params
        if _shardable(shape[1], n_fsdp):
            return P(None, FSDP_AXIS)
        return P()
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """A pytree of NamedShardings matching ``params`` (FSDP along fsdp axis)."""
    n_fsdp = mesh.shape[FSDP_AXIS]

    def spec_of(path, leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return NamedSharding(mesh, param_spec(keys, leaf.shape, n_fsdp))

    return jax.tree_util.tree_map_with_path(spec_of, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over every device (data x fsdp)."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
