"""Device mesh construction and GSPMD sharding rules.

The reference's only distribution strategy is DDP through HF Accelerate/NCCL
(reference trainer.py:211-269, SURVEY.md section 2.7). The TPU-native
equivalent is a 2-D ``jax.sharding.Mesh`` over ICI with named axes:

- ``data``  — batch dimension (data parallelism; XLA all-reduces grads)
- ``model`` — tensor parallelism over attention heads and FF inner dims

Parameters are annotated with ``NamedSharding``s by path-pattern rules and jit
does the rest: XLA inserts the all-gathers/reduce-scatters on ICI (the
"scaling book" recipe: pick a mesh, annotate, let the compiler place
collectives). With ``model=1`` this reduces to pure DP, matching the
reference's capability; with ``model>1`` it exceeds it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, seq, model) mesh. ``seq`` > 1 enables sequence parallelism for
    full-song training: activations shard on the frame axis and windowed
    attention runs the halo-exchange kernels (parallel/sequence.py). A
    size-1 seq axis is always present so PartitionSpecs naming it stay valid
    on pure data/tensor-parallel meshes."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * seq) == 0, f"{n} devices not divisible by model*seq={model * seq}"
        data = n // (model * seq)
    assert data * model * seq <= n, f"mesh {data}x{seq}x{model} needs more than {n} devices"
    arr = np.asarray(devices[: data * seq * model]).reshape(data, seq, model)
    return Mesh(arr, axis_names=("data", "seq", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_put(tree, shardings):
    """``jax.device_put`` onto (possibly multi-host) mesh shardings.

    In a multi-process run the source arrays are committed to local devices
    and a direct device_put would need cross-host transfers (unsupported on
    some backends); pulling to host first makes each process upload its own
    shards from its (identical) host copy — no communication at all.
    Single-process: plain device_put, no host round-trip."""
    if jax.process_count() > 1:
        tree = jax.tree.map(np.asarray, tree)
    return jax.device_put(tree, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over the data axis, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def _spec_for_param(path: str, shape: tuple, model_size: int) -> P:
    """Tensor-parallel PartitionSpec for one parameter, by module path.

    Sharded over ``model``: attention q/kv/out projections and FF inner dims
    (column-parallel on the way in, row-parallel on the way out — the Megatron
    pattern, which keeps the per-block collective count at two).
    Convolutions, norms, and embeddings stay replicated: their channel dims
    feed GroupNorm/concat patterns where sharding would force per-op
    all-gathers.
    """
    if model_size == 1 or not path.endswith("kernel"):
        return P()

    def divisible(axis: int) -> bool:
        return shape[axis] % model_size == 0

    # column-parallel: shard output features
    if ("to_q/" in path or "to_kv/" in path) and len(shape) == 2 and divisible(1):
        return P(None, "model")
    if "/ff/Dense_0/" in path and len(shape) == 2 and divisible(1):
        return P(None, "model")
    # row-parallel: shard input features
    if "to_out/" in path and len(shape) == 2 and divisible(0):
        return P("model", None)
    if "/ff/Dense_1/" in path and len(shape) == 2 and divisible(0):
        return P("model", None)
    return P()


def zero1_shardings(tree, mesh: Mesh, base_shardings=None):
    """ZeRO-1 style NamedShardings for an optimizer-moment (or adapter) tree.

    Starting from each leaf's base sharding (its tensor-parallel placement, or
    replicated when ``base_shardings`` is None), shard the largest
    still-unsharded divisible dim over ``data``. GSPMD keeps the update math
    correct while the per-chip optimizer footprint drops by the data-axis size
    — the TPU-native equivalent of DeepSpeed ZeRO stage 1 that the reference
    never had (its Accelerate DDP replicates all optimizer state,
    reference trainer.py:211-269)."""
    data_size = mesh.shape["data"]
    rep = replicated(mesh)
    if base_shardings is None:
        base_shardings = jax.tree.map(lambda _: rep, tree)

    def assign(ns, p):
        if data_size == 1 or not hasattr(p, "shape") or p.ndim == 0:
            return ns
        spec = list(ns.spec) + [None] * (p.ndim - len(ns.spec))
        order = sorted(range(p.ndim), key=lambda d: -p.shape[d])
        for d in order:
            if spec[d] is None and p.shape[d] % data_size == 0:
                spec[d] = "data"
                break
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(assign, base_shardings, tree)


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching ``params``' structure."""
    model_size = mesh.shape["model"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp) -> str:
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    specs = {path_str(kp): _spec_for_param(path_str(kp), v.shape, model_size) for kp, v in flat}

    def assign(kp, v):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(assign, params)
