"""Device mesh + parameter sharding: the TPU-native replacement for the
reference's FSDP/NCCL stack (utils/distributed.py:23-67, SURVEY.md §2.8).

Mapping from the reference's strategies:
- FULL_SHARD / ZeRO-3            -> params sharded along the 'fsdp' mesh
  axis; XLA inserts all-gathers per layer and reduce-scatters grads
  (GSPMD), which is exactly what FSDP does by hand over NCCL.
- HYBRID_SHARD ('hybrid_full')   -> mesh ('dp', 'fsdp') with 'dp' across
  DCN (replicas) and 'fsdp' across ICI — build the mesh with
  ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` on multi-host.
- DistributedSampler / DP        -> batch sharded along 'dp' x 'fsdp'.
- EMA over sharded params        -> EMA pytree inherits the same shardings
  (utils/distributed.py:91-125 needed gather hacks; here it's free).
- rank0 broadcast of randomness  -> same PRNG key on all hosts (no op).

Multi-chip is exercised on a virtual CPU mesh in tests and via
__graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(fsdp: int | None = None, dp: int = 1,
                sp: int = 1, devices=None) -> Mesh:
    """Build a ('dp', 'fsdp', 'sp') mesh over all local devices by default.

    'sp' (sequence/context parallel) is 1 unless long-context (14B teacher)
    sharding is wanted (SURVEY.md §5.7.2).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if fsdp is None:
        fsdp = n // (dp * sp)
    assert dp * fsdp * sp == n, (dp, fsdp, sp, n)
    arr = np.asarray(devices).reshape(dp, fsdp, sp)
    return Mesh(arr, ("dp", "fsdp", "sp"))


def _leaf_spec(x, axis_name: str, axis_size: int, min_size: int) -> P:
    """Shard the largest divisible dimension of a leaf along the fsdp axis.

    Leaves smaller than ``min_size`` elements stay replicated (same idea as
    FSDP's size-based auto-wrap policy, utils/distributed.py:38-44).
    """
    if x.size < min_size:
        return P()
    dims = list(x.shape)
    order = sorted(range(len(dims)), key=lambda i: -dims[i])
    for i in order:
        if dims[i] % axis_size == 0 and dims[i] >= axis_size:
            spec = [None] * len(dims)
            spec[i] = axis_name
            return P(*spec)
    return P()


def fsdp_shardings(params, mesh: Mesh, axis: str = "fsdp",
                   min_size: int = 2 ** 16):
    """NamedSharding pytree for FSDP-style parameter sharding.

    Two AdaLN-path exceptions keep SPMD from involuntarily rematerializing
    (replicate-then-repartition) the per-frame modulation tensors inside
    the step (MULTICHIP_r02 warnings on [1,1,6,D] broadcasts):
    - ``modulation`` tensors stay replicated regardless of size (~550 KB
      of params at 1.3B — not worth a per-step reshard on the hot path);
    - ``time_projection`` ([D, 6D]) shards its *input* dim: output-dim
      sharding makes the e0 activation [BF, 6D] sharded on 6D, and the
      [B,F,6,D] reshape splits that axis across (6, D) — unrepresentable,
      so SPMD replicates-then-repartitions every step.
    """
    size = mesh.shape[axis]

    def leaf(path, x):
        ks = jax.tree_util.keystr(path)
        if "modulation" in ks:
            return NamedSharding(mesh, P())
        if ("time_projection" in ks and x.ndim == 2 and x.size >= min_size
                and x.shape[0] % size == 0):
            return NamedSharding(mesh, P(axis, None))
        return NamedSharding(mesh, _leaf_spec(x, axis, size, min_size))

    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_params(params, mesh: Mesh, axis: str = "fsdp",
                 min_size: int = 2 ** 16):
    """device_put the params with FSDP shardings."""
    sh = fsdp_shardings(params, mesh, axis, min_size)
    return jax.tree.map(jax.device_put, params, sh)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def data_sharding(mesh: Mesh, *batch_axes: str) -> NamedSharding:
    """Sharding for a batch array: leading dim over dp (and fsdp if it
    divides) — the DistributedSampler equivalent (inference.py:96-99)."""
    axes = batch_axes or (("dp", "fsdp"),)
    return NamedSharding(mesh, P(*axes))


def combined_fsdp_specs(params, mesh: Mesh, axes=("fsdp", "sp"),
                        min_size: int = 2 ** 16):
    """FSDP-style PartitionSpecs over a COMBINED mesh-axis tuple: every
    big leaf's largest divisible dim shards over ``prod(axes)`` devices.
    Mirrors fsdp_shardings (same modulation/time_projection exceptions)
    but with a tuple axis — used for student/optimizer state at
    14B-teacher scale (parallel/aot.py) and for the ZeRO-3-over-sp
    teacher layout (parallel/sequence.py forward_train_sp param_specs).
    """
    size = int(np.prod([mesh.shape[a] for a in axes]))

    def leaf(path, x):
        ks = jax.tree_util.keystr(path)
        if "modulation" in ks or x.size < min_size:
            return P()
        if "time_projection" in ks and x.ndim == 2 \
                and x.shape[0] % size == 0:
            return P(axes, None)
        dims = list(x.shape)
        for i in sorted(range(len(dims)), key=lambda i: -dims[i]):
            if dims[i] % size == 0 and dims[i] >= size:
                spec = [None] * len(dims)
                spec[i] = axes
                return P(*spec)
        return P()

    return jax.tree_util.tree_map_with_path(leaf, params)


def spec_component(specs, axis: str):
    """Project a PartitionSpec tree onto one mesh axis: every entry
    keeps only ``axis`` (tuple entries reduce to it), everything else
    becomes None — the MANUAL-axis view a partial-auto shard_map's
    in_specs need for arrays sharded over mixed auto/manual axes."""
    def one(sp):
        out = []
        for entry in (sp or ()):
            axes = entry if isinstance(entry, tuple) else (entry,) \
                if entry is not None else ()
            out.append(axis if axis in axes else None)
        return P(*out)

    return jax.tree_util.tree_map(
        one, specs, is_leaf=lambda x: isinstance(x, P))


def rollout_cache_constraint(mesh: Mesh):
    """Activation-sharding hook for the training rollout's KV cache
    (pipelines/self_forcing_training.py): constrain the folded
    [L, B*N, S, D] cache over the mesh so the per-block cache residuals
    the with-grad backward must keep (values are required — the exit
    step's attention VJP reads them) are sharded instead of replicated.
    At 1.3B/21-frame geometry one cache is 6 GB bf16 and the 7-block
    backward keeps all seven — replicated they alone bust a 16 GB chip;
    sharded 16-way they are ~2.6 GB total (parallel/aot.py sp_dmd_fit).

    Dims: B*N over ('dp','sp') (batch rides dp; heads ride sp — both
    GSPMD-auto axes in the training step), S over 'fsdp'.  Falls back
    per-dim to fewer axes / replicated when sizes don't divide.
    """
    import dataclasses as _dc

    import jax as _jax

    def _axes_for(size: int, *cands):
        for axes in cands:
            n = int(np.prod([mesh.shape[a] for a in axes]))
            if size % n == 0:
                return axes if len(axes) > 1 else axes[0]
        return None

    def constrain(cache):
        L, BN, S, D = cache.k.shape
        spec = P(None,
                 _axes_for(BN, ("dp", "sp"), ("dp",)),
                 _axes_for(S, ("fsdp",)),
                 None)
        sh = NamedSharding(mesh, spec)
        return _dc.replace(
            cache,
            k=_jax.lax.with_sharding_constraint(cache.k, sh),
            v=_jax.lax.with_sharding_constraint(cache.v, sh))

    return constrain
