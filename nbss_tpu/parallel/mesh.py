"""Device mesh + sharding policy.

The reference scales by DDP data parallelism only (SURVEY.md §2.8); here the
equivalent is a 1-D ``data`` mesh axis over ICI: the batch is sharded on axis
0, parameters/optimizer state are replicated, and XLA inserts the gradient
psum. The narrow-band models are embarrassingly parallel over frequency, so a
second optional ``freq`` axis is provided for sharding the F dimension of
activations (sequence-parallel analogue) on pods; single-host training uses
``data`` only.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    With one axis, shape is (n,). With two axes (e.g. ('data','freq')),
    pass ``shape``; ICI-adjacent devices land on the minor (last) axis.
    """
    devs = jax.devices()[: n_devices or len(jax.devices())]
    if shape is None:
        shape = (len(devs),) if len(axes) == 1 else None
    assert shape is not None, "pass shape= for multi-axis meshes"
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch pytree onto the mesh, sharded on dim 0.

    Single-process: a plain sharded device_put. Multi-process: each host
    holds only ITS shard of the global batch (rank-strided per-host loaders,
    sampler.py), so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the analogue of DDP's
    per-rank batches. Arrays whose leading dim does not divide the mesh
    (e.g. batch-1 full-length eval utterances) are replicated instead.
    Multi-process replication requires identical data on every host (holds
    for seed-fixed val/test stages); because a silent mismatch would make
    val metrics / early stopping / LR decisions diverge across hosts, the
    replicated fallback VERIFIES this with a cheap host-side checksum
    all-gather and raises on mismatch."""
    sharded = batch_sharding(mesh, axis)
    repl = replicated(mesh)
    n = mesh.shape[axis]  # size of the batch axis (mesh may be multi-axis)
    multi = jax.process_count() > 1

    def put(x):
        x = np.asarray(x) if multi else x
        if multi:
            if x.ndim > 0 and (x.shape[0] * jax.process_count()) % n == 0:
                return jax.make_array_from_process_local_data(sharded, x)
            _assert_same_across_processes(x)
            return jax.make_array_from_process_local_data(repl, x)
        sh = sharded if (x.ndim > 0 and x.shape[0] % n == 0) else repl
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def _assert_same_across_processes(x: np.ndarray) -> None:
    """Raise if ``x`` differs between processes (crc32 over raw bytes,
    gathered via one tiny collective). Only runs on the rare ragged-batch
    replication fallback, so the cost is negligible."""
    import zlib

    from jax.experimental import multihost_utils

    h = np.array([zlib.crc32(np.ascontiguousarray(x).tobytes())], np.uint32)
    gathered = np.asarray(multihost_utils.process_allgather(h)).reshape(-1)
    if not (gathered == gathered[0]).all():
        raise ValueError(
            "replicated batch differs across processes (checksums "
            f"{gathered.tolist()}); ragged val/test batches must be "
            "seed-identical on every host — check the sampler seeds")


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh.

    Multi-process: every host computes the tree identically (same init seed /
    same restored checkpoint), so each contributes its copy as the local data
    of a fully-replicated global array."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        def put(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x  # already a global array (e.g. restored checkpoint)
            return jax.make_array_from_process_local_data(sh, np.asarray(x))

        return jax.tree.map(put, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
