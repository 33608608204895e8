"""Mesh-sharded batched inference for the extraction layer.

TPU-native replacement for the reference's torch.nn.DataParallel around
per-image model forwards (SURVEY.md §2.2, metric3dv2.py:44): images are
bucketed by padded shape, stacked into one batch, laid out with the
batch axis sharded over a 1-D device mesh, and run through ONE jitted
vmapped forward — XLA's partitioner turns the batch axis into pure data
parallelism (no collectives in the forward; outputs gather to host).

Works identically on the virtual 8-device CPU mesh (tests) and real
multi-chip slices; on a single chip it degrades to plain batching,
which already amortizes dispatch/tunnel latency across images.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("batch",))


def run_sharded_batches(fn, items, prep, mesh: Mesh | None = None):
    """Run `fn(batch) -> pytree with leading batch axis` over `items`.

    prep(item) -> np.ndarray (the per-item input; items with the same
    shape are grouped into one padded batch). Returns a list of per-item
    output pytrees in the original order.
    """
    if mesh is None:
        mesh = data_mesh()
    n_dev = mesh.devices.size
    shard = NamedSharding(mesh, P("batch"))

    arrays = [np.asarray(prep(it)) for it in items]
    buckets: dict[tuple, list[int]] = {}
    for i, a in enumerate(arrays):
        buckets.setdefault(a.shape, []).append(i)

    jfn = jax.jit(fn)
    results: list = [None] * len(items)
    for shape, idxs in buckets.items():
        B = len(idxs)
        Bp = ((B + n_dev - 1) // n_dev) * n_dev
        batch = np.zeros((Bp, *shape), arrays[idxs[0]].dtype)
        for k, i in enumerate(idxs):
            batch[k] = arrays[i]
        with mesh:
            out = jfn(jax.device_put(jnp.asarray(batch), shard))
        out = jax.tree_util.tree_map(np.asarray, out)
        for k, i in enumerate(idxs):
            results[i] = jax.tree_util.tree_map(lambda x: x[k], out)
    return results
