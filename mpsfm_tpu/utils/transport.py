"""Single-read device->host transport.

On the tunneled TPU backend every blocking value read pays ~35-100 ms of
round-trip latency while dispatches are free and chain device-side
(PERF.md round-5 probe: dispatch 0.0 ms, read ~38 ms, two chained
programs + one read ~= one program + one read). The mapper therefore
packs every device result it needs on the host for a control decision
into ONE flat f32 vector and reads that once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _concat_flat(*arrs):
    return jnp.concatenate([a.astype(jnp.float32).reshape(-1) for a in arrs])


def fetch_many(arrays):
    """Fetch a list of device arrays in ONE blocking read; returns
    np.float32 arrays with the original shapes. Compiles one tiny concat
    program per distinct shape combination (shape bucketing upstream
    keeps the variant count bounded)."""
    arrays = list(arrays)
    if not arrays:
        return []
    flat = np.asarray(_concat_flat(*arrays))
    out = []
    off = 0
    for a in arrays:
        n = int(np.prod(a.shape)) if a.ndim else 1
        out.append(flat[off: off + n].reshape(a.shape))
        off += n
    return out
