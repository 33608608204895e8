"""Multi-device bundle adjustment: observation-sharded LM over a mesh.

The scaling design from SURVEY.md §2.2/§5: the BA observation table (the
only axis that grows with scene size faster than cameras) is sharded
across a 1-D device mesh; cameras and points are replicated. Every
reduction in the solver (normal-equation assembly, Schur-PCG matvecs,
costs) is a segment-sum over observations — under jit with sharded
operand layouts XLA's SPMD partitioner turns those scatter-adds into
partial sums + psum over ICI, which is exactly the hand-written
collective pattern MegBA-style distributed BA uses (PAPERS.md).

This module provides the sharding constructors + a sharded entry point.
The same code path runs on the virtual CPU mesh in tests and on real
multi-chip slices — jax.distributed for multi-host changes only mesh
construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpsfm_tpu.ba.solver import BAData, solve_ba
from mpsfm_tpu.ba import losses


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_to_multiple(x, m, fill=0):
    n = x.shape[0]
    target = ((n + m - 1) // m) * m
    if target == n:
        return x
    pad = np.full((target - n, *x.shape[1:]), fill, x.dtype)
    return np.concatenate([np.asarray(x), pad])


def shard_ba_data(data: BAData, mesh: Mesh, axis: str = "obs") -> BAData:
    """Lay out BAData for the mesh: observation arrays sharded along the
    obs axis, camera/point state replicated."""
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def put_repl(x):
        return jax.device_put(jnp.asarray(x), repl)

    def put_obs(x, fill=0):
        # camera-major layout must keep its C*S row count: shard only when
        # the row count divides the mesh; otherwise replicate (still
        # correct — just no obs-parallel speedup for that array).
        arr = np.asarray(x)
        if arr.shape[0] % n_dev != 0:
            return jax.device_put(jnp.asarray(arr), repl)
        return jax.device_put(jnp.asarray(arr), shard)

    return BAData(
        quat=put_repl(data.quat),
        t=put_repl(data.t),
        cam_dof=put_repl(data.cam_dof),
        fx=put_repl(data.fx),
        fy=put_repl(data.fy),
        cx=put_repl(data.cx),
        cy=put_repl(data.cy),
        xyz=put_repl(data.xyz),
        point_var=put_repl(data.point_var),
        r_cam=put_obs(data.r_cam),
        r_pt=put_obs(data.r_pt),
        r_uv=put_obs(data.r_uv),
        r_valid=put_obs(data.r_valid),
        r_mag=put_obs(data.r_mag),
        r_scale=put_obs(data.r_scale, fill=1),  # 0-scale padding NaNs the loss
        d_cam=put_obs(data.d_cam),
        d_pt=put_obs(data.d_pt),
        d_logtarget=put_obs(data.d_logtarget),
        d_valid=put_obs(data.d_valid),
        d_mag=put_obs(data.d_mag),
        d_scale=put_obs(data.d_scale, fill=1),
        # slot tables index the obs arrays; replicated — gathers from
        # sharded operands to replicated outputs become all-gathers
        # inserted by the partitioner.
        r_pt_slots=put_repl(data.r_pt_slots),
        r_pt_slot_mask=put_repl(data.r_pt_slot_mask),
        d_pt_slots=put_repl(data.d_pt_slots),
        d_pt_slot_mask=put_repl(data.d_pt_slot_mask),
        # pc coupling tables dropped: the obs-sharded solve uses the
        # matrix-free PCG path (every reduction a partial-sum + psum).
    )


def solve_ba_sharded(
    data: BAData,
    mesh: Mesh,
    reproj_loss: int = losses.SOFT_L1,
    depth_loss: int = losses.CAUCHY,
    max_iters: int = 20,
    cg_iters: int = 100,
):
    """Run the LM solver with mesh-sharded observations.

    The solver body is unchanged — jit + input shardings let the SPMD
    partitioner insert the psum reductions. Outputs (poses/points) come
    back replicated.
    """
    sharded = shard_ba_data(data, mesh)
    with mesh:
        return solve_ba(
            sharded,
            reproj_loss=reproj_loss,
            depth_loss=depth_loss,
            max_iters=max_iters,
            cg_iters=cg_iters,
        )
