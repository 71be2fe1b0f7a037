"""Multi-chip sharded MSM over a jax.sharding Mesh.

The TPU-native equivalent of the reference's only parallelism knob —
gnark's goroutine-parallel Pippenger (`MultiExpConfig{NbTasks}`,
/root/reference/common/util.go:14). Points and scalars are sharded over the
mesh's data axis; each chip computes its shard's per-window sums; the [64]
window points are all-gathered over ICI and tree-combined with the group law
(point addition is NOT an arithmetic psum — the combine must go through the
complete-addition kernel); the Horner window combine runs replicated.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import curve
from ..ops import field_backend as fp
from ..ops.curve import PointVec
from ..ops.field_backend import Fp, REDUCED
from ..utils import field_host as fh
from ..utils.field_host import Affine

AXIS = "data"


def _local_windows(x, y, z, digits):
    """Per-shard window sums: [n_local] points + [2*n_local, W] GLV digits
    -> [W] points (stacked as raw limb arrays for shard_map)."""
    pv = PointVec(Fp(x, REDUCED), Fp(y, REDUCED), Fp(z, REDUCED))
    table = curve.extend_table_glv(curve._build_table(pv))  # [9, 2*n_local]
    sel = curve._table_select_windows(table, digits)        # [W, 2*n_local]
    sel = PointVec(Fp(sel.x.limbs, REDUCED), Fp(sel.y.limbs, REDUCED),
                   Fp(sel.z.limbs, REDUCED))
    w = curve._reduce_points_axis(sel, sel.x.limbs.shape[1])
    return w.x.limbs, w.y.limbs, w.z.limbs


def _sharded_msm_body(x, y, z, digits):
    """shard_map body: shard-local windows, all-gather over ICI, cross-shard
    group-law tree combine. Returns the [64] window sums — the narrow Horner
    tail runs on the host (fh.g1_combine_windows), like the single-chip MSM."""
    wx, wy, wz = _local_windows(x, y, z, digits)
    # gather every chip's [64] window points: [n_dev, 64, 49]
    gx = jax.lax.all_gather(wx, AXIS)
    gy = jax.lax.all_gather(wy, AXIS)
    gz = jax.lax.all_gather(wz, AXIS)
    cur = PointVec(Fp(gx, REDUCED), Fp(gy, REDUCED), Fp(gz, REDUCED))
    m = gx.shape[0]
    while m > 1:
        half = m // 2
        a = curve.pmap_coords(lambda t: t[:half], cur)
        b = curve.pmap_coords(lambda t: t[half:m], cur)
        cur = curve.add(a, b)
        m = half
    windows = curve.pmap_coords(lambda t: t[0], cur)   # [64] points
    return windows.x.limbs, windows.y.limbs, windows.z.limbs


_sharded_cache = {}


def make_sharded_msm(mesh: Mesh):
    """Build a jitted sharded-MSM executable over `mesh`'s AXIS (cached per
    device set — a fresh jit per call would re-trace every MSM)."""
    key = tuple(d.id for d in mesh.devices.flat)
    fn = _sharded_cache.get(key)
    if fn is None:
        fn = jax.jit(jax.shard_map(
            _sharded_msm_body, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(), P(), P()),
            check_vma=False))
        _sharded_cache[key] = fn
    return fn


def sharded_msm(points: Sequence[Affine], scalars: Sequence[int],
                mesh: Mesh) -> Affine:
    """Host API: MSM sharded over every device in `mesh`."""
    n_dev = mesh.devices.size
    n = max(len(points), n_dev)
    # pad so each shard is a power of two
    per = curve._pad_pow2(-(-n // n_dev), minimum=4)
    n = per * n_dev
    pts = list(points) + [None] * (n - len(points))
    sc = [int(s) % fh.R for s in scalars] + [0] * (n - len(scalars))
    pv = curve.from_affine_host(pts)
    digits = jnp.asarray(curve.scalars_to_digits(sc))
    fn = make_sharded_msm(mesh)
    ox, oy, oz = fn(pv.x.limbs, pv.y.limbs, pv.z.limbs, digits)
    out = PointVec(Fp(ox, REDUCED), Fp(oy, REDUCED), Fp(oz, REDUCED))
    return fh.g1_combine_windows(curve.to_affine_host(out),
                                 curve.WINDOW_BITS)


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
