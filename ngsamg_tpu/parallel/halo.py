"""Explicit halo-exchange SpMV over a device mesh (shard_map + ppermute).

TPU-native replacement for the reference's hybrid-matrix machinery: NgsAMG
splits each parallel matrix into owned + ghost couplings and overlaps
Gauss-Seidel with MPI halo exchange
(/root/reference/src/base/linalg/hybrid_matrix.hpp:28-144,
src/base/linalg/dcc_map.hpp:20-134, hybrid_base_smoother.hpp:56-61). On TPU
the same structure becomes: rows block-partitioned over a 1-D mesh axis,
each shard holding its contiguous row slice of a banded (DIA) operator;
matvec needs only a halo of `halo_width` entries from each neighbor, moved
with two `jax.lax.ppermute` shifts over ICI, while the interior FMA work
proceeds on data already local.

This is the bandwidth-scalable alternative to the GSPMD all-gather path in
:mod:`ngsamg_tpu.parallel.shard`: communication volume is O(halo) instead of
O(n), exactly like the reference's interface-only DCC exchanges.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sparse.formats import DiaMatrix


def dia_halo_matvec(A: DiaMatrix, mesh: Mesh, axis: str = "rows"):
    """Build a shard_map'd matvec closure for a row-sharded DiaMatrix.

    The returned function maps (data_local, x_local) -> y_local under
    shard_map; `A.data` must be sharded (None, axis) and x (axis, None).
    Requires nrows_pad divisible by the mesh size and halo width (the max
    |offset|) not exceeding one shard.
    """
    nshards = mesh.devices.size
    n = A.nrows_pad
    assert n % nshards == 0
    local = n // nshards
    lo = max(0, -min(A.offsets))
    hi = max(0, max(A.offsets))
    if max(lo, hi) > local:
        raise ValueError("halo wider than one shard; replicate this level")
    offsets = A.offsets

    def body(data, x):
        # data: (ndiag, local); x: (local, 1)
        xf = x[:, 0]
        # halo exchange: left neighbor's tail and right neighbor's head.
        # ppermute cyclically; the wrap-around halo is masked off below.
        idx = jax.lax.axis_index(axis)
        right_src = [(i, (i + 1) % nshards) for i in range(nshards)]
        left_src = [((i + 1) % nshards, i) for i in range(nshards)]
        tail = jax.lax.ppermute(xf[-lo:], axis, right_src) if lo else None
        head = jax.lax.ppermute(xf[:hi], axis, left_src) if hi else None
        if tail is not None:
            tail = jnp.where(idx == 0, 0.0, tail)  # no left neighbor
        if head is not None:
            head = jnp.where(idx == nshards - 1, 0.0, head)
        parts = [p for p in (tail, xf, head) if p is not None]
        xp = jnp.concatenate(parts)
        y = jnp.zeros_like(xf)
        for d, off in enumerate(offsets):
            y = y + data[d] * jax.lax.dynamic_slice_in_dim(
                xp, lo + off, local
            )
        return y[:, None]

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(axis, None),
    )
    return fn


def demo_sharded_solve(n_devices: int = 8, n: int = 24):
    """End-to-end check: halo-exchange DIA SpMV == replicated SpMV."""
    from ..sparse import formats
    from ..utils import fem

    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("rows",))
    p = fem.poisson_3d(n)
    A = formats.dia_from_scipy(
        p.A, jnp.float32, row_align=8 * n_devices, use_pallas=False
    )
    x = np.random.default_rng(0).standard_normal(A.nrows_pad)
    xs = jax.device_put(
        jnp.asarray(x[:, None], jnp.float32),
        NamedSharding(mesh, P("rows", None)),
    )
    data_s = jax.device_put(
        A.data, NamedSharding(mesh, P(None, "rows"))
    )
    fn = dia_halo_matvec(A, mesh)
    y = jax.jit(fn)(data_s, xs)
    ref = p.A @ x[: p.n]
    err = np.abs(np.asarray(y[: p.n, 0]) - ref).max() / np.abs(ref).max()
    return float(err)


# ---------------------------------------------------------------------------
# interface-halo SpMV for unstructured (tile-ELL) levels
# ---------------------------------------------------------------------------


def plan_tile_halo(cols: np.ndarray, nrows_pad: int, n_shards: int):
    """Owner/ghost split of a row-sharded TileELL's columns (host).

    The DCC-map analog (dcc_map.hpp:20-134) for unstructured levels: each
    shard owns a contiguous row block; columns outside it are GHOSTS.
    Every shard contributes its interface rows (the union of all other
    shards' ghost needs) to one padded all-gather buffer — communication
    is O(total interface), not O(n) as under the GSPMD all-gather of x.

    Returns (new_cols (T, K) int32 into [local_n + nsh*Smax),
             send_idx (n_shards, Smax) int32 LOCAL row indices, Smax).
    """
    T, K = cols.shape
    assert nrows_pad % n_shards == 0 and T % n_shards == 0
    local = nrows_pad // n_shards
    Tl = T // n_shards
    owner = (cols // local).astype(np.int64)
    # single sort/unique pass over (owner, col) pairs: ghost entries are
    # slots whose column's owner differs from the reading shard
    reader = np.repeat(
        np.arange(T, dtype=np.int64) // Tl, K
    )
    flat_c = cols.ravel().astype(np.int64)
    flat_o = owner.ravel()
    gh_flat = flat_o != reader
    keys = np.unique(flat_o[gh_flat] * np.int64(nrows_pad) + flat_c[gh_flat])
    key_owner = keys // nrows_pad
    key_col = keys % nrows_pad
    counts = np.bincount(key_owner, minlength=n_shards)
    starts = np.concatenate([[0], np.cumsum(counts)])
    Smax = max(int(counts.max(initial=0)), 1)
    send_idx = np.zeros((n_shards, Smax), dtype=np.int32)
    for t in range(n_shards):
        lst = key_col[starts[t]:starts[t + 1]]
        send_idx[t, : len(lst)] = (lst - t * local).astype(np.int32)
    # remap columns: local -> [0, local); ghost g owned by t at position
    # p within owner t's (sorted) send list -> local + t*Smax + p
    new_cols = (flat_c - flat_o * local).astype(np.int64)
    if gh_flat.any():
        pos = np.searchsorted(keys, flat_o[gh_flat] * np.int64(nrows_pad)
                              + flat_c[gh_flat])
        new_cols[gh_flat] = (
            local + flat_o[gh_flat] * Smax + (pos - starts[flat_o[gh_flat]])
        )
    return (
        new_cols.reshape(T, K).astype(np.int32), send_idx, int(Smax)
    )


from dataclasses import dataclass
from functools import partial


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "cols", "send"],
    meta_fields=[
        "mesh", "axes", "nrows", "nrows_pad", "ncols_pad", "tile_m",
        "smax", "nsh",
    ],
)
@dataclass(frozen=True)
class HaloTileELL:
    """Row-sharded TileELL whose matvec is a shard_map with
    INTERFACE-ONLY exchange — the production-cycle form of
    :func:`tile_halo_matvec`.

    Each shard holds its contiguous tile rows; ``cols`` are REMAPPED to
    [0, local) for owned columns and [local, local + nsh*smax) for ghost
    slots; ``send`` lists the interface rows every shard contributes to
    one padded all-gather buffer. Communication per apply is
    ``nsh * smax`` gathered scalars — O(interface), not O(n) like the
    GSPMD all-gather of x. This is the reference's hybrid-matrix +
    DCC-exchange structure (hybrid_matrix.hpp:28-144, dcc_map.hpp:20-134)
    compiled into the cycle: `parallel/shard.py::shard_operator` builds it
    for fully-row-sharded TileELL levels, so sharded unstructured solves
    run interface exchanges in production, not just in a standalone
    primitive.
    """

    data: jax.Array  # (T, K, M) sharded P(axes, None, None)
    cols: jax.Array  # (T, K) int32 remapped, sharded P(axes, None)
    send: jax.Array  # (nsh, smax) int32 local rows, sharded P(axes, None)
    mesh: Mesh
    axes: tuple  # mesh axis names the rows are sharded over
    nrows: int
    nrows_pad: int
    ncols_pad: int
    tile_m: int
    smax: int
    nsh: int

    @property
    def shape(self):
        return self.nrows, self.ncols_pad

    @property
    def comm_per_apply(self) -> int:
        """Gathered scalars per matvec (the O(interface) volume)."""
        return self.nsh * self.smax

    def halo_matvec(self, x: jax.Array) -> jax.Array:
        def body(data, cols_l, send_l, xl):
            xf = xl[:, 0]
            xs = xf[send_l[0]]  # (smax,) this shard's interface values
            buf = jax.lax.all_gather(xs, self.axes)
            xp = jnp.concatenate([xf, buf.reshape(-1)])
            g = xp[cols_l]  # (Tl, K)
            y = jnp.einsum(
                "tkm,tk->tm", data, g,
                preferred_element_type=data.dtype,
            )
            return y.reshape(-1, 1)

        ax = self.axes
        fn = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(
                P(ax, None, None), P(ax, None), P(ax, None), P(ax, None),
            ),
            out_specs=P(ax, None),
            check_vma=False,
        )
        return fn(self.data, self.cols, self.send, x)[: self.nrows_pad]

    def __matmul__(self, x):
        return self.halo_matvec(x)


def halo_tile_ell(A, mesh: Mesh, axes: tuple) -> HaloTileELL:
    """Build a :class:`HaloTileELL` from a (host-readable) TileELL.

    ``axes`` are the mesh axis names whose product is the row-shard
    count. Pulls ``A.cols`` to host for the one-time plan — multi-chip
    placement happens from the controller, where the arrays are staged.
    """
    nsh = int(
        np.prod(
            [dict(zip(mesh.axis_names, mesh.devices.shape))[a] for a in axes]
        )
    )
    cols = np.asarray(A.cols)
    new_cols, send_idx, smax = plan_tile_halo(cols, A.nrows_pad, nsh)
    sh3 = NamedSharding(mesh, P(axes, None, None))
    sh2 = NamedSharding(mesh, P(axes, None))
    return HaloTileELL(
        data=jax.device_put(A.data, sh3),
        cols=jax.device_put(new_cols, sh2),
        send=jax.device_put(send_idx, sh2),
        mesh=mesh,
        axes=tuple(axes),
        nrows=A.nrows,
        nrows_pad=A.nrows_pad,
        ncols_pad=A.ncols_pad,
        tile_m=A.tile_m,
        smax=smax,
        nsh=nsh,
    )


def tile_halo_matvec(A, mesh: Mesh, axis: str = "rows"):
    """shard_map'd TileELL matvec with interface-only exchange.

    Returns (fn, data_sharded, cols_sharded, send_sharded, comm_per_apply)
    where fn(data, cols, send, x) -> y under the mesh, and comm_per_apply
    is the gathered element count (n_shards * Smax) — O(interface).
    """
    nsh = mesh.devices.size
    cols = np.asarray(A.cols)
    new_cols, send_idx, Smax = plan_tile_halo(cols, A.nrows_pad, nsh)
    local = A.nrows_pad // nsh

    def body(data, cols_l, send_l, x):
        xf = x[:, 0]
        xs = xf[send_l[0]]  # (Smax,) this shard's interface values
        buf = jax.lax.all_gather(xs, axis)  # (nsh, Smax)
        xp = jnp.concatenate([xf, buf.reshape(-1)])
        g = xp[cols_l]  # (Tl, K)
        y = jnp.einsum(
            "tkm,tk->tm", data, g,
            preferred_element_type=data.dtype,
        )
        return y.reshape(-1, 1)[:local]

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    sh_rows = NamedSharding(mesh, P(axis))
    sh_rows2 = NamedSharding(mesh, P(axis, None))
    data_s = jax.device_put(np.asarray(A.data), sh_rows)
    cols_s = jax.device_put(new_cols, sh_rows)
    send_s = jax.device_put(send_idx, sh_rows2)
    return fn, data_s, cols_s, send_s, nsh * Smax
