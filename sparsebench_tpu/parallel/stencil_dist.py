"""Distributed matrix-free stencil CG: z-slab SPMD over the device mesh.

The weak-scaling generated problem stacks each rank's (nx, ny, nz)
subgrid along z (reference src/matrix.c:37-41), so the natural mesh
decomposition is one z-slab per device and the halo is exactly ONE
xy-plane per neighbor — the matrix-free analog of the reference's
compacted external tail (comm.c:96-110). Per CG iteration the collective
structure is identical to the stored-matrix path (2 scalar psums + 1
halo exchange, comm.c:627-662), but the exchange is two nearest-neighbor
``lax.ppermute`` plane shifts riding the ICI ring, and the local apply
streams zero matrix bytes (formats/stencil.py factorization).

The halo tail convention: a local working vector has length
nc = nr + 2*plane, tail = [plane received from rank-1 (the z-below
neighbor's LAST plane), plane received from rank+1 (the z-above
neighbor's FIRST plane)]. Edge shards keep zeros there — ppermute
zero-fills non-receiving shards, which is exactly the generator's
global-boundary truncation.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import PartitionSpec as P

from sparsebench_tpu.config import DTypePolicy
from sparsebench_tpu.formats.stencil import _sum3, stencil_row_counts
from sparsebench_tpu.parallel.dist import AXIS, make_mesh
from sparsebench_tpu.parallel.exchange import make_allsum
from sparsebench_tpu.solvers.cg import CGResult, cg_cs_loop, cg_loop


@struct.dataclass
class HaloStencilOperator:
    """Per-shard matrix-free apply over the halo-extended z-slab. All
    fields are static (zero array leaves) — inside shard_map it is a
    closure, never an operand."""

    nx: int = struct.field(pytree_node=False)
    ny: int = struct.field(pytree_node=False)
    nz: int = struct.field(pytree_node=False)
    use_7pt: bool = struct.field(pytree_node=False)
    nr: int = struct.field(pytree_node=False)
    nc: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    start_row: int = struct.field(pytree_node=False, default=0)
    total_nr: int = struct.field(pytree_node=False, default=0)
    total_nnz: int = struct.field(pytree_node=False, default=0)
    impl: str = struct.field(pytree_node=False, default="xla")

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        nz, ny, nx = self.nz, self.ny, self.nx
        plane = nx * ny
        v3 = x[: self.nr].reshape(nz, ny, nx)
        up = x[self.nr : self.nr + plane].reshape(1, ny, nx)
        dn = x[self.nr + plane : self.nr + 2 * plane].reshape(1, ny, nx)
        ext = jnp.concatenate([up, v3, dn], axis=0)  # (nz+2, ny, nx)
        if self.use_7pt:
            sxy = _sum3(v3, 1) + _sum3(v3, 2)
            sz = ext[0:nz] + ext[1 : nz + 1] + ext[2 : nz + 2]
            y = jnp.asarray(30.0, v3.dtype) * v3 - (sxy + sz)
        else:
            t = _sum3(_sum3(ext, 2), 1)
            s = t[0:nz] + t[1 : nz + 1] + t[2 : nz + 2]
            y = jnp.asarray(28.0, v3.dtype) * v3 - s
        return y.reshape(-1)


def make_plane_exchange(nr: int, plane: int, size: int, axis: str = AXIS):
    """Fill the 2-plane halo tail from the z-neighbors: two nearest-
    neighbor ppermutes (the reference's MPI_Neighbor_alltoallv over the
    dist-graph, comm.c:627-651 — banded partitions only ever talk to ring
    neighbors, SURVEY §5)."""
    up_perm = [(i, i + 1) for i in range(size - 1)]
    dn_perm = [(i + 1, i) for i in range(size - 1)]

    def exchange(p):
        up = jax.lax.ppermute(p[nr - plane : nr], axis, up_perm)
        dn = jax.lax.ppermute(p[:plane], axis, dn_perm)
        return jnp.concatenate([p[:nr], up, dn])

    return exchange


def build_halo_stencil(nx: int, ny: int, nz: int, size: int,
                       use_7pt: bool = False):
    """(operator, global row_counts) for the z-stacked ``size``-rank
    problem; counts feed b = 27 - (nnzrow - 1) (src/CGSolver.c:25-36)."""
    nr = nx * ny * nz
    counts = stencil_row_counts(nx, ny, nz * size, use_7pt)
    nnz = int(counts.sum())
    A = HaloStencilOperator(
        nx=nx, ny=ny, nz=nz, use_7pt=use_7pt, nr=nr,
        nc=nr + 2 * nx * ny, nnz=nnz, total_nr=nr * size, total_nnz=nnz,
    )
    return A, counts


def dist_spmv_stencil(A: HaloStencilOperator, size: int,
                      x_global: np.ndarray, mesh=None) -> np.ndarray:
    """One exchanged SpMV over the mesh (testing/parity oracle)."""
    mesh = mesh if mesh is not None else make_mesh(size)
    plane = A.nx * A.ny
    exchange = make_plane_exchange(A.nr, plane, size)

    def local(x):
        xl = jnp.concatenate([x[0], jnp.zeros(2 * plane, x.dtype)])
        return A.spmv(exchange(xl))[None]

    fn = jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=(P(AXIS),),
                      out_specs=P(AXIS), check_vma=False)
    )
    xs = np.asarray(x_global, dtype=np.float32).reshape(size, A.nr)
    return np.asarray(fn(jnp.asarray(xs))).reshape(-1)


def dist_solve_cg_stencil(
    A: HaloStencilOperator,
    size: int,
    b_global: np.ndarray,
    *,
    itermax: int = 150,
    eps: float = 0.0,
    variant: str = "standard",
    inv_diag: np.ndarray = None,
    mesh=None,
    verbose: bool = True,
) -> CGResult:
    """Distributed matrix-free CG: ONE jitted shard_map program (same
    collective structure as dist_solve_cg — 2 psums + 1 plane exchange
    per iteration; 1 fused psum with variant="cs")."""
    mesh = mesh if mesh is not None else make_mesh(size)
    plane = A.nx * A.ny
    exchange = make_plane_exchange(A.nr, plane, size)
    allsum = make_allsum(AXIS)
    loop = partial(
        cg_cs_loop if variant == "cs" else cg_loop,
        itermax=itermax, exchange=exchange, allsum=allsum,
    )

    b_st = jnp.asarray(np.asarray(b_global).reshape(size, A.nr))
    x0_st = jnp.zeros_like(b_st)
    md_st = (
        jnp.asarray(np.asarray(inv_diag, dtype=b_st.dtype).reshape(size, A.nr))
        if inv_diag is not None else None
    )

    def local_fn(b, x0, eps_s, md):
        x, k, hist = loop(A, b[0], x0[0], eps=eps_s,
                          inv_diag=None if md is None else md[0])
        return x[None], k, hist

    shard_fn = jax.jit(
        jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(),
                      P() if md_st is None else P(AXIS)),
            out_specs=(P(AXIS), P(), P()),
            check_vma=False,
        )
    )

    eps_arr = jnp.asarray(eps, dtype=b_st.dtype)
    x_dev, k_dev, hist_dev = shard_fn(b_st, x0_st, eps_arr, md_st)
    int(k_dev)  # warm-up + sync
    t0 = time.perf_counter()
    x_dev, k_dev, hist_dev = shard_fn(b_st, x0_st, eps_arr, md_st)
    k = int(k_dev)  # scalar readback = reliable sync (see cg.py)
    t1 = time.perf_counter()
    hist = np.asarray(hist_dev)

    if verbose:
        print(f"Initial Residual = {hist[0]:E}")
        print_freq = min(max(itermax // 10, 1), 50)
        for j in range(1, k):
            if j % print_freq == 0 or j + 1 == itermax:
                print(f"Iteration = {j} Residual = {hist[j]:E}")
        print(f"Solution performed {k} iterations and took {t1 - t0:.2f}s")

    return CGResult(
        x=np.asarray(x_dev).reshape(-1),
        iterations=k,
        residual_history=hist[:k],
        final_normr=float(hist[k - 1] if k > 1 else hist[0]),
        solve_seconds=t1 - t0,
    )


def run_distributed_stencil(param, policy: DTypePolicy, args) -> int:
    """CLI driver for --fmt stencil --shards N (generated problems only).
    Mirrors run_distributed's report shape (parallel/driver.py)."""
    from sparsebench_tpu.profiler import HLINE, Profiler, trace
    from sparsebench_tpu.solvers.cg import check_residual

    if param.filename not in ("generate", "generate7P"):
        raise SystemExit(
            "--fmt stencil is matrix-free and applies to generated "
            "problems only (filename = generate|generate7P)"
        )
    if param.bench not in ("cg",):
        raise SystemExit(
            "--fmt stencil under --shards supports -t cg; use dia/bslab "
            "for the other distributed bench types"
        )
    for flag, msg in (("profile", "--profile"), ("checkpoint", "--checkpoint"),
                      ("rcm", "--rcm"), ("impl", "--impl")):
        if getattr(args, flag, None):
            raise SystemExit(
                f"{msg} combines with the stored-format distributed paths; "
                "--fmt stencil streams no matrix and has one implementation"
            )
    size = param.shards
    if len(jax.devices()) < size:
        raise SystemExit(
            f"--shards {size} needs {size} devices, have {len(jax.devices())}"
        )

    t0 = time.perf_counter()
    A, counts = build_halo_stencil(
        param.nx, param.ny, param.nz, size,
        use_7pt=param.filename == "generate7P",
    )
    print(f"Setup took {time.perf_counter() - t0:.2f}s (format stencil, "
          f"matrix-free)")
    plane = param.nx * param.ny
    print(f"Partition: {size} z-slabs x {A.nr} rows, halo {2 * plane}")

    b = (27.0 - (counts - 1)).astype(policy.value)
    xexact = np.ones(A.total_nr, dtype=policy.value)
    inv_diag = None
    if getattr(args, "precond", "none") == "jacobi":
        inv_diag = np.full(A.total_nr, 1.0 / 27.0, dtype=policy.value)
        print("Preconditioner: Jacobi")

    prof = Profiler()
    prof.init_factors(A.total_nr, 27 * A.total_nr, policy.value_bytes,
                      policy.index_bytes)
    with trace(getattr(args, "trace", None)):
        print("Test type: CG")
        res = dist_solve_cg_stencil(
            A, size, b, itermax=param.itermax, eps=param.eps,
            variant=getattr(args, "cg_variant", "standard"),
            inv_diag=inv_diag,
        )
        print(prof.report_aggregate(res.iterations, res.solve_seconds))
    diff = check_residual(res.x, xexact)
    print(f"Difference between computed and exact  = {diff:f}")
    print(HLINE)
    print("Communication")
    print("rank\tkB")
    total = 0.0
    for i in range(size):
        neighbors = (1 if size > 1 else 0) * ((i > 0) + (i < size - 1))
        kb = 1.0e-3 * plane * neighbors * policy.value_bytes
        print(f"{i} {kb:11.2f}")
        total += kb
    print(f"Total data volume {total:.2f} kB")
    print(HLINE)
    return 0
