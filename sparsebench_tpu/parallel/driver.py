"""CLI driver for mesh-sharded runs (the --shards path of the CLI).

Mirrors the reference's MPI execution flow (src/main.c:83-230 under
mpirun): per-shard ingest -> partition -> format conversion -> distributed
solve -> report, except all shards are planned by one host process driving
the device mesh.
"""

from __future__ import annotations

import time

import numpy as np

from sparsebench_tpu.config import DTypePolicy, Parameter
from sparsebench_tpu.parallel.dist import build_distributed, dist_solve_cg
from sparsebench_tpu.profiler import HLINE, Profiler, Region


class MeshCommInfo:
    """Adapter feeding the profiler's multi-rank report (reference
    profiler.c:47-124): per-shard communication volumes from the exchange
    plan. One host clock drives the mesh, so per-shard walltimes coincide."""

    def __init__(self, plan, policy: DTypePolicy):
        self.size = plan.size
        self.plan = plan
        self.value_bytes = policy.value_bytes

    def comm_volumes(self):
        return list(self.plan.comm_words_per_shard)


def run_distributed(param: Parameter, policy: DTypePolicy, args) -> int:
    import jax

    from sparsebench_tpu.cli import init_matrix
    from sparsebench_tpu.solvers.cg import check_residual

    size = param.shards
    if len(jax.devices()) < size:
        raise SystemExit(
            f"--shards {size} needs {size} devices, have {len(jax.devices())} "
            "(tests use XLA_FLAGS=--xla_force_host_platform_device_count=N)"
        )
    generated = param.filename in ("generate", "generate7P")

    t0 = time.perf_counter()
    shards = [init_matrix(param, rank=r, size=size) for r in range(size)]
    dm = build_distributed(
        shards,
        fmt=param.fmt,
        policy=policy,
        C=param.chunk_height,
        sigma=param.sigma,
        exchange_backend=param.exchange,
    )
    print(f"Setup took {time.perf_counter() - t0:.2f}s")
    from sparsebench_tpu.debug import maybe_dump_partition

    maybe_dump_partition(dm.part)  # SB_VERBOSE: out-<shard>.txt dumps
    plan = dm.part.plan
    print(
        f"Partition: {size} shards x {plan.nr_max} rows, halo {plan.halo_max}, "
        f"ring offsets {list(plan.offsets)}"
    )

    # rhs in original global order (reference initVectors per rank)
    if generated:
        b = np.concatenate(
            [27.0 - (s.row_lengths - 1) for s in shards]
        ).astype(policy.value)
        xexact = np.ones(b.shape[0], dtype=policy.value)
    else:
        b = np.ones(dm.part.total_nr, dtype=policy.value)
        xexact = None

    if param.bench == "cg":
        print("Test type: CG")
        res = dist_solve_cg(dm, b, itermax=param.itermax, eps=param.eps)
    elif param.bench == "cheb":
        from sparsebench_tpu.parallel.dist import dist_solve_chebyshev

        print("Test type: CHEBFD")
        res = dist_solve_chebyshev(dm, b, itermax=param.itermax, eps=param.eps)
    elif param.bench == "gmres":
        from sparsebench_tpu.parallel.dist import dist_solve_gmres

        print("Test type: GMRES")
        res = dist_solve_gmres(dm, b, itermax=param.itermax, eps=param.eps)
    elif param.bench == "spmv":
        import numpy as _np

        from sparsebench_tpu.parallel.dist import dist_spmv

        print("Test type: SPMVM")
        x = _np.ones(dm.part.total_nr, dtype=policy.value)
        y = dist_spmv(dm, x)  # compile warm-up
        t0 = time.perf_counter()
        iters = max(param.itermax - 1, 1)  # reference main.c:213-215
        for _ in range(iters):
            y = dist_spmv(dm, x)
        dt = (time.perf_counter() - t0) / iters
        print(f"spMVM per-iteration time: {dt * 1e3:.3f} ms "
              f"(includes host dispatch per call)")
        return 0
    else:
        raise SystemExit(
            f"distributed bench type {param.bench!r} not supported"
        )
    if xexact is not None:
        diff = check_residual(res.x, xexact)
        print(f"Difference between computed and exact  = {diff:f}")

    # communication volume report (reference profiler.c:105-123)
    comm = MeshCommInfo(plan, policy)
    print(HLINE)
    print("Communication")
    print("rank\tkB")
    total = 0.0
    for i, words in enumerate(comm.comm_volumes()):
        kb = 1.0e-3 * words * policy.value_bytes
        print(f"{i} {kb:11.2f}")
        total += kb
    print(f"Total data volume {total:.2f} kB")
    print(HLINE)
    return 0
