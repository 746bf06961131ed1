"""Weak-scaling validation sweep over virtual device meshes.

BASELINE.md's scaling target — "hpcg/hpcgmm-style per-chip subgrids
across a v5p-32 slice" — cannot be *timed* in this environment (one
physical chip), but everything structural about it CAN be validated:
that the full distributed CG program (row-sharded matrix, ppermute halo
ring, fused psum reductions) compiles and executes at v5p-32 mesh
widths, that its residual history matches the single-device solve to
1e-9 (the BASELINE correctness bar), and that the per-rank communication
volumes behave as weak scaling demands (constant per rank as the mesh
grows, since only subgrid FACES are exchanged).

This tool runs the sweep on virtual CPU meshes
(--xla_force_host_platform_device_count, the same mechanism as the test
suite and __graft_entry__.dryrun_multichip) and writes docs/SCALING.md.
Each mesh width runs in a fresh subprocess because the XLA host device
count is fixed at backend init.

What is measured vs modeled (honesty contract, same as bench.py):
  * parity errors, comm words, collective counts: EXACT — structural
    facts of the compiled program, identical on real hardware;
  * wall-clock on virtual CPU devices: MEANINGLESS — never reported;
  * the ICI time model in SCALING.md is parametric (bytes and collective
    counts are ours; link bandwidth is the reader's datasheet).

Usage:
    python tools/scaling_report.py                 # sweep + SCALING.md
    python tools/scaling_report.py --sizes 4,8
    python tools/scaling_report.py --child 8 ...   # internal (one mesh)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # run as a script: sys.path[0] is tools/
    sys.path.insert(0, REPO)


def child_main(size: int, per_rank: tuple, iters: int) -> dict:
    """Run one mesh width: build, solve, check parity, account comm."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from sparsebench_tpu.config import DTypePolicy
    from sparsebench_tpu.formats import from_csr
    from sparsebench_tpu.host import generate_stencil
    from sparsebench_tpu.parallel.dist import (
        build_distributed,
        dist_solve_cg,
        make_mesh,
    )
    from sparsebench_tpu.parallel.stencil_dist import (
        build_halo_stencil,
        dist_solve_cg_stencil,
    )
    from sparsebench_tpu.solvers.cg import init_vectors, solve_cg

    nx, ny, nz = per_rank
    assert len(jax.devices()) >= size, (
        f"need {size} virtual devices, have {len(jax.devices())}"
    )
    policy = DTypePolicy.from_names("f64", "i32")
    mesh = make_mesh(size)

    # weak-scaled generated problem: each rank owns its own (nx, ny, nz)
    # subgrid stacked along z (reference src/matrix.c:37-41)
    shards = [
        generate_stencil(nx, ny, nz, rank=r, size=size, dtype=np.float64)
        for r in range(size)
    ]
    gcsr = generate_stencil(nx, ny, nz * size, dtype=np.float64)
    _, b, _ = init_vectors(gcsr)
    serial = solve_cg(from_csr("crs", gcsr, policy), b, itermax=iters,
                      verbose=False)
    ref = serial.residual_history

    def parity(res) -> float:
        n = min(len(ref), len(res.residual_history))
        return float(
            np.abs(res.residual_history[:n] - ref[:n]).max() / ref[0]
        )

    out = {"size": size, "rows": int(gcsr.nr), "nnz": int(gcsr.nnz),
           "per_rank": [nx, ny, nz], "iters": iters}

    dm = build_distributed(shards, fmt="sell", policy=policy, mesh=mesh,
                           exchange_backend="ppermute")
    # r5 sweep covers the full DISTRIBUTED variant menu (VERDICT r4
    # next #10; the fused variant is the serial-only stage-A Pallas
    # stencil kernel — solvers/cg.py cg_fused_loop has no halo-exchange
    # seam, so it cannot appear here by design)
    for variant in ("standard", "cs", "pipe"):
        res = dist_solve_cg(dm, b, itermax=iters, eps=0.0, variant=variant,
                            verbose=False)
        out[f"parity_{variant}"] = parity(res)
    # s-step CA-CG compares against the SERIAL s-step solve (its history
    # has NaN slots between outer-step boundaries; same convention as
    # __graft_entry__.dryrun_multichip's cg-sstep leg)
    ss_serial = solve_cg(from_csr("crs", gcsr, policy), b, itermax=iters,
                         variant="sstep", sstep=2, verbose=False)
    res_ss = dist_solve_cg(dm, b, itermax=iters, eps=0.0, variant="sstep",
                           sstep=2, verbose=False)
    hs = ss_serial.residual_history
    hd = res_ss.residual_history
    n_ss = min(len(hs), len(hd))
    m = ~np.isnan(hs[:n_ss])
    out["parity_sstep"] = float(
        np.abs(hd[:n_ss][m] - hs[:n_ss][m]).max() / hs[0])

    # split interior/boundary BSLAB build (the r4 general-format fast
    # path: exchange overlaps the interior slab kernel)
    dm_b = build_distributed(shards, fmt="bslab", policy=policy, mesh=mesh)
    res_b = dist_solve_cg(dm_b, b, itermax=iters, eps=0.0, verbose=False)
    out["parity_bslab"] = parity(res_b)

    # matrix-free z-slab stencil path (zero matrix bytes; plane halos)
    A_mf, _counts = build_halo_stencil(nx, ny, nz, size, value_bytes=8)
    res_mf = dist_solve_cg_stencil(A_mf, size, b, itermax=iters, eps=0.0,
                                   mesh=mesh, verbose=False)
    out["parity_stencil"] = parity(res_mf)

    # IRREGULAR leg: the RGL random-graph Laplacian through the
    # any-matrix partition path (non-ring offsets, uneven halos,
    # allgather backend) — weak-scaled by rows-per-rank
    from sparsebench_tpu.host import HostCSR
    from sparsebench_tpu.host.coo import COOMatrix
    from sparsebench_tpu.host.rgl import rgl_csr
    from sparsebench_tpu.parallel.partition import slice_coo_rows

    n_rgl, band_r = 256 * size, 64
    csr_r = rgl_csr(n_rgl, band=band_r, deg=8.0, seed=7)
    rows_r = np.repeat(np.arange(csr_r.nr), csr_r.row_lengths)
    coo_r = COOMatrix(row=rows_r, col=csr_r.col, val=csr_r.val,
                      nr=n_rgl, nc=n_rgl)
    shards_r = [HostCSR.from_coo(slice_coo_rows(coo_r, r, size))
                for r in range(size)]
    xe = 0.5 + (np.arange(n_rgl) % 97) / 97.0
    b_r = csr_r.spmv(xe)
    serial_r = solve_cg(from_csr("crs", csr_r, policy), b_r,
                        itermax=iters, verbose=False)
    dm_r = build_distributed(shards_r, fmt="bslab", policy=policy,
                             mesh=mesh, exchange_backend="allgather")
    res_r = dist_solve_cg(dm_r, b_r, itermax=iters, eps=0.0, verbose=False)
    n2 = min(len(serial_r.residual_history), len(res_r.residual_history))
    out["parity_rgl"] = float(
        np.abs(res_r.residual_history[:n2]
               - serial_r.residual_history[:n2]).max()
        / serial_r.residual_history[0]
    )
    w_r = dm_r.part.plan.comm_words_per_shard
    out["rgl_comm_words_per_rank"] = {
        "min": int(w_r.min()), "max": int(w_r.max()),
        "avg": float(w_r.mean()),
    }

    # exact communication structure from the exchange plan
    plan = dm.part.plan
    words = plan.comm_words_per_shard  # send+recv words per iteration
    out["halo_max_words"] = int(plan.halo_max)
    out["comm_words_per_rank"] = {
        "min": int(words.min()), "max": int(words.max()),
        "avg": float(words.mean()),
    }
    out["ring_offsets"] = [int(d) for d in plan.offsets]
    # psum payloads per iteration (DESIGN.md latency menu)
    out["allreduce_per_iter"] = {"standard": 2, "cs": 1}
    # stencil path: one xy plane to each z neighbor
    out["stencil_plane_words"] = nx * ny
    return out


def render_markdown(rows: list, per_rank: tuple, iters: int) -> str:
    nx, ny, nz = per_rank
    lines = [
        "# Weak scaling across virtual device meshes",
        "",
        "BASELINE.md target: *\"Weak scaling: hpcg/hpcgmm-style per-chip "
        "subgrids across a v5p-32 slice.\"* One physical chip is available "
        "in this environment, so this artifact validates everything about "
        "that target except wall-clock: the sweep below ran the FULL "
        "distributed CG program — row-sharded matrix pytree, ppermute "
        "ring halo exchange, fused psum reductions, one `shard_map`ped "
        "jit — on virtual CPU meshes (`--xla_force_host_platform_"
        "device_count`, the test suite's mechanism) at every width "
        "through 32, plus the matrix-free z-slab stencil path.",
        "",
        f"Workload: weak-scaled 27-pt generated problem, {nx}x{ny}x{nz} "
        f"per rank stacked along z (reference `src/matrix.c:37-41`), "
        f"f64, {iters} iterations. Parity = max relative deviation of "
        "the distributed residual history from the single-device solve "
        "(BASELINE bar: 1e-9).",
        "",
        "Regenerate: `python tools/scaling_report.py` (writes this "
        "file); CI-checks in `tests/test_scaling_report.py`.",
        "",
        "## Measured sweep (exact structural facts)",
        "",
        "| mesh | rows | parity std | parity cs | parity pipe "
        "| parity sstep | parity bslab | parity stencil | parity rgl "
        "| halo words/rank | exch words/iter/rank (min/avg/max) "
        "| ring offsets |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]

    def _p(r, key):
        return f"{r[key]:.1e}" if key in r else "-"

    for r in rows:
        cw = r["comm_words_per_rank"]
        lines.append(
            f"| {r['size']} | {r['rows']} | {r['parity_standard']:.1e} "
            f"| {r['parity_cs']:.1e} | {_p(r, 'parity_pipe')} "
            f"| {_p(r, 'parity_sstep')} | {_p(r, 'parity_bslab')} "
            f"| {r['parity_stencil']:.1e} | {_p(r, 'parity_rgl')} "
            f"| {r['halo_max_words']} "
            f"| {cw['min']}/{cw['avg']:.0f}/{cw['max']} "
            f"| {r['ring_offsets']} |"
        )
    sample = rows[-1]
    plane = sample["stencil_plane_words"]
    lines += [
        "",
        "Reading the table:",
        "",
        "* **Parity** stays at f64 rounding (<= 1e-9 of the initial "
        "residual) at every width — mesh collectives reproduce the "
        "serial Krylov trajectory. This is the BASELINE correctness "
        "bar, held to 32 'chips'.",
        "* **Per-rank exchange volume is constant** from 4 ranks up "
        "(interior ranks exchange two subgrid faces regardless of mesh "
        "width) — the signature of weak scaling. Totals grow linearly "
        "with the mesh; per-link ICI traffic does not.",
        "* **Ring offsets stay {+1, size-1}** — i.e. {+1, -1} mod size: "
        "block-row partitions of the z-stacked stencil only talk to "
        "nearest neighbors, so every exchange rides one ICI hop (the "
        "reference's `MPI_Dist_graph_create` locality, "
        "`src/comm.c:540-548`).",
        "* **Every distributed solve path scales**: the cs/pipe/sstep "
        "variants and the split interior/boundary bslab build (exchange "
        "overlapped with the interior slab kernel) hold the same parity "
        "bar (the `fused` variant is the serial-only stage-A Pallas "
        "stencil kernel — no halo seam by design); the "
        "`rgl` column runs the irregular random-graph Laplacian "
        "(weak-scaled at 256 rows/rank, band 64) through the any-matrix "
        "partition path with the allgather backend — the reference's "
        "hardest code path (`src/comm.c:414-625`).",
        "",
        "## Per-iteration cost model (parametric — apply your link specs)",
        "",
        "With the stored-format path, each CG iteration moves per rank:",
        "",
        f"* halo exchange: `exch_words x 8 B` (f64; table above — e.g. "
        f"{sample['comm_words_per_rank']['max']} words at width "
        f"{sample['size']}) over +-1 ICI hops, as 2 `ppermute` "
        "rotations;",
        "* allreduce: 2 sequential scalar `psum`s (standard CG) or 1 "
        "fused 2-scalar `psum` (`--cg-variant cs`); `pipe` overlaps it "
        "with the matvec, `sstep` amortizes one gram psum over s "
        "iterations (DESIGN.md latency menu);",
        f"* matrix-free stencil path: one {plane}-word xy plane to each "
        "z neighbor (2 ppermutes), zero matrix bytes.",
        "",
        "Time model per iteration: "
        "`t = spmv_bytes/BW_hbm + exch_bytes/BW_ici + n_psum x L_ring` "
        "where `L_ring` is the mesh-wide scalar-allreduce latency. All "
        "byte and count terms are exact from this sweep; bandwidths and "
        "latency come from the target platform's datasheet (nominal "
        "v5e: 819 GB/s HBM; v5p: 2765 GB/s HBM — the ICI terms are why "
        "the cs/pipe/sstep variants exist).",
        "",
    ]
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2,4,8,16,32")
    ap.add_argument("--per-rank", default="16,16,4",
                    help="nx,ny,nz per rank (weak scaling stacks z)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "SCALING.md"))
    ap.add_argument("--json", default=None,
                    help="also write the raw per-size JSON rows here")
    ap.add_argument("--child", type=int, default=None,
                    help="internal: run one mesh width, print JSON")
    args = ap.parse_args()
    per_rank = tuple(int(v) for v in args.per_rank.split(","))

    if args.child is not None:
        print(json.dumps(child_main(args.child, per_rank, args.iters)))
        return 0

    rows = []
    for size in (int(s) for s in args.sizes.split(",")):
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""   # never dial the TPU relay
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        flags = " ".join(
            f for f in flags.split()
            if "xla_force_host_platform_device_count" not in f
        )
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={size}"
        ).strip()
        print(f"[scaling] mesh width {size} ...", file=sys.stderr,
              flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(size), "--per-rank", args.per_rank,
             "--iters", str(args.iters)],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=1800,
        )
        if proc.returncode != 0:
            print(proc.stdout, file=sys.stderr)
            print(proc.stderr, file=sys.stderr)
            raise SystemExit(f"mesh width {size} failed")
        rows.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        p = rows[-1]
        print(f"[scaling] width {size}: parity std {p['parity_standard']:.1e}"
              f" cs {p['parity_cs']:.1e} stencil {p['parity_stencil']:.1e}",
              file=sys.stderr, flush=True)

    md = render_markdown(rows, per_rank, args.iters)
    with open(args.out, "w") as f:
        f.write(md)
    if args.json:
        with open(args.json, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
