"""CG solver tests (reference src/CGSolver.c behavior).

Oracles: the analytic exact solution of the generated problem (x == 1,
src/CGSolver.c:25-36) and a dense numpy solve of the bundled band matrix.
"""

import numpy as np
import pytest

import jax

from sparsebench_tpu.formats import from_csr
from sparsebench_tpu.host import HostCSR, generate_stencil, read_mm
from sparsebench_tpu.solvers.cg import check_residual, init_vectors, solve_cg

jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize("fmt", ["crs", "sell", "ell", "dia"])
def test_generated_problem_converges_to_exact(fmt):
    csr = generate_stencil(8, 8, 8)
    x0, b, xexact = init_vectors(csr)
    A = from_csr(fmt, csr)
    res = solve_cg(A, b, itermax=200, eps=1e-9, verbose=False)
    err = check_residual(res.x, xexact)
    assert err < 1e-7, f"{fmt}: max|x - 1| = {err}"
    assert res.final_normr <= 1e-9 or res.iterations == 200
    # history starts at ||b|| and decreases overall
    assert res.residual_history[0] > res.residual_history[-1]


def test_band_klein_matches_dense_solve(data_dir):
    csr = HostCSR.from_coo(read_mm(str(data_dir / "matrix_band_klein.mtx")))
    b = np.ones(csr.nr)
    dense = csr.to_dense()
    x_ref = np.linalg.solve(dense, b)
    A = from_csr("sell", csr)
    res = solve_cg(A, b, itermax=400, eps=1e-12, verbose=False)
    np.testing.assert_allclose(res.x, x_ref, rtol=1e-6, atol=1e-8)


def test_histories_agree_across_formats():
    """All formats implement the same math: f64 residual histories must
    agree to ~1e-10 relative (BASELINE.md correctness target)."""
    csr = generate_stencil(8, 8, 8)
    # random rhs: the generated rhs lies in a tiny Krylov space (symmetric
    # stencil + near-constant row sums) and converges exactly within ~15
    # iterations, making histories degenerate
    b = np.random.default_rng(7).standard_normal(csr.nr)
    hists = {}
    for fmt in ("crs", "sell", "ell", "dia"):
        A = from_csr(fmt, csr)
        res = solve_cg(A, b, itermax=60, verbose=False)
        hists[fmt] = res.residual_history
    base = hists["crs"]
    for fmt, h in hists.items():
        # exact-zero convergence iteration may shift by one between formats
        # (different fp reduction orders); compare the common prefix
        assert abs(len(h) - len(base)) <= 1, fmt
        n = min(len(h), len(base))
        np.testing.assert_allclose(
            h[:n], base[:n], rtol=1e-9, atol=1e-12 * base[0], err_msg=fmt
        )


def test_eps_zero_runs_to_itermax():
    csr = generate_stencil(8, 8, 8)
    b = np.random.default_rng(3).standard_normal(csr.nr)
    A = from_csr("crs", csr)
    res = solve_cg(A, b, itermax=25, eps=0.0, verbose=False)
    # reference loop: for k = 1; k < itermax -> itermax-1 iterations, k ends at itermax
    assert res.iterations == 25
    assert len(res.residual_history) == 25


def test_mm_problem_b_ones(test_matrices_dir):
    """Non-generated path: b = 1 (reference initVectors else-branch)."""
    csr = HostCSR.from_coo(read_mm(str(test_matrices_dir / "test0.mtx")))
    # test0 is not symmetric positive definite; just check the solver runs
    # and returns finite history on a general matrix.
    A = from_csr("crs", csr)
    x0, b, xexact = init_vectors(csr, generated=False)
    assert xexact is None
    res = solve_cg(A, b, itermax=5, verbose=False)
    assert np.isfinite(res.residual_history).all()
