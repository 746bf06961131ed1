"""Device-format SpMV correctness vs the host CSR oracle.

Every registered format must reproduce ``HostCSR.spmv`` exactly (f64 on the
CPU test backend) on the Matrix-Market fixtures and generated stencils —
the device analog of the reference's golden SpMV tests
(tests/solver/solverTests.c, SURVEY.md §4).
"""

import jax
import numpy as np
import pytest

from sparsebench_tpu.config import DTypePolicy
from sparsebench_tpu.formats import FORMATS, from_csr
from sparsebench_tpu.formats.dia import DiaMatrix, DiaUnsuitableError
from sparsebench_tpu.host import HostCSR, generate_stencil, read_mm

jax.config.update("jax_enable_x64", True)

POLICY = DTypePolicy.from_names("f64", "i32")
GENERAL_FORMATS = ["crs", "ccrs", "sell", "ell", "bsell"]


def _fixtures(test_matrices_dir):
    for p in sorted(test_matrices_dir.glob("*.mtx")):
        yield p.name, HostCSR.from_coo(read_mm(str(p)))


@pytest.mark.parametrize("fmt", GENERAL_FORMATS)
def test_spmv_fixtures(test_matrices_dir, fmt):
    rng = np.random.default_rng(0)
    for name, csr in _fixtures(test_matrices_dir):
        dm = from_csr(fmt, csr, POLICY)
        x = rng.standard_normal(csr.nc)
        y = np.asarray(jax.jit(dm.spmv)(x))
        np.testing.assert_allclose(y, csr.spmv(x), rtol=1e-12, err_msg=f"{fmt}:{name}")


@pytest.mark.parametrize("fmt", GENERAL_FORMATS + ["dia"])
def test_spmv_stencil(fmt):
    csr = generate_stencil(5, 4, 3)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(csr.nc)
    dm = from_csr(fmt, csr, POLICY)
    y = np.asarray(jax.jit(dm.spmv)(x))
    np.testing.assert_allclose(y, csr.spmv(x), rtol=1e-12)


@pytest.mark.parametrize("C,sigma", [(1, 1), (8, 1), (32, 0), (4, 16)])
def test_sell_params(test_matrices_dir, C, sigma):
    csr = HostCSR.from_coo(read_mm(str(test_matrices_dir / "test8.mtx")))
    dm = from_csr("sell", csr, POLICY, C=C, sigma=sigma)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(csr.nc)
    np.testing.assert_allclose(np.asarray(dm.spmv(x)), csr.spmv(x), rtol=1e-12)


def test_sell_permutation_roundtrip():
    csr = generate_stencil(3, 3, 3)
    dm = from_csr("sell", csr, POLICY, C=4, sigma=0)
    v = np.arange(csr.nr, dtype=np.float64)
    vp = dm.permute_vector(v)
    np.testing.assert_array_equal(np.asarray(dm.unpermute_vector(vp)), v)
    # permuted-space spmv consistency
    x = np.linspace(0, 1, csr.nc)
    y1 = np.asarray(dm.spmv(x))
    y2 = np.asarray(dm.unpermute_vector(dm.spmv_permuted(dm.permute_vector(x))))
    np.testing.assert_allclose(y1, y2, rtol=1e-14)


def test_dia_band_klein(data_dir):
    csr = HostCSR.from_coo(read_mm(str(data_dir / "matrix_band_klein.mtx")))
    dm = DiaMatrix.from_csr(csr, POLICY)
    x = np.linspace(-1, 1, csr.nc)
    np.testing.assert_allclose(np.asarray(dm.spmv(x)), csr.spmv(x), rtol=1e-12)


def test_dia_rejects_wide_matrices(test_matrices_dir):
    csr = HostCSR.from_coo(read_mm(str(test_matrices_dir / "test0.mtx")))
    with pytest.raises(DiaUnsuitableError):
        DiaMatrix.from_csr(csr, POLICY, max_diags=2)


def test_registry_contents():
    for name in ("crs", "ccrs", "sell", "ell", "dia", "bsell"):
        assert name in FORMATS


def test_bsell_windowed_interpret():
    """Windowed-x BSELL kernel (for x too large for VMEM) in interpret mode."""
    from sparsebench_tpu.formats.bsell import BsellMatrix

    csr = generate_stencil(6, 5, 4)
    x = np.random.default_rng(3).standard_normal(csr.nc).astype(np.float32)
    A = from_csr("bsell", csr, DTypePolicy.from_names("f32", "i32"))
    Aw = A.replace(impl="pallas_win_interpret")
    y = np.asarray(Aw.spmv(x))
    np.testing.assert_allclose(y, csr.spmv(x.astype(np.float64)), atol=1e-4)
    Ai = A.replace(impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(Ai.spmv(x)), y, atol=1e-5)
    # chunk-resident windowed variant (single-load row fetches)
    A2 = A.replace(impl="pallas_win2_interpret")
    np.testing.assert_allclose(np.asarray(A2.spmv(x)), y, atol=1e-5)


def test_dia_from_stencil_matches_from_csr():
    """The analytic stencil->DIA builder must reproduce the CSR-built DIA
    exactly (offsets, data, nnz, row counts) including the 7-pt variant,
    boundary ranks of a stacked multi-rank grid, and the degenerate-grid
    CSR fallback."""
    import numpy as np

    from sparsebench_tpu.config import DTypePolicy
    from sparsebench_tpu.formats.dia import DiaMatrix
    from sparsebench_tpu.host import generate_stencil

    policy = DTypePolicy.from_names("f32", "i32")
    cases = [
        dict(dims=(5, 6, 7), use_7pt=False, rank=0, size=1),
        dict(dims=(5, 6, 7), use_7pt=True, rank=0, size=1),
        dict(dims=(1, 2, 3), use_7pt=False, rank=0, size=1),  # CSR fallback
        dict(dims=(4, 5, 3), use_7pt=False, rank=0, size=3),
        dict(dims=(4, 5, 3), use_7pt=False, rank=2, size=3),
    ]
    for case in cases:
        dims = case.pop("dims")
        csr = generate_stencil(*dims, dtype=np.float64, **case)
        B, counts = DiaMatrix.from_stencil(
            *dims, policy=policy, impl="xla", **case
        )
        assert np.array_equal(counts, csr.row_lengths)
        assert B.nnz == csr.nnz
        A = DiaMatrix.from_csr(csr, policy, impl="xla")
        x = np.random.default_rng(7).standard_normal(A.nc).astype(np.float32)
        ya, yb = np.asarray(A.spmv(x)), np.asarray(B.spmv(x))
        np.testing.assert_allclose(ya, yb, rtol=1e-6, atol=1e-6)
        if case.get("size", 1) == 1:
            assert A.offsets == B.offsets
            assert np.array_equal(
                np.asarray(A.data, np.float32), np.asarray(B.data, np.float32)
            )


def test_init_vectors_from_row_counts():
    import numpy as np

    from sparsebench_tpu.host import generate_stencil
    from sparsebench_tpu.solvers.cg import init_vectors

    csr = generate_stencil(4, 4, 4, dtype=np.float64)
    x1, b1, e1 = init_vectors(csr, dtype=np.float64)
    x2, b2, e2 = init_vectors(
        None, dtype=np.float64, row_lengths=csr.row_lengths
    )
    assert np.array_equal(b1, b2) and np.array_equal(e1, e2)


@pytest.mark.parametrize("use_7pt", [False, True])
def test_bsell_from_stencil_matches_from_csr(use_7pt):
    """The on-device stencil->BSELL builder must produce the same SpMV
    results (and nnz/counts) as the CSR-built BSELL on the same problem
    (reference generator src/matrix.c:30-121)."""
    from sparsebench_tpu.formats.bsell import BsellMatrix

    policy = DTypePolicy.from_names("f32", "i32")
    csr = generate_stencil(7, 6, 5, use_7pt=use_7pt, dtype=np.float32)
    A, counts = BsellMatrix.from_stencil(7, 6, 5, use_7pt=use_7pt,
                                         policy=policy)
    assert A.nnz == csr.nnz
    np.testing.assert_array_equal(np.asarray(counts), csr.row_lengths)
    x = np.random.default_rng(11).standard_normal(csr.nc).astype(np.float32)
    want = csr.spmv(x.astype(np.float64))
    got = np.asarray(A.spmv(jax.numpy.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # windowed + whole-x interpret kernels on the device-built arrays
    for impl in ("pallas_win_interpret", "pallas_win2_interpret",
                 "pallas_interpret"):
        got_k = np.asarray(A.replace(impl=impl).spmv(jax.numpy.asarray(x)))
        np.testing.assert_allclose(got_k, want, rtol=1e-5, atol=1e-4)


def test_sell_tpu_bridge_delegate():
    """--fmt sell TPU bridge (VERDICT r3 next #4): with bridge forced on,
    SpMV runs through the BslabMatrix delegate in ORIGINAL row order —
    results must match the unbridged permuted path and the CSR oracle,
    and permuted_output flips to False so solvers skip perm handling."""
    from sparsebench_tpu.formats.bslab import BslabMatrix
    from sparsebench_tpu.formats.sell import SellMatrix

    policy = DTypePolicy.from_names("f32", "i32")
    csr = generate_stencil(6, 5, 4, dtype=np.float32)
    plain = SellMatrix.from_csr(csr, policy, C=4)
    bridged = SellMatrix.from_csr(csr, policy, C=4, bridge=True)
    assert plain.fast is None and plain.permuted_output
    assert isinstance(bridged.fast, BslabMatrix)
    assert not bridged.permuted_output
    x = np.random.default_rng(5).standard_normal(csr.nc).astype(np.float32)
    want = csr.spmv(x.astype(np.float64))
    got_b = np.asarray(bridged.spmv(jax.numpy.asarray(x)))
    got_p = np.asarray(plain.spmv(jax.numpy.asarray(x)))
    np.testing.assert_allclose(got_b, want, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got_p, want, rtol=1e-5, atol=1e-4)
    # the SELL layout arrays (golden-parity surface) are unchanged
    for a, b in zip(plain.vals, bridged.vals):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sell_bridge_cg_solve():
    """A CG solve on a bridged SELL matrix follows the unpermuted path."""
    from sparsebench_tpu.formats.sell import SellMatrix
    from sparsebench_tpu.solvers.cg import init_vectors, solve_cg

    policy = DTypePolicy.from_names("f32", "i32")
    csr = generate_stencil(6, 6, 6, dtype=np.float32)
    A = SellMatrix.from_csr(csr, policy, bridge=True)
    _, b, xexact = init_vectors(csr, dtype=np.float32)
    res = solve_cg(A, b, itermax=60, eps=0.0, verbose=False)
    assert np.abs(res.x - xexact).max() < 1e-4


def test_bsell_with_window_reanchors_exactly():
    """bsell.with_window re-expresses the window-relative block table with
    a forced chunk size; spmv must be bit-identical. The safety floor is
    2W - 8 (stored ids only bound content to [win_base, win_base + 2W))."""
    from sparsebench_tpu.formats.bsell import BsellMatrix, with_window

    policy = DTypePolicy.from_names("f64", "i32")
    csr = generate_stencil(12, 12, 10)
    A = BsellMatrix.from_csr(csr, policy)
    x = np.random.default_rng(3).standard_normal(csr.nc)
    want = np.asarray(A.spmv(jax.numpy.asarray(x)))
    assert with_window(A, A.w_blocks) is A  # no-op fast path
    for target in (2 * A.w_blocks - 8, 2 * A.w_blocks, 4 * A.w_blocks):
        B = with_window(A, target)
        assert B.w_blocks == target
        # absolute block ids (win_base + relative) are preserved
        np.testing.assert_array_equal(
            np.asarray(A.blocks) + np.asarray(A.win_base)[:, :, :1],
            np.asarray(B.blocks) + np.asarray(B.win_base)[:, :, :1],
        )
        # relative ids stay inside the kernel's [0, 2W') gather window
        assert int(np.asarray(B.blocks).max()) < 2 * target
        assert int(np.asarray(B.blocks).min()) >= 0
        np.testing.assert_array_equal(
            np.asarray(B.spmv(jax.numpy.asarray(x))), want
        )
    with pytest.raises(ValueError):
        with_window(A, A.w_blocks - 8)  # below the floor (and a shrink)
    with pytest.raises(ValueError):
        with_window(A, 2 * A.w_blocks - 4)  # not a multiple of 8
