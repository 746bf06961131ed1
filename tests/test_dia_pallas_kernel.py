"""DIA Pallas kernel logic tests (interpreter mode on CPU).

The compiled kernel is exercised on real TPU by bench.py; these validate
the shift/roll/carry logic (ops/dia_pallas.py) against the CSR oracle.
"""

import numpy as np
import pytest

from sparsebench_tpu.config import DTypePolicy
from sparsebench_tpu.formats.dia import DiaMatrix
from sparsebench_tpu.host import HostCSR, generate_stencil, read_mm

POLICY = DTypePolicy.from_names("f32", "i32")


@pytest.mark.parametrize("dims", [(8, 8, 8), (10, 9, 7), (4, 4, 4)])
@pytest.mark.parametrize(
    "variant", ["roll1", "roll2", "dbuf", "dbuf_roll2", "xres", "xres_roll2",
                "win", "win_carry", "win_gcarry"]
)
def test_kernel_matches_oracle(dims, variant):
    from sparsebench_tpu.ops import dia_pallas

    csr = generate_stencil(*dims, dtype=np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(csr.nr).astype(np.float32)
    y_ref = csr.spmv(x.astype(np.float64))

    A = DiaMatrix.from_csr(csr, POLICY, impl="pallas_interpret")
    x2d = dia_pallas.pack_x(x, A.offsets, A.nr_pad)
    data3d = A.data.reshape(A.data.shape[0], -1, dia_pallas.LANES)
    y2d = dia_pallas.dia_spmv_pallas(
        data3d, x2d, A.offsets, A.nr_pad, interpret=True, variant=variant
    )
    y = np.asarray(y2d).reshape(-1)[: csr.nr]
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_kernel_band_matrix(data_dir):
    csr = HostCSR.from_coo(read_mm(str(data_dir / "matrix_band_klein.mtx")))
    A = DiaMatrix.from_csr(csr, POLICY, impl="pallas_interpret")
    x = np.linspace(-1, 1, csr.nr).astype(np.float32)
    y = np.asarray(A.spmv(x))
    np.testing.assert_allclose(y, csr.spmv(x.astype(np.float64)), atol=1e-5)


def test_kernel_pure_shift_patterns():
    """Synthetic diagonals exercising r==0, lane-only, and sublane+lane
    shifts (the three code paths of _shifted_window)."""
    from sparsebench_tpu.ops import dia_pallas

    nr_pad = 128 * 64
    x = np.arange(nr_pad, dtype=np.float32) * 0.001
    for offsets in [(0,), (-1, 1), (-128, 128), (-257, 0, 257), (-1000, 999)]:
        rng = np.random.default_rng(hash(offsets) % 2**31)
        data = rng.standard_normal((len(offsets), nr_pad)).astype(np.float32)
        y_ref = np.zeros(nr_pad, np.float32)
        for d, off in enumerate(offsets):
            lo, hi = max(0, -off), min(nr_pad, nr_pad - off)
            y_ref[lo:hi] += data[d, lo:hi] * x[lo + off : hi + off]
        x2d = dia_pallas.pack_x(x, offsets, nr_pad)
        y = np.asarray(
            dia_pallas.dia_spmv_pallas(
                data.reshape(len(offsets), -1, 128),
                x2d,
                offsets,
                nr_pad,
                interpret=True,
            )
        ).reshape(-1)[:nr_pad]
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5,
                                   err_msg=str(offsets))


def test_choose_schedule_auto():
    """auto = xres while x + double-buffered blocks fit the VMEM budget,
    dbuf beyond; explicit variants pass through; non-8-multiple tiles
    fall back to the single-buffered kernel (alignment, round-2 review)."""
    from sparsebench_tpu.ops import dia_pallas as dp

    offsets = tuple(range(-13, 14))
    # small: fits VMEM comfortably
    v, t = dp.choose_schedule(offsets, 128 * 1024, 4, 2)
    assert (v, t) == ("xres", dp.DEFAULT_TILE_ROWS)
    # 65536 rows of f32 x (33.9 MB) exceeds the xres cutoff -> dbuf,
    # which measured at HBM roofline at 200^3 once the data operand is
    # build-time grid-padded (r3 sweep; see choose_schedule comments)
    v, t = dp.choose_schedule(offsets, 128 * 65536, 4, 2)
    assert v == "dbuf"
    # explicit variant wins regardless of size
    v, t = dp.choose_schedule(offsets, 128 * 65536, 4, 2, variant="roll2",
                              tile_rows=512)
    assert (v, t) == ("roll2", 512)
    # unaligned tile: only roll1 accepts arbitrary tile heights
    v, t = dp.choose_schedule(offsets, 128 * 1024, 4, 2, tile_rows=100)
    assert (v, t) == ("roll1", 100)


def test_xla_and_pallas_paths_agree():
    csr = generate_stencil(6, 5, 4, dtype=np.float32)
    x = np.random.default_rng(1).standard_normal(csr.nr).astype(np.float32)
    y_x = np.asarray(DiaMatrix.from_csr(csr, POLICY, impl="xla").spmv(x))
    y_p = np.asarray(
        DiaMatrix.from_csr(csr, POLICY, impl="pallas_interpret").spmv(x)
    )
    np.testing.assert_allclose(y_x, y_p, rtol=1e-6)
