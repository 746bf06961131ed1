"""Native C++ host library parity tests (native/ingest.cc vs the numpy
behavioral spec in sparsebench_tpu/host)."""

import os

import numpy as np
import pytest

from sparsebench_tpu.host import generate_stencil, read_mm
from sparsebench_tpu.host.native import available

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable (no toolchain?)"
)


@pytest.mark.parametrize("dims,use_7pt", [((5, 4, 3), False), ((4, 4, 4), True)])
def test_generator_parity(dims, use_7pt):
    nat = generate_stencil(*dims, use_7pt=use_7pt)
    ref = generate_stencil(*dims, use_7pt=use_7pt, use_native=False)
    np.testing.assert_array_equal(nat.row_ptr, ref.row_ptr)
    np.testing.assert_array_equal(nat.col, ref.col)
    np.testing.assert_array_equal(nat.val, ref.val)


def test_generator_parity_ranked():
    nat = generate_stencil(3, 3, 2, rank=1, size=3)
    ref = generate_stencil(3, 3, 2, rank=1, size=3, use_native=False)
    np.testing.assert_array_equal(nat.col, ref.col)
    assert nat.start_row == ref.start_row


def test_mm_parity(test_matrices_dir, data_dir):
    paths = sorted(test_matrices_dir.glob("*.mtx")) + [
        data_dir / "matrix_band_klein.mtx"
    ]
    for p in paths:
        nat = read_mm(str(p))
        os.environ["SB_NO_NATIVE"] = "1"
        try:
            ref = read_mm(str(p))
        finally:
            del os.environ["SB_NO_NATIVE"]
        np.testing.assert_array_equal(nat.row, ref.row, err_msg=p.name)
        np.testing.assert_array_equal(nat.col, ref.col, err_msg=p.name)
        np.testing.assert_array_equal(nat.val, ref.val, err_msg=p.name)
        assert (nat.nr, nat.nc) == (ref.nr, ref.nc)
