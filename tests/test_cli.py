"""CLI driver tests (reference src/main.c flag surface) — run in-process."""

import numpy as np
import pytest

from sparsebench_tpu.cli import apply_args, build_argparser, main
from sparsebench_tpu.config import Parameter


def run_cli(argv):
    return main(argv)


def test_help_flags():
    ap = build_argparser()
    with pytest.raises(SystemExit):
        ap.parse_args(["--bogus"])


def test_par_file_then_cli_override(tmp_path):
    par = tmp_path / "t.par"
    par.write_text("filename generate # comment\nnx 8\nny 9\nnz 10\nitermax 22\neps 0.5\n")
    args = build_argparser().parse_args(["-f", str(par), "-x", "5", "-i", "7"])
    p = apply_args(Parameter(), args)
    assert (p.nx, p.ny, p.nz) == (5, 9, 10)  # -x overrides the .par value
    assert p.itermax == 7 and p.eps == 0.5


def test_cg_run(capsys):
    rc = run_cli(["-t", "cg", "-x", "6", "-y", "6", "-z", "6", "-i", "15"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Initial Residual" in out
    assert "Difference between computed and exact" in out


def test_spmv_run(capsys):
    rc = run_cli(["-t", "spmv", "-x", "5", "-y", "5", "-z", "5", "-i", "5",
                  "--fmt", "crs"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Rate(MB/s)" in out and "spMVM" in out


def test_convert_and_load_bmx(tmp_path, data_dir, capsys):
    src = tmp_path / "m.mtx"
    src.write_text((data_dir / "matrix_band_klein.mtx").read_text())
    rc = run_cli(["-c", str(src)])
    assert rc == 0
    bmx = tmp_path / "m.bmx"
    assert bmx.exists()
    rc = run_cli(["-t", "cg", "-m", str(bmx), "-i", "10", "--fmt", "dia"])
    assert rc == 0


def test_sharded_cli_run(capsys):
    rc = run_cli(["-t", "cg", "-x", "4", "-y", "4", "-z", "2", "-i", "10",
                  "--shards", "4", "--fmt", "sell"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Partition: 4 shards" in out
    assert "Total data volume" in out


@pytest.mark.parametrize("bench", ["gmres", "cheb"])
def test_sharded_cli_other_solvers(capsys, bench):
    rc = run_cli(["-t", bench, "-x", "4", "-y", "4", "-z", "2", "-i", "40",
                  "-e", "1e-8", "--shards", "4", "--fmt", "crs"])
    out = capsys.readouterr().out
    assert rc == 0
    assert ("GMRES" if bench == "gmres" else "CHEBFD") in out


def test_cg_variant_cs_cli(capsys):
    rc = run_cli(["-t", "cg", "-x", "6", "-y", "6", "-z", "6", "-i", "15",
                  "--cg-variant", "cs"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Solve aggregate (fused)" in out
    assert "Difference between computed and exact  = 0.000" in out


def test_cg_variant_cs_sharded_cli(capsys):
    rc = run_cli(["-t", "cg", "-x", "4", "-y", "4", "-z", "2", "-i", "10",
                  "--shards", "4", "--fmt", "sell", "--cg-variant", "cs"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Solve aggregate (fused)" in out


def test_cg_variant_rejects_profile():
    with pytest.raises(SystemExit, match="plain CG path"):
        run_cli(["-t", "cg", "-x", "4", "-y", "4", "-z", "4", "-i", "5",
                 "--cg-variant", "cs", "--profile"])


def test_cg_profile_cli(capsys):
    """--profile runs the separately-jitted region kernels
    (solvers/profiled.py) and prints the reference per-region table."""
    rc = run_cli(["-t", "cg", "-x", "6", "-y", "6", "-z", "6", "-i", "15",
                  "--profile", "--fmt", "crs"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Rate(MB/s)" in out and "waxpby:" in out and "ddot:" in out
    assert "Difference between computed and exact  = 0.000" in out


def test_gmres_orth_cli(capsys, data_dir):
    rc = run_cli(["-t", "gmres", "-m",
                  str(data_dir / "testMatrices" / "test0.mtx"),
                  "-i", "40", "-e", "1e-10", "--fmt", "crs",
                  "--orth", "cgs2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "GMRES cycle" in out


def test_graft_entry_single_and_multi():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    x, hist = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(hist)[0])
    ge.dryrun_multichip(8)
