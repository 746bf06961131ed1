"""Smoke tests for the developer tools (reference `make asm` analog)."""

import os


def test_dump_hlo(tmp_path):
    import tools.dump_hlo as dh

    rc = dh.main(str(tmp_path))
    assert rc == 0
    for fmt in ("dia", "stencil"):
        for stage in ("lowered", "optimized"):
            p = tmp_path / f"cg_{fmt}_{stage}.txt"
            assert p.exists() and p.stat().st_size > 1000, p
    # the optimized dump is real backend output, not the trace
    text = (tmp_path / "cg_dia_optimized.txt").read_text()
    assert "HloModule" in text


def test_make_asm_target_points_at_tool():
    mk = open(os.path.join(os.path.dirname(__file__), "..",
                           "Makefile")).read()
    assert "tools/dump_hlo.py" in mk
