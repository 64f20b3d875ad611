"""xsmm-gen CLI test (AOT manifest precompile, static_codegen analogue)."""

import json

from libxsmm_tpu.utils.cli import main


def test_cli_manifest(tmp_path, capsys):
    manifest = {
        "gemm": [{"m": 8, "n": 8, "k": 8, "dtype": "f32", "beta": 0},
                 {"m": 8, "n": 8, "k": 8, "dtype": "f32", "beta": 1,
                  "br": 2}],
        "eltwise": [{"op": "RELU", "kind": "unary", "m": 8, "n": 8},
                    {"op": "ADD", "kind": "binary", "m": 8, "n": 8}],
    }
    p = tmp_path / "m.json"
    p.write_text(json.dumps(manifest))
    assert main([str(p)]) == 0
    out = capsys.readouterr().out
    assert "4 kernels compiled" in out
    assert "xsmm_gemm_f32f32f32_nn_8x8x8_beta0" in out


def test_cli_spgemm_mtx(tmp_path, capsys):
    import json

    import numpy as np

    from libxsmm_tpu.utils.cli import main
    from libxsmm_tpu.utils.mtx import write_mtx

    rng = np.random.default_rng(0)
    a = rng.standard_normal((24, 16)).astype(np.float32)
    a[rng.random((24, 16)) > 0.3] = 0.0
    mtx = tmp_path / "op.mtx"
    write_mtx(str(mtx), a)
    manifest = tmp_path / "m.json"
    # bcsc needs block-aligned dims: a second 64x64 operand
    ab = rng.standard_normal((64, 64)).astype(np.float32)
    ab[rng.random((64, 64)) > 0.3] = 0.0
    mtxb = tmp_path / "opb.mtx"
    write_mtx(str(mtxb), ab)
    manifest.write_text(json.dumps({"spgemm": [
        {"kind": "fsspmdm", "mtx": str(mtx), "n": 64},
        {"kind": "csr_areg", "mtx": str(mtx), "n": 64},
        {"kind": "csc", "mtx": str(mtx), "m": 16},
        {"kind": "bcsc", "mtx": str(mtxb), "m": 128, "bk": 32, "bn": 32},
    ]}))
    assert main([str(manifest)]) == 0
    out = capsys.readouterr().out
    assert "fsspmdm 24x64x16" in out
    assert "csr_areg" in out
    assert "csc " in out
    assert "bcsc " in out
    assert "4 kernels compiled" in out
