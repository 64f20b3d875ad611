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
