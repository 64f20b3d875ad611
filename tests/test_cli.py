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


def test_cli_driver_positional_form(tmp_path, capsys):
    """The reference generator driver's 17-positional-arg form
    (src/libxsmm_generator_gemm_driver.c:87-117): dense/dense_asm append
    labeled module text; sparse modes read .mtx; the alpha/beta and
    row-major ld contracts are enforced with rc=1."""
    import numpy as np

    from libxsmm_tpu.utils.cli import main
    from libxsmm_tpu.utils.mtx import write_mtx

    cfile = str(tmp_path / "drv.c")
    rc = main(["dense", cfile, "g16", "16", "16", "16", "16", "16", "16",
               "1", "0", "0", "0", "noarch", "nopf", "SP"])
    assert rc == 0
    text = open(cfile).read()
    assert "// routine: g16" in text and "dot_general" in text

    sfile = str(tmp_path / "drv.s")
    assert main(["dense_asm", sfile, "g8", "8", "8", "8", "8", "8", "8",
                 "1", "1", "0", "0", "noarch", "nopf", "SP"]) == 0
    assert open(sfile).read().startswith(";; routine: g8")

    rng = np.random.default_rng(9)
    a = ((rng.random((8, 12)) < 0.4)
         * rng.standard_normal((8, 12))).astype(np.float32)
    mtx = str(tmp_path / "a.mtx")
    write_mtx(mtx, a)
    spfile = str(tmp_path / "sp.c")
    for mode in ("sparse", "sparse_csr", "sparse_csr_reg"):
        assert main([mode, spfile, f"k_{mode}", "8", "16", "12", "0", "12",
                     "16", "1", "0", "0", "0", "noarch", "nopf", "SP",
                     mtx]) == 0
    # B-sparse routing: ldb<1 marks B as the sparse operand (k, n) mtx
    b = ((rng.random((12, 16)) < 0.4)
         * rng.standard_normal((12, 16))).astype(np.float32)
    mtxb = str(tmp_path / "b.mtx")
    write_mtx(mtxb, b)
    assert main(["sparse", spfile, "k_bsp", "8", "16", "12", "12", "0",
                 "16", "1", "0", "0", "0", "noarch", "nopf", "SP",
                 mtxb]) == 0
    assert open(spfile).read().count("// routine:") == 4
    # both lds <1 is ambiguous
    assert main(["sparse", spfile, "k", "8", "16", "12", "0", "0", "16",
                 "1", "0", "0", "0", "noarch", "nopf", "SP", mtxb]) == 1

    # contract violations exit 1 without writing
    bad = str(tmp_path / "bad.c")
    assert main(["dense", bad, "g", "8", "8", "8", "8", "8", "8",
                 "2", "0", "0", "0", "noarch", "nopf", "SP"]) == 1
    assert main(["dense", bad, "g", "8", "8", "8", "9", "8", "8",
                 "1", "0", "0", "0", "noarch", "nopf", "SP"]) == 1
    assert main(["sparse", bad, "g", "8", "8", "8", "0", "8", "8",
                 "1", "0", "0", "0", "noarch", "nopf", "SP"]) == 1
    assert not (tmp_path / "bad.c").exists()
    capsys.readouterr()
