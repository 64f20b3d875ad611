"""L2 generator entry points (include/libxsmm_generator.h analogues).

The reference's generators emit machine code into a buffer; here they
return GeneratedCode carrying the lowered StableHLO module. Tests check
(a) every entry produces a non-trivial module for its descriptor, (b) the
legacy text modes append labeled text to files, (c) the CSC legacy path's
index conversion is value-exact, (d) error codes round through strerror.
"""

import os

import numpy as np
import pytest

import libxsmm_tpu as x
from libxsmm_tpu.descriptor import (BatchReduceConfig, BatchReduceType,
                                    GemmDescriptor, GemmFlags, GemmShape,
                                    SpgemmConfig)
from libxsmm_tpu.generator import (ERR_TRACE_FAILED, ERR_UNSUP_DESCRIPTOR,
                                   XsmmGeneratorError)


def _desc(m=16, n=16, k=16, flags=GemmFlags.BETA_0, br=None):
    return GemmDescriptor(shape=GemmShape(m, n, k), flags=flags,
                          br=br or BatchReduceConfig())


def test_generator_gemm_kernel():
    g = x.generator_gemm_kernel(_desc())
    assert g.kind == "gemm" and g.code_size > 0
    assert "module" in g.code and "dot_general" in g.code
    assert not g.is_reference_kernel
    # beta=1 adds the C operand; the module gains a third argument
    g1 = x.generator_gemm_kernel(_desc(flags=GemmFlags.NONE))
    assert g1.code.count("tensor<16x16xf32>") > g.code.count(
        "tensor<16x16xf32>")


def test_generator_gemm_brgemm_forms():
    for brt in (BatchReduceType.STRIDE, BatchReduceType.ADDRESS):
        g = x.generator_gemm_kernel(
            _desc(br=BatchReduceConfig(brt, br_count_hint=3)))
        assert "dot_general" in g.code


def test_generator_gemm_reference_kernel():
    g = x.generator_gemm_reference_kernel(_desc())
    assert g.is_reference_kernel and "dot_general" in g.code
    # building it must not have polluted the dispatch cache with an
    # interpret-mode kernel under the same descriptor
    kern = x.xmmdispatch(_desc())
    assert not kern.info.is_reference_kernel


def test_generator_gemm_rejects_non_descriptor():
    with pytest.raises(XsmmGeneratorError) as ei:
        x.generator_gemm_kernel("not a descriptor")
    assert ei.value.code == ERR_UNSUP_DESCRIPTOR
    assert x.strerror(ei.value.code).startswith("descriptor kind")


def test_generator_mateltwise():
    d = x.meltw_descriptor_init(x.Datatype.F32, x.Datatype.F32, 8, 16,
                                op_type=x.UnaryType.GELU)
    g = x.generator_mateltwise_kernel(d)
    assert g.kind == "meltw" and g.code_size > 0
    gr = x.generator_mateltwise_reference_kernel(d)
    assert gr.is_reference_kernel
    d2 = x.meltw_descriptor_init2(
        x.Datatype.BF16, x.Datatype.BF16, None, x.Datatype.F32,
        x.Datatype.BF16, 8, 16, op_type=x.BinaryType.MUL,
        operation="binary")
    assert "bf16" in x.generator_mateltwise_kernel(d2).code
    # error-code contract: unknown operations surface as
    # XsmmGeneratorError(ERR_UNSUP_DESCRIPTOR) like the reference twin,
    # not a raw ValueError (libxsmm_strerror discipline)
    import dataclasses

    import pytest

    from libxsmm_tpu.generator import ERR_UNSUP_DESCRIPTOR
    bad = dataclasses.replace(d, operation="quaternary")
    with pytest.raises(x.XsmmGeneratorError) as ei:
        x.generator_mateltwise_kernel(bad)
    assert ei.value.code == ERR_UNSUP_DESCRIPTOR


def test_generator_matequation():
    idx = x.meqn_create()
    x.meqn_push_back_binary_op(idx, x.BinaryType.ADD)
    x.meqn_push_back_unary_op(idx, x.UnaryType.RELU)
    x.meqn_push_back_arg(idx, 8, 8, 0)
    x.meqn_push_back_arg(idx, 8, 8, 1)
    g = x.generator_matequation_kernel(idx)
    assert g.kind == "meqn" and "maximum" in g.code      # the relu
    assert x.generator_matequation_reference_kernel(idx).is_reference_kernel


def test_generator_packed_dense():
    for gen in (x.generator_packed_gemm, x.generator_packed_gemm_ac_rm,
                x.generator_packed_gemm_bc_rm):
        g = gen(GemmShape(8, 8, 8), GemmFlags.BETA_0, 4)
        assert g.code_size > 0, gen.__name__


def test_generator_packed_spgemm_and_areg():
    rng = np.random.default_rng(1)
    a = ((rng.random((8, 12)) < 0.4)
         * rng.standard_normal((8, 12))).astype(np.float32)
    from libxsmm_tpu.ops.sparse import BcscMatrix, CsrMatrix
    csr = CsrMatrix.from_dense(a)
    shape = GemmShape(8, 16, 12)
    g = x.generator_packed_spgemm_csr_kernel(shape, GemmFlags.BETA_0, 1,
                                             csr.indptr, csr.indices)
    assert g.kind == "pspgemm_csr" and g.code_size > 0
    vals = a[a != 0].astype(np.float32)
    g2 = x.generator_spgemm_csr_reg_kernel(shape, csr.indptr, csr.indices,
                                           vals)
    assert g2.kind == "spgemm_areg"

    b = ((rng.random((64, 64)) < 0.5)
         * rng.standard_normal((64, 64))).astype(np.float32)
    bc = BcscMatrix.from_dense(b, 32, 32)
    g3 = x.generator_packed_spgemm_bcsc_kernel(
        GemmShape(16, 64, 64), GemmFlags.BETA_0, SpgemmConfig(1, 32, 32),
        bc.indptr, bc.indices)
    assert g3.kind == "pspgemm_bcsc"
    from libxsmm_tpu.ops.sparse import CscMatrix
    csc = CscMatrix.from_dense(b)
    g4 = x.generator_packed_spgemm_csc_kernel(
        GemmShape(16, 64, 64), GemmFlags.BETA_0, 1, csc.indptr, csc.indices)
    assert g4.kind == "pspgemm_csc"


def test_generator_packed_spgemm_beta1_has_c_operand():
    """A beta=1 descriptor must lower to a module WITH the C operand —
    the emitted code has to match the flags (generator_packed_spgemm.c
    accumulate semantics), not silently drop to the beta-0 kernel."""
    rng = np.random.default_rng(3)
    a = ((rng.random((8, 12)) < 0.4)
         * rng.standard_normal((8, 12))).astype(np.float32)
    from libxsmm_tpu.ops.sparse import BcscMatrix, CscMatrix, CsrMatrix
    csr = CsrMatrix.from_dense(a)
    shape = GemmShape(8, 16, 12)

    def n_inputs(gen):
        # operand count = arity of the module's @main
        import re
        m = re.search(r"func\.func public @main\((.*?)\)", gen.code)
        assert m is not None
        return m.group(1).count("tensor<")

    g0 = x.generator_packed_spgemm_csr_kernel(shape, GemmFlags.BETA_0, 1,
                                              csr.indptr, csr.indices)
    g1 = x.generator_packed_spgemm_csr_kernel(shape, GemmFlags.NONE, 1,
                                              csr.indptr, csr.indices)
    assert n_inputs(g1) == n_inputs(g0) + 1       # + C(m, n)

    b = ((rng.random((64, 64)) < 0.5)
         * rng.standard_normal((64, 64))).astype(np.float32)
    csc = CscMatrix.from_dense(b)
    s2 = GemmShape(16, 64, 64)
    g2 = x.generator_packed_spgemm_csc_kernel(s2, GemmFlags.NONE, 1,
                                              csc.indptr, csc.indices)
    assert n_inputs(g2) == 3                      # a, values, c

    bc = BcscMatrix.from_dense(b, 32, 32)
    g3 = x.generator_packed_spgemm_bcsc_kernel(
        s2, GemmFlags.NONE, SpgemmConfig(1, 32, 32), bc.indptr, bc.indices)
    assert n_inputs(g3) == 3                      # a, values, c

    # SDDMM (C sparse): beta=1 accumulates the baked positions' values
    g4 = x.generator_packed_spgemm_csc_kernel(
        s2, GemmFlags.NONE, 1, csc.indptr, csc.indices, sparse_operand="c")
    assert n_inputs(g4) == 3                      # a, b, c_vals


def test_generator_spgemm_csc_kernel_index_conversion():
    """The legacy CSC entry converts to CSR at generate time; the baked
    kernel must compute A@B exactly for the CSC-described A."""
    rng = np.random.default_rng(2)
    m, k, n = 6, 9, 8
    a = ((rng.random((m, k)) < 0.4)
         * rng.standard_normal((m, k))).astype(np.float32)
    # build the CSC description of A by columns
    cols = [np.nonzero(a[:, j])[0] for j in range(k)]
    column_ptr = np.concatenate(
        [[0], np.cumsum([len(c) for c in cols])]).astype(np.int32)
    row_idx = np.concatenate(cols).astype(np.int32) if a.any() else \
        np.zeros(0, np.int32)
    values = np.concatenate(
        [a[c, j] for j, c in enumerate(cols)]).astype(np.float32)
    g = x.generator_spgemm_csc_kernel(GemmShape(m, n, k), None,
                                      column_ptr, row_idx, values)
    assert g.code_size > 0
    # value check through the same baked lowering the generator used
    from libxsmm_tpu.ops.sparse import CsrMatrix
    csr = CsrMatrix.from_dense(a)
    kern = x.create_spgemm_csr_areg(GemmShape(m, n, k), GemmFlags.BETA_0,
                                    csr.indptr, csr.indices,
                                    a[a != 0].astype(np.float32))
    b = rng.standard_normal((k, n)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(kern(b)), a @ b, rtol=2e-5,
                               atol=2e-5)


def test_generator_text_modes(tmp_path):
    d = _desc(8, 8, 8)
    cfile = str(tmp_path / "kernels.c")
    sfile = str(tmp_path / "kernels.s")
    x.generator_gemm_inlineasm(cfile, "k8", d)
    x.generator_gemm_inlineasm(cfile, "k8b", d)     # append, not overwrite
    text = open(cfile).read()
    assert text.count("// routine:") == 2 and "k8b" in text
    x.generator_gemm_directasm(sfile, "k8", d)
    assert open(sfile).read().startswith(";; routine:")


def test_generator_spgemm_from_mtx(tmp_path):
    rng = np.random.default_rng(3)
    a = ((rng.random((8, 12)) < 0.4)
         * rng.standard_normal((8, 12))).astype(np.float32)
    from libxsmm_tpu.utils.mtx import write_mtx
    mtx = str(tmp_path / "a.mtx")
    write_mtx(mtx, a)
    out = str(tmp_path / "sp.c")
    x.generator_spgemm(out, "spk", GemmShape(8, 16, 12), None, mtx, 1)
    assert "// routine: spk" in open(out).read()
    with pytest.raises(XsmmGeneratorError):
        x.generator_spgemm(out, "spk", GemmShape(8, 16, 12), None,
                           str(tmp_path / "missing.mtx"), 1)


def test_strerror_contract():
    assert "error" in x.strerror(90000)
    assert "unknown error" in x.strerror(12345)
    assert "example" in x.strerror(ERR_TRACE_FAILED)


def test_generated_code_dump_roundtrip(tmp_path):
    """GeneratedCode is the same artifact the registry dump path writes."""
    d = _desc(8, 8, 8)
    g = x.generator_gemm_kernel(d)
    kern = x.xmmdispatch(d)
    import jax
    avals = [jax.ShapeDtypeStruct((8, 8), np.float32)] * 2
    assert kern.lower_text(*avals) == g.code


def test_encoder_driver():
    """samples/encoder.py — the reference encoder-test analogue: every
    structural check on emitted StableHLO modules passes (exit-code
    discipline like samples/encoder/encoder_x86.c)."""
    import sys
    sys.path.insert(0, "samples")
    try:
        import encoder
        assert encoder.main() == 0
    finally:
        sys.path.pop(0)


def test_generator_gemm_vnni_avals_derived():
    """VNNI-packed operand shapes are descriptor-determined (flag + dtype
    pack factor): the natural-shape avals previously made every VNNI
    descriptor fail with ERR_TRACE_FAILED unless the caller hand-built
    example_args (review finding)."""
    from libxsmm_tpu.dtypes import Datatype
    for fl in (GemmFlags.VNNI_A, GemmFlags.VNNI_B,
               GemmFlags.VNNI_A | GemmFlags.VNNI_B):
        d = GemmDescriptor(
            shape=GemmShape(16, 32, 64, a_in_type=Datatype.BF16,
                            b_in_type=Datatype.BF16,
                            out_type=Datatype.F32),
            flags=fl | GemmFlags.BETA_0)
        code = x.generator_gemm_kernel(d)
        assert len(code.code) > 100 and "dot" in code.code


def test_generator_reference_kernel_error_contract():
    """The reference-kernel twins follow the same XsmmGeneratorError
    code contract as the dispatch twins (libxsmm_strerror discipline)."""
    with pytest.raises(XsmmGeneratorError) as ei:
        x.generator_gemm_reference_kernel("not a descriptor")
    assert ei.value.code == ERR_UNSUP_DESCRIPTOR
