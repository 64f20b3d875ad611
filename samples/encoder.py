"""Encoder-test analogue: validate EMITTED modules without executing them.

The reference's samples/encoder drivers (encoder_x86.c:14-25 and aarch64/
riscv twins) emit every instruction form into a buffer and validate the
bytes by disassembly — testing the emission layer itself, independent of
execution. The TPU emission layer is the lowering to StableHLO
(generator.py GeneratedCode), so this driver sweeps descriptor classes
through the generator API and asserts STRUCTURAL invariants of the emitted
modules: operand dtypes/shapes appear as declared, TRANS flags transpose
the declared operand dims, BRGEMM emits a contraction over the stacked
batch axis, fused epilogues splice their ops into the module, precision
policy pins f32 matmuls to the highest MXU precision.

Usage: python samples/encoder.py   (prints per-class PASS/FAIL, exits
nonzero on any failure — the reference driver's exit-code discipline)
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _checks():
    import libxsmm_tpu as xt
    from libxsmm_tpu.descriptor import (BatchReduceConfig, BatchReduceType,
                                        BinaryType, GemmDescriptor,
                                        GemmFlags, GemmShape, UnaryType)
    from libxsmm_tpu.dtypes import Datatype

    def gemm(m=16, n=24, k=32, flags=GemmFlags.BETA_0, br=None, **dts):
        return GemmDescriptor(shape=GemmShape(m, n, k, **dts),
                              flags=flags, br=br or BatchReduceConfig())

    yield ("gemm_f32_operand_shapes",
           lambda: xt.generator_gemm_kernel(gemm()),
           lambda g: ("tensor<16x32xf32>" in g.code        # A (m,k)
                      and "tensor<32x24xf32>" in g.code    # B (k,n)
                      and "tensor<16x24xf32>" in g.code))  # C (m,n)

    yield ("gemm_f32_highest_precision",
           lambda: xt.generator_gemm_kernel(gemm()),
           # precision policy: f32 MXU matmuls must not run bf16 passes
           lambda g: "HIGHEST" in g.code)

    yield ("gemm_bf16_storage_dtypes",
           lambda: xt.generator_gemm_kernel(gemm(
               a_in_type=Datatype.BF16, b_in_type=Datatype.BF16,
               out_type=Datatype.F32)),
           lambda g: ("tensor<16x32xbf16>" in g.code
                      and "tensor<16x24xf32>" in g.code))

    yield ("gemm_trans_a_flag",
           lambda: xt.generator_gemm_kernel(gemm(
               flags=GemmFlags.BETA_0 | GemmFlags.TRANS_A)),
           lambda g: "tensor<32x16xf32>" in g.code)        # A stored (k,m)

    yield ("gemm_beta1_reads_c",
           lambda: xt.generator_gemm_kernel(gemm(flags=GemmFlags.NONE)),
           # three f32 operands of the C shape: a result AND a C input
           lambda g: g.code.count("tensor<16x24xf32>") >= 2)

    yield ("brgemm_stride_batch_axis",
           lambda: xt.generator_gemm_kernel(gemm(
               br=BatchReduceConfig(BatchReduceType.STRIDE,
                                    br_count_hint=5))),
           lambda g: "tensor<5x16x32xf32>" in g.code)      # stacked A

    yield ("brgemm_address_index_operands",
           lambda: xt.generator_gemm_kernel(gemm(
               br=BatchReduceConfig(BatchReduceType.ADDRESS,
                                    br_count_hint=5))),
           lambda g: "tensor<5xi32>" in g.code)            # gather indices

    yield ("meltw_relu_emits_max",
           lambda: xt.generator_mateltwise_kernel(
               xt.meltw_descriptor_init(Datatype.F32, Datatype.F32, 8, 16,
                                        op_type=UnaryType.RELU)),
           lambda g: "maximum" in g.code)

    yield ("meltw_binary_bf16_storage",
           lambda: xt.generator_mateltwise_kernel(
               xt.meltw_descriptor_init2(
                   Datatype.BF16, Datatype.BF16, None, Datatype.F32,
                   Datatype.BF16, 8, 16, op_type=BinaryType.ADD,
                   operation="binary")),
           lambda g: "bf16" in g.code)

    def _eqn():
        idx = xt.meqn_create()
        xt.meqn_push_back_binary_op(idx, BinaryType.ADD)
        xt.meqn_push_back_unary_op(idx, UnaryType.GELU)
        xt.meqn_push_back_arg(idx, 8, 8, 0)
        xt.meqn_push_back_arg(idx, 8, 8, 1)
        return xt.generator_matequation_kernel(idx)

    yield ("meqn_fused_single_module",
           _eqn,
           # one module containing both the gelu math and the add — the
           # fusion contract (no per-node kernels)
           lambda g: g.code.count("module") == 1 and "add" in g.code)

    def _areg():
        rng = np.random.default_rng(0)
        a = ((rng.random((8, 12)) < 0.4)
             * rng.standard_normal((8, 12))).astype(np.float32)
        from libxsmm_tpu.ops.sparse import CsrMatrix
        csr = CsrMatrix.from_dense(a)
        return xt.generator_spgemm_csr_reg_kernel(
            GemmShape(8, 16, 12), csr.indptr, csr.indices,
            a[a != 0].astype(np.float32))

    yield ("spgemm_areg_values_baked",
           _areg,
           # values are trace-time constants: the module has exactly one
           # argument tensor of B's shape and NO values operand
           lambda g: "tensor<12x16xf32>" in g.code)


def main() -> int:
    failures = 0
    for name, build, check in _checks():
        try:
            gen = build()
            ok = check(gen)
        except Exception as e:                       # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        print(("PASS" if ok else "FAIL"), name,
              f"({gen.code_size} chars, arch={gen.arch})")
        failures += 0 if ok else 1
    print(f"encoder checks: {'OK' if not failures else failures} "
          f"{'failures' if failures else ''}".strip())
    return failures


if __name__ == "__main__":
    sys.exit(main())
