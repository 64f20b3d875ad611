"""equation — matrix-equation driver sweep, one mini-driver per reference
equation sample (/root/reference/samples/equation/*.c, 11 drivers).

Each driver builds its tree through the push-back API, fuses it with
dispatch_meqn into ONE jitted kernel, and checks against NumPy with matdiff
norms. Exit code counts failures (the reference drivers' exit-code
discipline, samples/xgemm/gemm_kernel.c:29-37).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BinaryFlags, BinaryType, TernaryFlags,
                                    TernaryType, UnaryFlags, UnaryType)
from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.matdiff import matdiff

m, n, k = 64, 256, 128
rng = np.random.default_rng(42)
fails = []


def check(name, ref, out, tol=1e-5):
    info = matdiff(np.asarray(ref, np.float32), np.asarray(out, np.float32))
    ok = info.normf_rel < tol
    print(f"{name:<22s} {'OK ' if ok else 'FAIL'} "
          f"normf_rel={info.normf_rel:.2e} linf_abs={info.linf_abs:.2e}")
    if not ok:
        fails.append(name)


def r(*shape):
    return rng.standard_normal(shape).astype(np.float32)


# --- simple: MUL(ADD(x0, INC(x1)), ADD(X2(x2), x3))  [equation_simple.c:518-534]
x0, x1, x2, x3 = r(m, n), r(m, n), r(m, n), r(m, n)
idx = xt.meqn_create()
xt.meqn_push_back_binary_op(idx, BinaryType.MUL)
xt.meqn_push_back_binary_op(idx, BinaryType.ADD)
xt.meqn_push_back_arg(idx, m, n, in_pos=0)
xt.meqn_push_back_unary_op(idx, UnaryType.INC)
xt.meqn_push_back_arg(idx, m, n, in_pos=1)
xt.meqn_push_back_binary_op(idx, BinaryType.ADD)
xt.meqn_push_back_unary_op(idx, UnaryType.X2)
xt.meqn_push_back_arg(idx, m, n, in_pos=2)
xt.meqn_push_back_arg(idx, m, n, in_pos=3)
kern = xt.dispatch_meqn(idx, m, n)
check("simple", (x0 + (x1 + 1)) * (x2 * x2 + x3), kern(x0, x1, x2, x3))

# --- relu: RELU(ADD(x0, INC(SUB(x1, x2))))  [equation_relu.c:198-210]
idx = xt.meqn_create()
xt.meqn_push_back_unary_op(idx, UnaryType.RELU)
xt.meqn_push_back_binary_op(idx, BinaryType.ADD)
xt.meqn_push_back_unary_op(idx, UnaryType.INC)
xt.meqn_push_back_binary_op(idx, BinaryType.SUB)
xt.meqn_push_back_arg(idx, m, n, in_pos=0)
xt.meqn_push_back_arg(idx, m, n, in_pos=1)
xt.meqn_push_back_arg(idx, m, n, in_pos=2)
kern = xt.dispatch_meqn(idx, m, n)
check("relu", np.maximum((x0 - x1) + 1 + x2, 0.0), kern(x0, x1, x2))

# --- matmul fusion: MUL(s, GELU(ADD(TANH(MATMUL(A,B)), C)))
#     [equation_matmul.c:399-407]
A, B, C, S = r(m, k), r(k, n), r(m, n), r(m, n)
idx = xt.meqn_create()
xt.meqn_push_back_binary_op(idx, BinaryType.MUL)
xt.meqn_push_back_arg(idx, m, n, in_pos=0)
xt.meqn_push_back_unary_op(idx, UnaryType.GELU)
xt.meqn_push_back_binary_op(idx, BinaryType.ADD)
xt.meqn_push_back_unary_op(idx, UnaryType.TANH)
xt.meqn_push_back_binary_op(idx, BinaryType.MATMUL, dtype=Datatype.F32)
xt.meqn_push_back_arg(idx, m, k, in_pos=1)
xt.meqn_push_back_arg(idx, k, n, in_pos=2)
xt.meqn_push_back_arg(idx, m, n, in_pos=3)
kern = xt.dispatch_meqn(idx, m, n)
import math
t = np.tanh(A @ B) + C
erf_v = np.vectorize(lambda v: math.erf(v / math.sqrt(2.0)))
gelu = 0.5 * t * (1.0 + erf_v(t).astype(np.float32))
check("matmul", S * gelu, kern(S, A, B, C), tol=5e-5)

# --- layernorm: MULADD(MUL(SUB(x, mean), rstd), gamma, beta)
#     [equation_layernorm.c]
x = r(m, n)
gamma, beta = r(1, n), r(1, n)
mean = x.mean(axis=1, keepdims=True)
rstd = 1.0 / np.sqrt(x.var(axis=1, keepdims=True) + 1e-5)
idx = xt.meqn_create()
xt.meqn_push_back_ternary_op(idx, TernaryType.MULADD)
xt.meqn_push_back_binary_op(idx, BinaryType.MUL)
xt.meqn_push_back_binary_op(idx, BinaryType.SUB)
xt.meqn_push_back_arg(idx, m, n, in_pos=0)
xt.meqn_push_back_arg(idx, m, 1, in_pos=1)
xt.meqn_push_back_arg(idx, m, 1, in_pos=2)
xt.meqn_push_back_arg(idx, 1, n, in_pos=3)
xt.meqn_push_back_arg(idx, 1, n, in_pos=4)
kern = xt.dispatch_meqn(idx, m, n)
check("layernorm", (x - mean) * rstd * gamma + beta,
      kern(x, mean, rstd, gamma, beta))

# --- simple_layernorm: MULADD(MULADD(x, s1, b1) [scalar bcast], s2, b2)
#     [equation_simple_layernorm.c:87-104]
s1 = np.asarray([[1.7]], np.float32)
idx = xt.meqn_create()
xt.meqn_push_back_ternary_op(idx, TernaryType.MULADD)
xt.meqn_push_back_ternary_op(
    idx, TernaryType.MULADD, flags=TernaryFlags.BCAST_SCALAR_IN_1)
xt.meqn_push_back_arg(idx, m, n, in_pos=0)
xt.meqn_push_back_arg(idx, 1, 1, in_pos=1)
xt.meqn_push_back_arg(idx, m, n, in_pos=2)
xt.meqn_push_back_arg(idx, 1, n, in_pos=3)
xt.meqn_push_back_arg(idx, 1, n, in_pos=4)
kern = xt.dispatch_meqn(idx, m, n)
check("simple_layernorm", (x0 * 1.7 + x1) * gamma + beta,
      kern(x0, s1, x1, gamma, beta))

# --- softmax: DIV(EXP(SUB(x, rowmax)), rowsum)  [equation_softmax.c]
mx = x.max(axis=1, keepdims=True)
e = np.exp(x - mx)
sm = e.sum(axis=1, keepdims=True)
idx = xt.meqn_create()
xt.meqn_push_back_binary_op(idx, BinaryType.DIV)
xt.meqn_push_back_unary_op(idx, UnaryType.EXP)
xt.meqn_push_back_binary_op(idx, BinaryType.SUB)
xt.meqn_push_back_arg(idx, m, n, in_pos=0)
xt.meqn_push_back_arg(idx, m, 1, in_pos=1)
xt.meqn_push_back_arg(idx, m, 1, in_pos=2)
kern = xt.dispatch_meqn(idx, m, n)
check("softmax", e / sm, kern(x, mx, sm))

# --- gather_dot: REDUCE_COLS(MUL(GATHER_cols(x, idx), y))
#     [equation_gather_dot.c]
ncols = 32
cols = rng.choice(n, ncols, replace=False).astype(np.int32)
y = r(m, ncols)
idx = xt.meqn_create()
xt.meqn_push_back_unary_op(idx, UnaryType.REDUCE_X_OP_ADD,
                           flags=UnaryFlags.REDUCE_COLS)
xt.meqn_push_back_binary_op(idx, BinaryType.MUL)
xt.meqn_push_back_unary_op(idx, UnaryType.GATHER,
                           flags=UnaryFlags.GS_COLS, op_arg_pos=2)
xt.meqn_push_back_arg(idx, m, n, in_pos=0)
xt.meqn_push_back_arg(idx, m, ncols, in_pos=1)
kern = xt.dispatch_meqn(idx, 1, ncols)
check("gather_dot", (x[:, cols] * y).sum(axis=0, keepdims=True),
      kern(x, y, cols))

# --- gather_reduce: REDUCE_COLS(GATHER_cols(x, idx))
#     [equation_gather_reduce.c:150-152]
idx = xt.meqn_create()
xt.meqn_push_back_unary_op(idx, UnaryType.REDUCE_X_OP_ADD,
                           flags=UnaryFlags.REDUCE_COLS)
xt.meqn_push_back_unary_op(idx, UnaryType.GATHER,
                           flags=UnaryFlags.GS_COLS, op_arg_pos=1)
xt.meqn_push_back_arg(idx, m, n, in_pos=0)
kern = xt.dispatch_meqn(idx, 1, ncols)
check("gather_reduce", x[:, cols].sum(axis=0, keepdims=True), kern(x, cols))

# --- gather_bcstmul_add: standalone-TPP composition (the reference driver
#     chains dispatch_meltw_* kernels, not an equation tree;
#     equation_gather_bcstmul_add.c:211-233)
from libxsmm_tpu.descriptor import (create_meltw_binary_shape,
                                    create_meltw_unary_shape)
rowv = r(1, ncols)
g_k = xt.dispatch_meltw_unary(UnaryType.GATHER,
                              create_meltw_unary_shape(m, n),
                              UnaryFlags.GS_COLS)
mul_k = xt.dispatch_meltw_binary(BinaryType.MUL,
                                 create_meltw_binary_shape(m, ncols),
                                 BinaryFlags.BCAST_COL_IN_1)
red_k = xt.dispatch_meltw_unary(UnaryType.REDUCE_X_OP_ADD,
                                create_meltw_unary_shape(m, ncols),
                                UnaryFlags.REDUCE_ROWS)
add_k = xt.dispatch_meltw_binary(BinaryType.ADD,
                                 create_meltw_binary_shape(m, 1))
acc = r(m, 1)
gat = g_k(x, cols)
out = add_k(red_k(mul_k(gat, rowv)), acc)
check("gather_bcstmul_add",
      (x[:, cols] * rowv).sum(axis=1, keepdims=True) + acc, out)

# --- splitSGD: UNZIP(NMULADD(lr, g, ZIP(lo, hi))) — the bf16 split-storage
#     SGD update on raw 16-bit halves  [equation_splitSGD.c:180-193]
w = r(m, n)
g = r(m, n)
lr = np.asarray([[0.01]], np.float32)
wbits = w.view(np.uint32)
lo = (wbits & 0xFFFF).astype(np.uint16)
hi = (wbits >> 16).astype(np.uint16)
idx = xt.meqn_create()
xt.meqn_push_back_unary_op(idx, UnaryType.UNZIP)
xt.meqn_push_back_ternary_op(idx, TernaryType.NMULADD,
                             flags=TernaryFlags.BCAST_SCALAR_IN_0)
xt.meqn_push_back_arg(idx, 1, 1, in_pos=0)          # lr
xt.meqn_push_back_arg(idx, m, n, in_pos=1)          # g
xt.meqn_push_back_binary_op(idx, BinaryType.ZIP)
xt.meqn_push_back_arg(idx, m, n, in_pos=2, dtype=Datatype.U16)   # lo bits
xt.meqn_push_back_arg(idx, m, n, in_pos=3, dtype=Datatype.U16)   # hi bits
kern = xt.dispatch_meqn(idx, m, n, out_type=Datatype.U16)
lo2, hi2 = kern(lr, g, lo, hi)
wnew = ((np.asarray(hi2).astype(np.uint32) << 16)
        | np.asarray(lo2).astype(np.uint32)).view(np.float32)
check("splitSGD", w - 0.01 * g, wnew)

# --- bf16_x3_split_f32: reconstruct f32 from a 3-way bf16 split
#     (b0 + b1 + b2 where b1/b2 are bf16 of the residuals)
#     [equation_bf16_x3_split_f32.c:104-119]
xf = r(m, n)
b0 = xf.astype(np.float32)
b0_bf = np.asarray(xt.rne_convert_fp32_bf16(b0), np.float32)
r1 = b0 - b0_bf
b1_bf = np.asarray(xt.rne_convert_fp32_bf16(r1), np.float32)
r2 = r1 - b1_bf
b2_bf = np.asarray(xt.rne_convert_fp32_bf16(r2), np.float32)
idx = xt.meqn_create()
xt.meqn_push_back_binary_op(idx, BinaryType.ADD)
xt.meqn_push_back_binary_op(idx, BinaryType.ADD)
xt.meqn_push_back_arg(idx, m, n, in_pos=0, dtype=Datatype.BF16)
xt.meqn_push_back_arg(idx, m, n, in_pos=1, dtype=Datatype.BF16)
xt.meqn_push_back_arg(idx, m, n, in_pos=2, dtype=Datatype.BF16)
kern = xt.dispatch_meqn(idx, m, n)
out = kern(b0_bf.astype(np.float32), b1_bf, b2_bf)
# 3-way bf16 split carries ~24 bits: reconstruction error << bf16 eps
check("bf16_x3_split_f32", xf, out, tol=1e-4)

print(f"\n{11 - len(fails)}/11 equation drivers OK"
      + (f"; FAILED: {fails}" if fails else ""))
sys.exit(len(fails))
