"""equation — fused matrix-equation walkthrough (layernorm + softmax).

TPU rendition of the reference's equation drivers
(/root/reference/samples/equation/equation_layernorm.c, equation_softmax.c):
builds the trees through the push-back API, prints them, and checks the
fused kernels against NumPy.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import BinaryType, TernaryType, UnaryType
from libxsmm_tpu.matdiff import matdiff
from libxsmm_tpu.ops.equation import meqn_rpn_print

m, n = 64, 256
rng = np.random.default_rng(0)
x = rng.standard_normal((m, n)).astype(np.float32)
gamma = rng.standard_normal((1, n)).astype(np.float32)
beta = rng.standard_normal((1, n)).astype(np.float32)
eps = 1e-5

# --- layernorm: MULADD( MUL( SUB(x, mean), rstd ), gamma, beta ) ---
idx = xt.meqn_create()
xt.meqn_push_back_ternary_op(idx, TernaryType.MULADD)
xt.meqn_push_back_binary_op(idx, BinaryType.MUL)
xt.meqn_push_back_binary_op(idx, BinaryType.SUB)
xt.meqn_push_back_arg(idx, m, n, in_pos=0)
xt.meqn_push_back_arg(idx, m, 1, in_pos=1)
xt.meqn_push_back_arg(idx, m, 1, in_pos=2)
xt.meqn_push_back_arg(idx, 1, n, in_pos=3)
xt.meqn_push_back_arg(idx, 1, n, in_pos=4)
print("layernorm tree:")
xt.meqn_tree_print(idx)
print("rpn:", end=" ")
meqn_rpn_print(idx)
kern = xt.dispatch_meqn(idx, m, n)

mean = x.mean(axis=1, keepdims=True)
rstd = 1.0 / np.sqrt(x.var(axis=1, keepdims=True) + eps)
ref = (x - mean) * rstd * gamma + beta
info = matdiff(ref, np.asarray(kern(x, mean, rstd, gamma, beta)))
print(f"layernorm: normf_rel={info.normf_rel:.2e} "
      f"{'OK' if info.normf_rel < 1e-5 else 'FAIL'}\n")

# --- softmax: DIV( EXP( SUB(x, rowmax) ), rowsum ) ---
idx = xt.meqn_create()
xt.meqn_push_back_binary_op(idx, BinaryType.DIV)
xt.meqn_push_back_unary_op(idx, UnaryType.EXP)
xt.meqn_push_back_binary_op(idx, BinaryType.SUB)
xt.meqn_push_back_arg(idx, m, n, in_pos=0)
xt.meqn_push_back_arg(idx, m, 1, in_pos=1)
xt.meqn_push_back_arg(idx, m, 1, in_pos=2)
kern = xt.dispatch_meqn(idx, m, n)
mx = x.max(axis=1, keepdims=True)
e = np.exp(x - mx)
ref = e / e.sum(axis=1, keepdims=True)
out = np.asarray(kern(x, mx, e.sum(axis=1, keepdims=True)))
info = matdiff(ref, out)
print(f"softmax:   normf_rel={info.normf_rel:.2e} "
      f"{'OK' if info.normf_rel < 1e-5 else 'FAIL'}")
