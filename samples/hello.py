"""hello — the 4-TPP walkthrough, on TPU.

TPU-native rendition of the reference's samples/hello/hello.c
(README.md:13-63): a 13x5x7 GEMM with beta=1, a unary ReLU, a binary add,
and a ternary muladd, all dispatched through the two-phase API.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BinaryType, GemmFlags, GemmShape,
                                    TernaryType, UnaryType)

m, n, k = 13, 5, 7
rng = np.random.default_rng(0)
a = rng.standard_normal((m, k)).astype(np.float32)
b = rng.standard_normal((k, n)).astype(np.float32)
c = np.zeros((m, n), np.float32)

gemm = xt.dispatch_gemm(GemmShape(m, n, k))          # beta=1
relu = xt.dispatch_meltw_unary(UnaryType.RELU, m, n)
add = xt.dispatch_meltw_binary(BinaryType.ADD, m, n)
muladd = xt.dispatch_meltw_ternary(TernaryType.MULADD, m, n)

c1 = gemm(a, b, c)                # C = A@B + C
c2 = relu(c1)                     # C = relu(C)
c3 = add(c1, c2)                  # C = C + relu(C)
c4 = muladd(c1, c2, c3)           # C = C1*C2 + C3

ref1 = a @ b + c
ref2 = np.maximum(ref1, 0)
ref3 = ref1 + ref2
ref4 = ref1 * ref2 + ref3

for name, got, ref in [("gemm", c1, ref1), ("relu", c2, ref2),
                       ("add", c3, ref3), ("muladd", c4, ref4)]:
    info = xt.matdiff(ref, np.asarray(got))
    status = "OK" if info.normf_rel < 1e-5 else "FAIL"
    print(f"{name:8s} {status}  normf_rel={info.normf_rel:.2e} "
          f"linf_abs={info.linf_abs:.2e}")

info = xt.get_registry_info()
print(f"registry: {info['nkernels']} kernels, {info['hits']} hits, "
      f"{info['builds']} builds")
print(f"device: {xt.get_geometry().name}, on_tpu={xt.on_tpu()}")
