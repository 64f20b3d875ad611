"""eltwise — randomized unary/binary/ternary TPP sweep driver.

TPU rendition of /root/reference/samples/eltwise (10 drivers + 30 generated
shell templates sampling random (M,N) per run, eltwise_common.h golden
check): one driver sweeps random shapes x ops x dtypes against the NumPy
oracle through matdiff norms.

Usage: python eltwise.py [ncases]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import scipy.special

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BinaryFlags, BinaryType, TernaryType,
                                    UnaryFlags, UnaryType)
from libxsmm_tpu.matdiff import matdiff

UNARY = {
    UnaryType.IDENTITY: lambda x: x,
    UnaryType.X2: lambda x: x * x,
    UnaryType.RELU: lambda x: np.maximum(x, 0),
    UnaryType.TANH: np.tanh,
    UnaryType.SIGMOID: lambda x: 1 / (1 + np.exp(-x)),
    UnaryType.GELU: lambda x: 0.5 * x * (1 + scipy.special.erf(x / np.sqrt(2))),
    UnaryType.NEGATE: lambda x: -x,
    UnaryType.EXP: np.exp,
    UnaryType.SQRT: lambda x: np.sqrt(np.abs(x)),
}
BINARY = {
    BinaryType.ADD: np.add,
    BinaryType.MUL: np.multiply,
    BinaryType.SUB: np.subtract,
    BinaryType.MAX: np.maximum,
    BinaryType.MIN: np.minimum,
}


def run_case(rng):
    m = int(rng.integers(1, 130))
    n = int(rng.integers(1, 130))
    kind = rng.choice(["unary", "binary", "ternary", "reduce", "transform",
                       "grad", "dropout", "gather", "quant"])
    x = rng.standard_normal((m, n)).astype(np.float32)
    if kind == "dropout":
        # unary_dropout driver: stateful forward emits the packed bitmask,
        # backward consumes it (samples/eltwise/eltwise_unary_dropout.c)
        p = float(rng.uniform(0.1, 0.6))
        xp = np.abs(x) + 1.0
        fwd = xt.dispatch_meltw_unary(UnaryType.DROPOUT, m, n,
                                      UnaryFlags.BITMASK_2BYTEMULT,
                                      extra=(p,))
        out, pmask = fwd(xp, seed=int(rng.integers(1 << 30)))
        out = np.asarray(out)
        mask = np.asarray(xt.unpack_bitmask(np.asarray(pmask), m, n))
        ok = (np.allclose(out[mask], xp[mask] / (1 - p), rtol=1e-5)
              and np.all(out[~mask] == 0))
        inv = xt.dispatch_meltw_unary(UnaryType.DROPOUT_INV, m, n,
                                      UnaryFlags.BITMASK_2BYTEMULT,
                                      extra=(p,))
        g = rng.standard_normal((m, n)).astype(np.float32)
        giv = np.asarray(inv(g, np.asarray(pmask)))
        ok = ok and np.allclose(giv[mask], g[mask] / (1 - p), rtol=1e-5) \
            and np.all(giv[~mask] == 0)
        print(f"{'OK  ' if ok else 'FAIL'} {'dropout p=%.2f' % p:28s} "
              f"{m:4d}x{n:<4d} keep={mask.mean():.2f}")
        return bool(ok)
    if kind == "gather":
        # unary_gather_scatter driver: gather then scatter back
        cols = bool(rng.integers(2))
        axis_len = n if cols else m
        nidx = int(rng.integers(1, axis_len + 1))
        idx = rng.choice(axis_len, nidx, replace=False).astype(np.int32)
        flags = UnaryFlags.GS_COLS if cols else UnaryFlags.GS_ROWS
        gat = xt.dispatch_meltw_unary(UnaryType.GATHER, m, n, flags)
        out = np.asarray(gat(x, idx))
        ref = x[:, idx] if cols else x[idx, :]
        ok = np.array_equal(out, ref)
        sca = xt.dispatch_meltw_unary(UnaryType.SCATTER, m, n, flags)
        base = np.zeros_like(x)
        back = np.asarray(sca(out, idx, base))
        ref2 = base.copy()
        if cols:
            ref2[:, idx] = ref
        else:
            ref2[idx, :] = ref
        ok = ok and np.array_equal(back, ref2)
        label = f"gather/scatter {'cols' if cols else 'rows'}"
        print(f"{'OK  ' if ok else 'FAIL'} {label:28s} {m:4d}x{n:<4d} "
              f"nidx={nidx}")
        return bool(ok)
    if kind == "quant":
        # quant drivers: i8 QUANT (sign-sat) -> DEQUANT roundtrip
        from libxsmm_tpu.dtypes import Datatype
        scale = float(rng.uniform(4.0, 64.0))
        q = xt.dispatch_meltw_unary(UnaryType.QUANT, m, n,
                                    UnaryFlags.SIGN_SAT_QUANT,
                                    out_type=Datatype.I8)
        dq = xt.dispatch_meltw_unary(UnaryType.DEQUANT, m, n,
                                     in_type=Datatype.I8)
        qx = np.asarray(q(x, scale))
        ref_q = np.clip(np.round(x * scale), -128, 127).astype(np.int8)
        back = np.asarray(dq(qx, 1.0 / scale))   # DEQUANT multiplies by scf
        ok = (np.array_equal(qx, ref_q)
              and np.allclose(back, ref_q.astype(np.float32) / scale,
                              rtol=1e-6))
        print(f"{'OK  ' if ok else 'FAIL'} {'quant i8 s=%.1f' % scale:28s} "
              f"{m:4d}x{n:<4d} linf={np.abs(back - x).max():.3f}")
        return bool(ok)
    if kind == "grad":
        # the gradient-kernel family with the reference ABI: forward emits
        # the packed bitmask, backward consumes it with a runtime alpha
        # (generator_mateltwise_reference_impl.c:2140-2195)
        alpha = float(rng.uniform(0.05, 0.9))
        fwd_op = [UnaryType.RELU, UnaryType.LEAKY_RELU][rng.integers(2)]
        fwd = xt.dispatch_meltw_unary(fwd_op, m, n,
                                      UnaryFlags.BITMASK_2BYTEMULT)
        _, pmask = fwd(x, alpha=alpha)
        g = rng.standard_normal((m, n)).astype(np.float32)
        inv_op = (UnaryType.RELU_INV if fwd_op == UnaryType.RELU
                  else UnaryType.LEAKY_RELU_INV)
        inv = xt.dispatch_meltw_unary(inv_op, m, n,
                                      UnaryFlags.BITMASK_2BYTEMULT)
        out = np.asarray(inv(g, pmask, alpha=alpha))
        ref = np.where(x > 0, g,
                       0.0 if fwd_op == UnaryType.RELU else alpha * g)
        label = f"grad {inv_op.name} a={alpha:.2f}"
        info = matdiff(ref, out)
        ok = info.normf_rel <= 1e-4 or info.linf_abs <= 1e-4
        print(f"{'OK  ' if ok else 'FAIL'} {label:28s} {m:4d}x{n:<4d} "
              f"normf_rel={info.normf_rel:.2e}")
        return ok
    if kind == "unary":
        op = list(UNARY)[rng.integers(len(UNARY))]
        if op == UnaryType.SQRT:
            x = np.abs(x) + 0.1
        kern = xt.dispatch_meltw_unary(op, m, n)
        ref, out = UNARY[op](x), np.asarray(kern(x))
        label = f"unary {op.name}"
    elif kind == "binary":
        op = list(BINARY)[rng.integers(len(BINARY))]
        y = rng.standard_normal((m, n)).astype(np.float32)
        kern = xt.dispatch_meltw_binary(op, m, n)
        ref, out = BINARY[op](x, y), np.asarray(kern(x, y))
        label = f"binary {op.name}"
    elif kind == "ternary":
        y = rng.standard_normal((m, n)).astype(np.float32)
        z = rng.standard_normal((m, n)).astype(np.float32)
        kern = xt.dispatch_meltw_ternary(TernaryType.MULADD, m, n)
        ref, out = x * y + z, np.asarray(kern(x, y, z))
        label = "ternary MULADD"
    elif kind == "reduce":
        rows = bool(rng.integers(2))
        flags = UnaryFlags.REDUCE_ROWS if rows else UnaryFlags.REDUCE_COLS
        kern = xt.dispatch_meltw_unary(UnaryType.REDUCE_X_OP_ADD, m, n, flags)
        ref = x.sum(axis=1 if rows else 0, keepdims=True)
        out = np.asarray(kern(x))
        label = f"reduce add {'rows' if rows else 'cols'}"
    else:
        kern = xt.dispatch_meltw_unary(UnaryType.TRANSFORM_NORM_TO_NORMT,
                                       m, n)
        ref, out = x.T, np.asarray(kern(x))
        label = "transform NORMT"

    info = matdiff(ref, out)
    ok = info.normf_rel <= 1e-4 or info.linf_abs <= 1e-4
    print(f"{'OK  ' if ok else 'FAIL'} {label:28s} {m:4d}x{n:<4d} "
          f"normf_rel={info.normf_rel:.2e}")
    return ok


def main():
    ncases = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rng = np.random.default_rng(20260816)
    results = [run_case(rng) for _ in range(ncases)]
    print(f"\n{sum(results)}/{len(results)} passed")
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
