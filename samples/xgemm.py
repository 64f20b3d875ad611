"""xgemm — the universal GEMM/BRGEMM kernel tester.

TPU rendition of /root/reference/samples/xgemm/gemm_kernel.c (5,415 LoC):
the full dtype x flag x BR x fusion acceptance matrix, golden-compared
through matdiff norms with per-dtype tolerances, GFLOP/s report from kernel
nflops. Exit code 0 only if every case passes (the reference distinguishes
reference-kernel runs via exit codes :29-37; here the NumPy/jnp oracle IS
the gold, so we report per-case).

Usage:
  python xgemm.py [ncases] [--bench]     randomized sample of the matrix
  python xgemm.py --full [--bench]       the ENTIRE descriptor-class matrix
                                         (>= 200 classes: every claimed
                                         dtype combo x beta x BR mode,
                                         VNNI_A/B/C layout contracts,
                                         transposes, MX/sub-byte packed
                                         operands, brgemm_ext argops/
                                         postops/SR-store/bitmask, packed
                                         fast-path ext)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BatchReduceConfig, BatchReduceType,
                                    BinaryPostops, BinaryType, GemmFlags,
                                    GemmShape, UnaryArgops, UnaryFlags,
                                    UnaryType)
from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.matdiff import DEFAULT_MARGINS, matdiff

D = Datatype

# (a_type, b_type, out_type, tolerance-class) — every storage combo the
# library claims, mirroring the reference's dtype gating
# (/root/reference/src/generator_gemm.c:272-370, typedefs.h:218-246)
BASE_COMBOS = [
    (D.F64, D.F64, D.F64, "f64"),
    (D.F32, D.F32, D.F32, "f32"),
    (D.BF16, D.BF16, D.F32, "bf16"),
    (D.BF16, D.BF16, D.BF16, "bf16"),
    (D.F16, D.F16, D.F32, "f16"),
    (D.F16, D.F16, D.F16, "f16"),
    (D.BF8, D.BF8, D.F32, "bf8"),
    (D.BF8, D.BF8, D.BF16, "bf8"),
    (D.HF8, D.HF8, D.F32, "hf8"),
    (D.I8, D.I8, D.I32, "exact"),
    (D.U8, D.U8, D.I32, "exact"),
]

# packed-operand combos (MX microscaling + sub-byte ints)
PACKED_COMBOS = [
    (D.MXFP4X2, D.BF16, D.F32, "mx4"),
    (D.MXFP4X2, D.MXFP4X2, D.F32, "mx4"),
    (D.NVFP4X2, D.BF16, D.F32, "mx4"),
    (D.MXBF8, D.BF16, D.F32, "bf8"),
    (D.MXBF8, D.MXBF8, D.F32, "bf8"),
    (D.MXBF6, D.BF16, D.F32, "mx6"),
    (D.MXHF6, D.BF16, D.F32, "mx6"),
    (D.I4X2, D.I8, D.I32, "exact"),
    (D.U4X2, D.U8, D.I32, "exact"),
    (D.I2X4, D.I8, D.I32, "exact"),
    (D.I1X8, D.I8, D.I32, "exact"),
    (D.I4X2, D.F16, D.F32, "f16"),
]

# "exact" (integer) and "mx4"/"mx6" tolerance classes are handled by
# dedicated compare branches in run_class (bit-exact / accumulation-order
# bounds), not by MARGINS lookups
MARGINS = dict(DEFAULT_MARGINS)

BR_MODES = ("none", "stride", "offset", "address")

_INT_TYPES = (D.I8, D.U8, D.I32)


def _vnni_factor(dt):
    from libxsmm_tpu.dtypes import bits
    return max(1, 32 // bits(dt))


def build_class_list():
    """Enumerate the full acceptance matrix as descriptor-class dicts."""
    classes = []

    # 1. base dtype combos x BR mode x beta  (the reference's core matrix)
    for combo in BASE_COMBOS:
        for br_mode in BR_MODES:
            for beta in (0, 1):
                classes.append(dict(kind="gemm", combo=combo,
                                    br_mode=br_mode, beta=beta))

    # 2. transposes (natural-layout dtypes; the reference restricts TRANS
    #    to non-VNNI operands)
    for combo in [BASE_COMBOS[0], BASE_COMBOS[1], BASE_COMBOS[2]]:
        for ta, tb in ((1, 0), (0, 1), (1, 1)):
            for beta in (0, 1):
                classes.append(dict(kind="gemm", combo=combo, br_mode="none",
                                    beta=beta, ta=ta, tb=tb))

    # 3. VNNI layout contracts (functional pack/unpack, ops/gemm.py
    #    _undo_vnni): VNNI_A, VNNI_B, VNNI_C and A+C per 16/8-bit dtype.
    #    VNNI_C needs a NARROW output dtype (factor > 1), so the loop must
    #    include the 16/8-bit-OUT combos ([3] bf16->bf16, [5] f16->f16,
    #    [7] bf8->bf16) — with only the ->f32/i32 combos every C/AC class
    #    was silently skipped (review finding: --full never tested VNNI_C)
    for combo in [BASE_COMBOS[2], BASE_COMBOS[3], BASE_COMBOS[4],
                  BASE_COMBOS[5], BASE_COMBOS[6], BASE_COMBOS[7],
                  BASE_COMBOS[8], BASE_COMBOS[9]]:
        for vnni in ("A", "B", "C", "AC"):
            if vnni in ("C", "AC") and combo[2] in (D.F32, D.I32):
                continue   # 32-bit outputs have VNNI factor 1
            classes.append(dict(kind="gemm", combo=combo, br_mode="none",
                                beta=0, vnni=vnni))
            classes.append(dict(kind="gemm", combo=combo, br_mode="stride",
                                beta=0, vnni=vnni))

    # 4. packed MX / sub-byte operands (gemm + BRGEMM stride)
    for combo in PACKED_COMBOS:
        classes.append(dict(kind="packed", combo=combo, br_mode="none",
                            beta=0))
        classes.append(dict(kind="packed", combo=combo, br_mode="stride",
                            beta=0))

    # 5. brgemm_ext fusion matrix: cp unary x postop x beta (+ argops,
    #    bitmask, stochastic-round store) on f32 and bf16
    for combo in [BASE_COMBOS[1], BASE_COMBOS[2]]:
        for cp in ("RELU", "GELU", "TANH", "SIGMOID", "X2"):
            for dpost in (False, True):
                for beta in (0, 1):
                    classes.append(dict(kind="ext", combo=combo, cp=cp,
                                        bias=dpost, beta=beta))
        classes.append(dict(kind="ext", combo=combo, cp="RELU", bias=False,
                            beta=0, bitmask=True))
        classes.append(dict(kind="ext", combo=combo, cp="NONE", bias=True,
                            beta=0, argop_a="X2"))
        classes.append(dict(kind="ext", combo=combo, cp="NONE", bias=False,
                            beta=0, store_cp=True))
    classes.append(dict(kind="ext", combo=(D.F32, D.F32, D.BF16, "bf16"),
                        cp="STOCHASTIC_ROUND", bias=False, beta=0))

    # 6. lane-packed fast-path ext (Pallas fused epilogue kernel)
    for cp in ("RELU", "GELU"):
        for dpost in (False, True):
            classes.append(dict(kind="ext_packed", cp=cp, bias=dpost,
                                beta=0))
    return classes


def _rand_mk(rng, cls):
    """Shape sampling honoring each class's divisibility constraints."""
    combo = cls.get("combo", (D.F32,) * 3 + ("f32",))
    adt = combo[0]
    if cls["kind"] == "packed":
        # payloads pack along k; MX needs 32|k (16 for NVFP4)
        m = int(rng.integers(1, 9)) * 8
        n = int(rng.integers(1, 9)) * 8
        k = int(rng.integers(1, 5)) * 64
        return m, n, k
    if cls["kind"] == "ext_packed":
        return 16 * int(rng.integers(1, 5)), 32, 64
    f = _vnni_factor(adt)
    vnni = cls.get("vnni", "")
    m = int(rng.integers(1, 101))
    n = int(rng.integers(1, 101))
    k = int(rng.integers(1, 101))
    if "A" in vnni:
        m = max(f, (m // f) * f)
    if "B" in vnni:
        k = max(f, (k // f) * f)
    if "C" in vnni:
        fo = _vnni_factor(combo[2])
        m = max(fo * f, (m // (fo * f)) * fo * f)
    return m, n, k


def _make_operand(rng, dt, shape):
    """Random operand in storage dtype; returns (device_array, f64_oracle)."""
    import jax.numpy as jnp
    from libxsmm_tpu.dtypes import to_jnp
    if dt in _INT_TYPES:
        lo, hi = (0, 128) if dt in (D.U8,) else (-100, 100)
        v = rng.integers(lo, hi, shape)
        return jnp.asarray(v, to_jnp(dt)), v.astype(np.float64)
    x = rng.standard_normal(shape)
    dev = jnp.asarray(x, to_jnp(dt))
    return dev, np.asarray(dev, np.float64)


def _make_packed_a(rng, dt, br, m, k):
    """Packed A operand + its decoded f64 oracle."""
    import jax.numpy as jnp
    from libxsmm_tpu import quant as q_
    shp = (br, m, k) if br else (m, k)
    if dt in (D.I4X2, D.U4X2, D.I2X4, D.I1X8):
        if dt == D.I4X2:
            vals = rng.integers(-8, 8, shp)
        elif dt == D.U4X2:
            vals = rng.integers(0, 16, shp)
        elif dt == D.I2X4:
            vals = rng.integers(-1, 2, shp)
        else:
            vals = rng.choice([-1, 1], shp)
        packed = q_.pack_subbyte_gemm(dt, vals.astype(np.int32))
        return packed, vals.astype(np.float64)
    x = (rng.standard_normal(shp) * 2).astype(np.float32)
    quant = {D.MXFP4X2: q_.mxfp4_quantize_blocks,
             D.NVFP4X2: q_.nvfp4_quantize_blocks,
             D.MXBF8: q_.mxbf8_quantize_blocks,
             D.MXBF6: lambda v: q_.mxfp6_quantize_blocks(v, "e3m2"),
             D.MXHF6: lambda v: q_.mxfp6_quantize_blocks(v, "e2m3")}[dt]
    deq = {D.MXFP4X2: q_.mxfp4_dequantize_blocks,
           D.NVFP4X2: q_.nvfp4_dequantize_blocks,
           D.MXBF8: q_.mxbf8_dequantize_blocks,
           D.MXBF6: lambda p, s: q_.mxfp6_dequantize_blocks(p, s, "e3m2"),
           D.MXHF6: lambda p, s: q_.mxfp6_dequantize_blocks(p, s, "e2m3")}[dt]
    # normalize block amax to powers of two: the reference's MXBF8 e5m2
    # payload overflows to inf for block mantissas > 1.875 (faithful but
    # useless for a finite-compare driver)
    xb = x.reshape(*shp[:-1], k // 32, 32).astype(np.float64)
    amax = np.maximum(np.abs(xb).max(-1, keepdims=True), 1e-9)
    x = (xb * (np.exp2(np.floor(np.log2(amax))) / amax)).reshape(shp)
    p, s = quant(jnp.asarray(x, jnp.float32))
    # decode in bf16 like the kernel does (exact)
    dec = np.asarray(deq(p, s), np.float64)
    return (p, s), dec


def _vnni_pack_np(x, f):
    *lead, r, c = x.shape
    return (x.reshape(*lead, r // f, f, c).swapaxes(-1, -2)
            .reshape(*lead, r // f, c * f))


def run_class(cls, rng, bench=False, verbose=True):
    import jax.numpy as jnp
    from libxsmm_tpu.dtypes import to_jnp

    kind = cls["kind"]
    combo = cls.get("combo", (D.F32, D.F32, D.F32, "f32"))
    adt, bdt, odt, tol = combo
    m, n, k = _rand_mk(rng, cls)
    beta = cls.get("beta", 0)
    br_mode = cls.get("br_mode", "none")
    br = int(rng.integers(2, 7)) if br_mode != "none" else 0
    ta, tb = cls.get("ta", 0), cls.get("tb", 0)
    vnni = cls.get("vnni", "")

    flags = GemmFlags.NONE
    if beta == 0:
        flags |= GemmFlags.BETA_0
    if ta:
        flags |= GemmFlags.TRANS_A
    if tb:
        flags |= GemmFlags.TRANS_B
    if "A" in vnni:
        flags |= GemmFlags.VNNI_A
    if "B" in vnni:
        flags |= GemmFlags.VNNI_B
    if "C" in vnni:
        flags |= GemmFlags.VNNI_C

    shape = GemmShape(m, n, k, a_in_type=adt, b_in_type=bdt, out_type=odt)
    if D.F64 in (adt, bdt, odt):
        # operands are built BEFORE dispatch (which normally flips x64)
        import jax
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
    label = (f"{kind} {adt.value}x{bdt.value}->{odt.value} {m}x{n}x{k}"
             f"{' br=' + br_mode if br else ''}{' tA' if ta else ''}"
             f"{' tB' if tb else ''}{' vnni' + vnni if vnni else ''}"
             f" beta={beta}")

    # ---- operands + oracle --------------------------------------------
    a_shape = (k, m) if ta else (m, k)
    b_shape = (n, k) if tb else (k, n)
    if br:
        pool = br + 3 if br_mode == "address" else br
        a_shape = (pool, *a_shape)
        b_shape = (pool, *b_shape)

    extra_args = ()
    if kind == "packed":
        a, a64 = _make_packed_a(rng, adt, br if br else 0, m, k)
        if bdt in (D.MXFP4X2, D.MXBF8):
            # quantize along k on the (.., n, k) view, then transpose the
            # trailing dims into the library's (.., k/pack, n) B contract
            bt, b64t = _make_packed_a(rng, bdt, br if br else 0, n, k)
            b = (jnp.swapaxes(jnp.asarray(bt[0]), -1, -2),
                 jnp.swapaxes(jnp.asarray(bt[1]), -1, -2))
            b64 = np.swapaxes(b64t, -1, -2)
        else:
            b, b64 = _make_operand(rng, bdt, b_shape)
        flags |= GemmFlags.VNNI_A
    else:
        a, a64 = _make_operand(rng, adt, a_shape)
        b, b64 = _make_operand(rng, bdt, b_shape)
        if "A" in vnni:
            a = jnp.asarray(_vnni_pack_np(np.asarray(a), _vnni_factor(adt)))
        if "B" in vnni:
            b = jnp.asarray(_vnni_pack_np(np.asarray(b), _vnni_factor(bdt)))

    am = np.swapaxes(a64, -1, -2) if ta else a64
    bm = np.swapaxes(b64, -1, -2) if tb else b64
    if br_mode == "address":
        idx_a = rng.integers(0, a_shape[0], br).astype(np.int32)
        idx_b = rng.integers(0, b_shape[0], br).astype(np.int32)
        am, bm = am[idx_a], bm[idx_b]
        extra_args = (idx_a, idx_b)
    elif br_mode == "offset":
        idx_a = np.arange(br, dtype=np.int32)
        idx_b = np.arange(br, dtype=np.int32)
        extra_args = (idx_a, idx_b)
    ref = np.einsum("bmk,bkn->mn", am, bm) if br else am @ bm

    c = None
    if beta == 1:
        cdt = to_jnp(odt)
        c64 = rng.standard_normal((m, n))
        if odt in _INT_TYPES:
            c64 = np.round(c64 * 10)
        c = jnp.asarray(c64, cdt)
        ref = ref + np.asarray(c, np.float64)

    # ---- dispatch + run -----------------------------------------------
    br_cfg = (BatchReduceConfig(getattr(BatchReduceType, br_mode.upper()),
                                br) if br else None)
    if kind in ("gemm", "packed"):
        if br:
            kern = xt.dispatch_brgemm(shape, flags, br_cfg)
        else:
            kern = xt.dispatch_gemm(shape, flags)
        args = (a, b) + ((c,) if c is not None else ()) + extra_args
        out = kern(*args)
    elif kind == "ext":
        cp = cls["cp"]
        argops = UnaryArgops(
            ap_type=getattr(UnaryType, cls.get("argop_a", "NONE")),
            cp_type=getattr(UnaryType, cp),
            cp_flags=(UnaryFlags.BITMASK_2BYTEMULT if cls.get("bitmask")
                      else UnaryFlags.NONE),
            store_cp=bool(cls.get("store_cp")))
        postops = (BinaryPostops(d_type=BinaryType.ADD) if cls.get("bias")
                   else BinaryPostops())
        if not br:
            br = 3
            a2 = jnp.asarray(rng.standard_normal((br, m, k)), to_jnp(adt))
            b2 = jnp.asarray(rng.standard_normal((br, k, n)), to_jnp(bdt))
            a, b = a2, b2
            a64 = np.asarray(a2, np.float64)
            b64 = np.asarray(b2, np.float64)
            ref = np.einsum("bmk,bkn->mn", a64, b64)
            if c is not None:
                ref = ref + np.asarray(c, np.float64)
        kern = xt.dispatch_brgemm_ext(
            shape, flags, BatchReduceConfig(BatchReduceType.STRIDE, br),
            argops=argops, postops=postops)
        args = [a, b]
        if beta == 1:
            args.append(c)
        d64 = None
        if cls.get("bias"):
            d64 = rng.standard_normal((m, n))
            args.append(jnp.asarray(d64, to_jnp(adt)))
            d64 = np.asarray(args[-1], np.float64)
        if cls.get("argop_a") == "X2":
            ref = np.einsum("bmk,bkn->mn", a64 * a64, b64)
        if d64 is not None:
            ref = ref + d64
        out = kern(*args, seed=7)
        if cls.get("store_cp") or cls.get("bitmask"):
            out, extra = out
            if cls.get("bitmask"):
                mask = np.asarray(xt.unpack_bitmask(extra["cp_bitmask"],
                                                    m, n))
                if not (mask == (ref > 0)).all():
                    print(f"FAIL {label} (bitmask mismatch)")
                    return False
        if cp == "RELU":
            ref = np.maximum(ref, 0)
        elif cp == "GELU":
            import scipy.special
            ref = 0.5 * ref * (1 + scipy.special.erf(ref / np.sqrt(2)))
        elif cp == "TANH":
            ref = np.tanh(ref)
        elif cp == "SIGMOID":
            ref = 1 / (1 + np.exp(-ref))
        elif cp == "X2":
            ref = ref * ref
        elif cp == "STOCHASTIC_ROUND":
            tol = "bf16"   # SR store: within one bf16 ulp
        label += f" cp={cp.lower()}{' +bias' if cls.get('bias') else ''}"
    elif kind == "ext_packed":
        cp = cls["cp"]
        br, q = 8, 2
        a2 = rng.standard_normal((br, m, k)).astype(np.float32)
        b2 = rng.standard_normal((br, k, n)).astype(np.float32)
        kern = xt.dispatch_brgemm_ext_packed(
            GemmShape(m, n, k), GemmFlags.BETA_0,
            BatchReduceConfig(BatchReduceType.STRIDE, br),
            argops=UnaryArgops(cp_type=getattr(UnaryType, cp)),
            postops=(BinaryPostops(d_type=BinaryType.ADD)
                     if cls.get("bias") else BinaryPostops()))
        ap = xt.pack_batched(jnp.asarray(a2), q)
        ref = np.einsum("bmk,bkn->mn", a2, b2).astype(np.float64)
        args = [ap, jnp.asarray(b2)]
        if cls.get("bias"):
            d64 = rng.standard_normal((1, n))
            args.append(None)
            out = kern(args[0], args[1], d_op=jnp.asarray(d64, jnp.float32))
            ref = ref + d64
        else:
            out = kern(args[0], args[1])
        if cp == "RELU":
            ref = np.maximum(ref, 0)
        else:
            import scipy.special
            ref = 0.5 * ref * (1 + scipy.special.erf(ref / np.sqrt(2)))
        label += f" cp={cp.lower()}{' +bias' if cls.get('bias') else ''}"
        tol = "f32"
    else:
        raise ValueError(kind)

    # ---- compare ------------------------------------------------------
    out_np = np.asarray(out, np.float64)
    if "C" in vnni:
        fo = _vnni_factor(odt)
        r, cdim = out_np.shape
        out_np = (out_np.reshape(r, cdim // fo, fo).swapaxes(-1, -2)
                  .reshape(r * fo, cdim // fo))
    info = matdiff(ref, out_np)
    if tol == "exact":
        ok = info.linf_abs == 0.0
    elif tol in ("mx4", "mx6"):
        # decoded-operand matmul in bf16 is exact up to accumulation order
        ok = info.normf_rel <= 1e-5 * max(1.0, np.sqrt(k))
    else:
        margin = MARGINS[tol] * max(1.0, np.sqrt(k * max(1, br)))
        ok = info.normf_rel <= margin or info.linf_abs <= margin
    gflops = ""
    if bench and kind in ("gemm", "packed") and not extra_args:
        from libxsmm_tpu.utils.timer import bench_chain
        per = bench_chain(kern, (a, b) if c is None else (a, b, c),
                          chain_idx=0 if kind == "gemm" else 1, reps=50)
        gflops = f"  {xt.get_kernel_info(kern).nflops / per / 1e9:8.1f} GF/s"
    if verbose or not ok:
        print(f"{'OK  ' if ok else 'FAIL'} {label:64s} "
              f"normf_rel={info.normf_rel:.2e}{gflops}")
    return ok


def main():
    full = "--full" in sys.argv
    bench = "--bench" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rng = np.random.default_rng(20260816)
    classes = build_class_list()
    if full:
        todo = classes
        print(f"xgemm --full: {len(classes)} descriptor classes")
    else:
        ncases = int(args[0]) if args else 25
        todo = [classes[int(rng.integers(0, len(classes)))]
                for _ in range(ncases)]
    results = []
    for cls in todo:
        try:
            results.append(run_class(cls, rng, bench))
        except Exception as e:
            print(f"FAIL {cls}: {type(e).__name__}: {e}")
            results.append(False)
    info = xt.get_registry_info()
    print(f"\n{sum(results)}/{len(results)} passed; registry: "
          f"{info['nkernels']} kernels, {info['hits']} hits")
    if full:
        # Machine-checkable acceptance artifact (reference discipline:
        # samples/xgemm/gemm_kernel.c:29-37 exit-code contract). bench.py
        # attaches the cached copy to BENCH extras each round.
        import json
        import subprocess
        import time

        import jax
        tally = {"classes": len(todo), "pass": int(sum(results)),
                 "ref_fallbacks": int(info["fallbacks"]),
                 "device": jax.devices()[0].platform,
                 "ran_at": time.strftime("%Y-%m-%dT%H:%M:%S%z")}
        try:   # pin the tally to the tree it validated (VERDICT r3 #2)
            tally["commit"] = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=pathlib.Path(__file__).resolve().parent.parent,
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or None
        except Exception:
            tally["commit"] = None
        print("xgemm_full " + json.dumps(tally))
        out = pathlib.Path(__file__).resolve().parent.parent / \
            "XGEMM_FULL.json"
        out.write_text(json.dumps(tally))
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
