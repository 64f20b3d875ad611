"""xsmm-gen: AOT kernel pre-compilation from a JSON manifest.

TPU rendition of the reference's offline codegen pair
(/root/reference/src/libxsmm_generator_gemm_driver.c CLI and
src/libxsmm_binaryexport_generator.c + samples/static_codegen JSON
manifests): instead of emitting machine code, it dispatches every kernel in
the manifest so the XLA compilations land in the persistent compilation
cache (XSMM_TPU_COMPILATION_CACHE) — later processes start warm, the same
effect as the reference's `make MNK=...` static kernel registration
(src/libxsmm_main.c:622-666).

Manifest schema (JSON):
{
  "gemm":   [{"m":32,"n":32,"k":32,"dtype":"f32","beta":0,"br":0}, ...],
  "eltwise":[{"op":"RELU","kind":"unary","m":64,"n":64,"dtype":"f32"}, ...]
}

Usage: python -m libxsmm_tpu.utils.cli manifest.json [--bench]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _gen_gemm(spec: dict, bench: bool) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import libxsmm_tpu as xt
    from ..descriptor import (BatchReduceConfig, BatchReduceType, GemmFlags,
                              GemmShape)
    from ..dtypes import Datatype, to_jnp

    dt = Datatype(spec.get("dtype", "f32"))
    odt = Datatype(spec.get("out_dtype", spec.get("dtype", "f32")))
    shape = GemmShape(spec["m"], spec["n"], spec["k"], a_in_type=dt,
                      b_in_type=dt, out_type=odt)
    flags = GemmFlags.BETA_0 if spec.get("beta", 1) == 0 else GemmFlags.NONE
    br = int(spec.get("br", 0))
    batch = int(spec.get("batch", 0))
    if batch:
        kern = xt.dispatch_gemm_batched(shape, flags)
    elif br:
        kern = xt.dispatch_brgemm(
            shape, flags, BatchReduceConfig(BatchReduceType.STRIDE, br))
    else:
        kern = xt.dispatch_gemm(shape, flags)

    rng = np.random.default_rng(0)
    lead = (batch,) if batch else ((br,) if br else ())
    a = jnp.asarray(rng.standard_normal((*lead, shape.m, shape.k)),
                    to_jnp(dt))
    b = jnp.asarray(rng.standard_normal((*lead, shape.k, shape.n)),
                    to_jnp(dt))
    args = (a, b) if spec.get("beta", 1) == 0 else (
        a, b, jnp.zeros((*(lead if batch else ()), shape.m, shape.n),
                        to_jnp(odt)))
    out = kern(*args)          # trigger compile -> persistent cache
    jax.block_until_ready(out)
    note = ""
    if bench:
        from .timer import bench_chain
        per = bench_chain(kern, args, chain_idx=0, reps=20)
        note = f"  {xt.get_kernel_info(kern).nflops * max(1, batch) / per / 1e9:.1f} GF/s"
    return f"gemm {kern.name}{note}"


def _gen_eltwise(spec: dict, bench: bool) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import libxsmm_tpu as xt
    from ..descriptor import BinaryType, TernaryType, UnaryType
    from ..dtypes import Datatype, to_jnp

    kind = spec.get("kind", "unary")
    m, n = spec["m"], spec["n"]
    dt = Datatype(spec.get("dtype", "f32"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, n)), to_jnp(dt))
    if kind == "unary":
        kern = xt.dispatch_meltw_unary(UnaryType[spec["op"]], m, n,
                                       in_type=dt)
        out = kern(x)
    elif kind == "binary":
        kern = xt.dispatch_meltw_binary(BinaryType[spec["op"]], m, n,
                                        in_type=dt)
        out = kern(x, x)
    else:
        kern = xt.dispatch_meltw_ternary(TernaryType[spec["op"]], m, n,
                                         in_type=dt)
        out = kern(x, x, x)
    jax.block_until_ready(out)
    note = ""
    if bench:
        from .timer import bench_chain
        nargs = {"unary": 1, "binary": 2}.get(kind, 3)
        per = bench_chain(kern, (x,) * nargs, chain_idx=0, reps=20)
        gb = (nargs + 1) * x.nbytes / per / 1e9
        note = f"  {gb:.1f} GB/s"
    return f"eltwise {kern.name}{note}"


def _gen_spgemm(spec: dict, bench: bool) -> str:
    """Sparse kernels from a .mtx file — the reference CLI's sparse modes
    (bin/libxsmm_gemm_generator sparse/sparse_csr_reg consume .mtx,
    documentation/libxsmm_be.md arg list)."""
    import numpy as np

    from .mtx import read_mtx

    kind = spec.get("kind", "fsspmdm")
    a = read_mtx(spec["mtx"]).astype(np.float32)
    n = int(spec.get("n", 4800))
    if kind == "fsspmdm":
        from ..ops.fsspmdm import fsspmdm_create
        h = fsspmdm_create(n, a, beta=int(spec.get("beta", 0)))
        note = ""
        if bench:
            from .timer import bench_chain
            import jax.numpy as jnp
            b = jnp.asarray(np.random.default_rng(0).standard_normal(
                (a.shape[1], n)), jnp.float32)
            per = bench_chain(h.kernel.fn, (b,), chain_idx=0, reps=50)
            note = f"  {h.nnz * n / per / 1e9:.1f} Gnnz/s"
        return (f"fsspmdm {a.shape[0]}x{n}x{a.shape[1]} nnz={h.nnz} "
                f"[{h.kind}]{note}")
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)

    def _warm(kern, args, nnz_ops):
        # INVOKE so the XLA compilation lands in the persistent cache (the
        # tool's whole purpose); create_* builds lazily. nnz_ops = nnz x
        # the per-nonzero MAC width (N for A-sparse streaming, m for the
        # packed B-sparse kinds), the reference drivers' nnz accounting.
        out = kern(*args)
        jax.block_until_ready(out)
        if not bench:
            return ""
        from .timer import bench_chain
        per = bench_chain(kern, args, chain_idx=0, reps=20)
        return f"  {nnz_ops / per / 1e9:.1f} Gnnz/s"

    if kind == "csr_areg":
        from ..ops.sparse import CsrMatrix, create_spgemm_csr_areg
        from ..descriptor import GemmFlags, GemmShape
        csr = CsrMatrix.from_dense(a)
        kern = create_spgemm_csr_areg(
            GemmShape(a.shape[0], n, a.shape[1]), GemmFlags.BETA_0,
            row_ptr=csr.indptr, column_idx=csr.indices, values=csr.data)
        b = jnp.asarray(rng.standard_normal((a.shape[1], n)), jnp.float32)
        note = _warm(kern, (b,), csr.nnz * n)
        return f"csr_areg {kern.name} nnz={csr.nnz}{note}"
    if kind == "csc":
        # the reference CLI's `sparse` mode: CSC .mtx -> B-sparse packed
        # kernel (documentation/libxsmm_be.md; generator_spgemm + csc
        # reader). The .mtx holds B (k x n); m comes from the spec.
        from ..ops.sparse import CscMatrix, create_packed_spgemm_csc
        from ..descriptor import GemmFlags, GemmShape
        m = int(spec.get("m", 16))
        csc = CscMatrix.from_dense(a)
        kern = create_packed_spgemm_csc(
            GemmShape(m, a.shape[1], a.shape[0]), GemmFlags.BETA_0,
            column_ptr=csc.indptr, row_idx=csc.indices)
        lhs = jnp.asarray(rng.standard_normal((m, a.shape[0])), jnp.float32)
        vals = jnp.asarray(rng.standard_normal(csc.nnz), jnp.float32)
        note = _warm(kern, (lhs, vals), csc.nnz * m)
        return f"csc {kern.name} nnz={csc.nnz}{note}"
    if kind == "bcsc":
        # BCSC B-sparse from .mtx with block shape + lowering strategy
        # (the xgemm_sparse workload as an offline-precompile target)
        from ..ops.sparse import BcscMatrix, create_packed_spgemm_bcsc
        from ..descriptor import GemmFlags, GemmShape, SpgemmConfig
        m = int(spec.get("m", 128))
        bk = int(spec.get("bk", 32))
        bn = int(spec.get("bn", 32))
        bcsc = BcscMatrix.from_dense(a, bk, bn)
        kern = create_packed_spgemm_bcsc(
            GemmShape(m, a.shape[1], a.shape[0]), GemmFlags.BETA_0,
            SpgemmConfig(1, bk, bn), column_ptr=bcsc.indptr,
            row_idx=bcsc.indices,
            strategy=spec.get("strategy", "dense"))
        lhs = jnp.asarray(rng.standard_normal((m, a.shape[0])), jnp.float32)
        vals = jnp.asarray(rng.standard_normal((bcsc.nblocks, bk, bn)),
                           jnp.float32)
        note = _warm(kern, (lhs, vals), bcsc.nblocks * bk * bn * m)
        return f"bcsc {kern.name} nblocks={bcsc.nblocks} b{bk}x{bn}{note}"
    raise ValueError(f"unknown spgemm kind: {kind}")


_DRIVER_TYPES = ("dense", "dense_asm", "sparse", "sparse_csr",
                 "sparse_csr_reg")


def _driver_main(argv) -> int:
    """The reference generator driver's 17-positional-arg form
    (src/libxsmm_generator_gemm_driver.c:87-117; arg list documented in
    documentation/libxsmm_be.md):

        <dense|dense_asm|sparse|sparse_csr|sparse_csr_reg> file_out
        routine_name M N K LDA LDB LDC alpha beta aligned_a aligned_c
        ARCH PREFETCH PRECISION [mtx_file]

    Row-major contract: LDA/LDB/LDC must equal the natural dims or be <1
    (the reference's sparse-operand routing signal). alpha must be 1,
    beta 0 or 1 (the reference restriction). ARCH accepts this library's
    generation names (v4/v5e/v5p/v6e) or 'noarch' (= auto); the
    reference's x86 names map to auto with a notice. PREFETCH is accepted
    and ignored (XLA owns prefetch; only 'nopf' is supported there too).
    Appends the generated StableHLO module to file_out via generator.py.
    """
    from .. import generator as g
    from ..descriptor import GemmDescriptor, GemmFlags, GemmShape
    from ..dtypes import Datatype

    if len(argv) < 16:
        sys.stderr.write(_driver_main.__doc__ + "\n")
        return 1
    l_type, file_out, routine = argv[0], argv[1], argv[2]
    m, n, k, lda, ldb, ldc = (int(v) for v in argv[3:9])
    alpha, beta = float(argv[9]), float(argv[10])
    arch, prefetch, precision = argv[13], argv[14], argv[15]
    if alpha != 1.0 or beta not in (0.0, 1.0):
        sys.stderr.write("alpha must be 1 and beta 0/1 (reference "
                         "restriction, README 'limited to Alpha:=1')\n")
        return 1
    if prefetch != "nopf":
        sys.stderr.write(f"xsmm-gen: PREFETCH '{prefetch}' ignored (XLA "
                         "owns prefetching)\n")
    dt = {"SP": Datatype.F32, "DP": Datatype.F64,
          "BF16": Datatype.BF16}.get(precision.upper())
    if dt is None:
        sys.stderr.write(f"unknown PRECISION {precision!r} (SP/DP/BF16)\n")
        return 1
    if arch not in ("noarch", ""):
        from ..device import ARCHIDS
        if arch in ARCHIDS:
            from ..config import set_target
            set_target(arch)
        else:
            sys.stderr.write(f"xsmm-gen: ARCH '{arch}' is not a TPU "
                             "generation; using auto-detect\n")
    flags = GemmFlags.BETA_0 if beta == 0.0 else GemmFlags.NONE
    shape = GemmShape(m, n, k, a_in_type=dt, b_in_type=dt, out_type=dt)

    if l_type in ("dense", "dense_asm"):
        for name, ld, dim in (("LDA", lda, k), ("LDB", ldb, n),
                              ("LDC", ldc, n)):
            # the documented contract accepts any <1 value as the
            # "don't care" / sparse-routing signal (the reference treats
            # lda<1 the same way), not just exactly 0
            if ld >= 1 and ld != dim:
                sys.stderr.write(f"row-major contract: {name} must be "
                                 f"{dim} or <1 (XLA owns layout)\n")
                return 1
        desc = GemmDescriptor(shape=shape, flags=flags)
        if l_type == "dense":
            g.generator_gemm_inlineasm(file_out, routine, desc)
        else:
            g.generator_gemm_directasm(file_out, routine, desc)
    else:
        if len(argv) < 17:
            sys.stderr.write("sparse modes need the .mtx input file\n")
            return 1
        mtx = argv[16]
        if l_type == "sparse_csr_reg":
            from .mtx import read_mtx
            from ..ops.sparse import CsrMatrix
            import numpy as np
            dense = read_mtx(mtx)
            csr = CsrMatrix.from_dense(dense)
            vdt = np.float64 if dt == Datatype.F64 else np.float32
            gen = g.generator_spgemm_csr_reg_kernel(
                shape, csr.indptr, csr.indices,
                np.asarray(dense[dense != 0], vdt), flags)
            g._append_text(file_out, routine, gen, commented_header=True)
        else:
            # the reference routes the sparse OPERAND by which ld is <1
            # (lda -> A sparse, ldb -> B sparse); the type keyword only
            # selects the .mtx reader format
            if (lda < 1) == (ldb < 1):
                sys.stderr.write("exactly one of LDA/LDB must be <1 to "
                                 "mark the sparse operand\n")
                return 1
            g.generator_spgemm(file_out, routine,
                               GemmDescriptor(shape=shape, flags=flags),
                               None, mtx,
                               is_csr=int(l_type == "sparse_csr"),
                               sparse_operand="a" if lda < 1 else "b")
    print(f"xsmm-gen: appended {l_type} routine '{routine}' to {file_out}")
    return 0


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] in _DRIVER_TYPES:
        return _driver_main(argv)
    p = argparse.ArgumentParser(prog="xsmm-gen", description=__doc__)
    p.add_argument("manifest", help="JSON kernel manifest")
    p.add_argument("--bench", action="store_true",
                   help="report GFLOP/s per kernel")
    args = p.parse_args(argv)

    with open(args.manifest) as f:
        manifest = json.load(f)

    count = 0
    for spec in manifest.get("gemm", []):
        print(_gen_gemm(spec, args.bench))
        count += 1
    for spec in manifest.get("eltwise", []):
        print(_gen_eltwise(spec, args.bench))
        count += 1
    for spec in manifest.get("spgemm", []):
        print(_gen_spgemm(spec, args.bench))
        count += 1
    print(f"xsmm-gen: {count} kernels compiled")
    return 0


if __name__ == "__main__":
    sys.exit(main())
