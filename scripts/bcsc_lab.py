"""BCSC union-kernel lab: measure pipeline-variant candidates on the real
TPU at the bench shape (1024^3 bf16, 32x32 blocks) before promoting a
winner into kernels/spmm_pallas.py.

Hypothesis under test (r4, docs/TUNING.md "cost anatomy"): union4's gap to
the minimal-dot floor (25.4 us vs 12-15 us) is Mosaic scheduling — the
pl.when parity-branch duplication of the MXU dot prevents cross-step
pipelining, and the fills don't actually overlap. Candidates here use a
SINGLE code path per step:

  minimal   pure dot floor: resident A^T, rhs streamed as input, no fills
  chunkN    fused fills + dot split into N accumulate chunks, static
            unrolled (fill c+1 independent of dot c -> overlap without
            branches), f32 accumulator scratch
  dspipe    union4's double buffering via pl.ds computed offsets on a
            (2*U*bk, tm) scratch — one code path, no branch duplication

Usage: python scripts/bcsc_lab.py [--density 0.2] [--rounds 5]
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def build_pattern(density, seed=2, m=1024, k=1024, n=1024, bk=32, bn=32):
    from libxsmm_tpu.ops.sparse import BcscMatrix
    rng = np.random.default_rng(seed)
    bmat = rng.standard_normal((k, n)).astype(np.float32)
    keep = rng.random((k // bk, n // bn)) < density
    bmat *= np.kron(keep, np.ones((bk, bn), np.float32))
    return BcscMatrix.from_dense(bmat, bk, bn), rng


def union_maps(indptr, indices, n, bk, bn, nblocks):
    """(krows, gmap, U) exactly as build_bcsc_spmm_union computes them
    (no clustering)."""
    W = 128 // bn
    nsg = n // 128
    unions = []
    for g in range(nsg):
        rows = set()
        for j in range(g * W, (g + 1) * W):
            rows.update(int(r) for r in
                        indices[int(indptr[j]):int(indptr[j + 1])])
        unions.append(sorted(rows))
    U = max(1, max(len(u) for u in unions))
    krows = np.zeros((nsg, U), np.int32)
    gmap = np.full((nsg, U, W), nblocks, np.int32)
    for g, rows in enumerate(unions):
        rows = rows[:U]
        krows[g, :len(rows)] = rows
        rpos = {r: u for u, r in enumerate(rows)}
        for wj in range(W):
            j = g * W + wj
            for pos in range(int(indptr[j]), int(indptr[j + 1])):
                r = int(indices[pos])
                if r in rpos:
                    gmap[g, rpos[r], wj] = pos
    return krows, gmap, U, W, nsg


def make_variants(shape, bcsc, density):
    """Returns {name: fn(a, values) -> (m, n)} candidates."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from libxsmm_tpu import device

    m, n, k = shape
    bk = bn = 32
    nblocks = bcsc.nblocks
    indptr, indices = np.asarray(bcsc.indptr), np.asarray(bcsc.indices)
    krows, gmap, U, W, nsg = union_maps(indptr, indices, n, bk, bn, nblocks)
    print(f"U={U} (union density {U * bk / k:.3f}), nsg={nsg}, "
          f"nblocks={nblocks}", flush=True)
    in_dt = jnp.bfloat16
    out_dt = jnp.float32
    tm = m                         # bench shape fits resident at tm=m
    krows_d = jax.device_put(jnp.asarray(krows.reshape(-1)))
    gmap_d = jax.device_put(jnp.asarray(gmap.reshape(-1)))

    out = {}

    # ---- minimal dot floor: rhs streamed as input, no fills ----
    def dot_kernel(at_ref, rhs_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            at_ref[...], rhs_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    # operand A^T here is shaped (U*bk, tm) — ONE union panel resident,
    # reused for every group (timing-only; flops identical to the real
    # kernel, fetch traffic slightly lower: U*bk vs k rows of A)
    mincall = pl.pallas_call(
        dot_kernel,
        grid=(nsg,),
        in_specs=[pl.BlockSpec((U * bk, tm), lambda g: (0, 0)),
                  pl.BlockSpec((1, U * bk, 128), lambda g: (g, 0, 0))],
        out_specs=pl.BlockSpec((tm, 128), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dt),
        interpret=device.use_interpret(),
    )

    rhs_const = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((nsg, U * bk, 128)),
        in_dt))

    @jax.jit
    def minimal(a, values):
        apan = a.astype(in_dt).T[:U * bk, :]
        # chain liveness: fold one value element in so the chain through
        # values is honest (same contract as the real kernels)
        apan = apan + values[0, 0, 0].astype(in_dt) * 0
        return mincall(apan, rhs_const)

    out["minimal"] = minimal

    # ---- chunked accumulate, fused fills, single code path ----
    def make_chunk(nchunks):
        csl = -(-U // nchunks)          # slots per chunk (last may be short)
        spans = [(c * csl, min(U, (c + 1) * csl)) for c in range(nchunks)]
        spans = [(a, b) for a, b in spans if b > a]

        def kernel(krows_ref, gmap_ref, at_ref, vs_ref, o_ref,
                   acc, sa, sr):
            g = pl.program_id(0)
            for ci, (u0, u1) in enumerate(spans):
                cu = u1 - u0
                # fill chunk ci (A rows + rhs rows); buffers alternate by
                # STATIC python parity -> no traced branches
                a_buf, r_buf = sa[ci % 2], sr[ci % 2]
                for u in range(u0, u1):
                    idx = krows_ref[g * U + u]
                    a_buf[(u - u0) * bk:(u - u0 + 1) * bk, :] = \
                        at_ref[pl.ds(idx * bk, bk), :]
                    for w in range(W):
                        vdx = gmap_ref[(g * U + u) * W + w]
                        r_buf[(u - u0) * bk:(u - u0 + 1) * bk,
                              w * bn:(w + 1) * bn] = \
                            vs_ref[pl.ds(vdx * bk, bk), :]
                part = jax.lax.dot_general(
                    a_buf[pl.ds(0, cu * bk), :], r_buf[pl.ds(0, cu * bk), :],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if ci == 0:
                    acc[...] = part
                else:
                    acc[...] += part
            o_ref[...] = acc[...].astype(o_ref.dtype)

        csl_rows = spans[0][1] - spans[0][0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsg,),
            in_specs=[
                pl.BlockSpec((k, tm), lambda g, kr, gm: (g - g, g - g)),
                pl.BlockSpec(((nblocks + 1) * bk, bn),
                             lambda g, kr, gm: (g - g, g - g)),
            ],
            out_specs=pl.BlockSpec((tm, 128), lambda g, kr, gm: (g - g, g)),
            scratch_shapes=[
                pltpu.VMEM((tm, 128), jnp.float32),
                [pltpu.VMEM((csl_rows * bk, tm), in_dt) for _ in range(2)],
                [pltpu.VMEM((csl_rows * bk, 128), in_dt) for _ in range(2)],
            ],
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m, n), out_dt),
            interpret=device.use_interpret())

        @jax.jit
        def run(a, values):
            at = a.astype(in_dt).T
            v2d = jnp.concatenate(
                [values.astype(in_dt), jnp.zeros((1, bk, bn), in_dt)],
                axis=0).reshape((nblocks + 1) * bk, bn)
            return call(krows_d, gmap_d, at, v2d)

        return run

    out["chunk1"] = make_chunk(1)
    out["chunk2"] = make_chunk(2)
    out["chunk4"] = make_chunk(4)

    # ---- dspipe: double buffering via pl.ds offsets, one code path ----
    def ds_kernel(krows_ref, gmap_ref, at_ref, vs_ref, o_ref, sa, sr):
        g = pl.program_id(0)
        par = jax.lax.rem(g, jnp.int32(2))
        nxt = jax.lax.rem(g + 1, jnp.int32(2))

        def fill(a_off, r_off, grp):
            for u in range(U):
                idx = krows_ref[grp * U + u]
                sa[pl.ds(a_off + u * bk, bk), :] = \
                    at_ref[pl.ds(idx * bk, bk), :]
                for w in range(W):
                    vdx = gmap_ref[(grp * U + u) * W + w]
                    sr[pl.ds(r_off + u * bk, bk), w * bn:(w + 1) * bn] = \
                        vs_ref[pl.ds(vdx * bk, bk), :]

        @pl.when(g == 0)
        def _():
            fill(jnp.int32(0), jnp.int32(0), g)

        @pl.when(g + 1 < nsg)
        def _():
            fill(nxt * (U * bk), nxt * (U * bk), g + 1)

        o_ref[...] = jax.lax.dot_general(
            sa[pl.ds(par * (U * bk), U * bk), :],
            sr[pl.ds(par * (U * bk), U * bk), :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsg,),
        in_specs=[
            pl.BlockSpec((k, tm), lambda g, kr, gm: (g - g, g - g)),
            pl.BlockSpec(((nblocks + 1) * bk, bn),
                         lambda g, kr, gm: (g - g, g - g)),
        ],
        out_specs=pl.BlockSpec((tm, 128), lambda g, kr, gm: (g - g, g)),
        scratch_shapes=[
            pltpu.VMEM((2 * U * bk, tm), in_dt),
            pltpu.VMEM((2 * U * bk, 128), in_dt),
        ],
    )
    ds_call = pl.pallas_call(
        ds_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dt),
            interpret=device.use_interpret())

    @jax.jit
    def dspipe(a, values):
        at = a.astype(in_dt).T
        v2d = jnp.concatenate(
            [values.astype(in_dt), jnp.zeros((1, bk, bn), in_dt)],
            axis=0).reshape((nblocks + 1) * bk, bn)
        return ds_call(krows_d, gmap_d, at, v2d)

    out["dspipe"] = dspipe
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--density", type=float, default=0.2)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--variants", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from libxsmm_tpu.descriptor import GemmFlags, GemmShape, SpgemmConfig
    from libxsmm_tpu.dtypes import Datatype
    from libxsmm_tpu.ops.sparse import create_packed_spgemm_bcsc
    from libxsmm_tpu.utils.timer import bench_chain_interleaved

    print("devices:", jax.devices(), flush=True)
    m = k = n = 1024
    bk = bn = 32
    bcsc, rng = build_pattern(args.density)
    shape = GemmShape(m, n, k, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.F32)

    a_np = rng.standard_normal((m, k))
    a0 = jax.device_put(jnp.asarray(a_np, jnp.bfloat16))
    v = jax.device_put(jnp.asarray(bcsc.data, jnp.bfloat16))

    # library strategies
    fns = {}
    for s in ("dense", "union", "union4", "union4a", "union4d", "union5"):
        kern = create_packed_spgemm_bcsc(shape, GemmFlags.BETA_0,
                                         SpgemmConfig(1, bk, bn),
                                         column_ptr=bcsc.indptr,
                                         row_idx=bcsc.indices, strategy=s)
        fns[s] = kern

    fns.update(make_variants((m, n, k), bcsc, args.density))
    if args.variants:
        sel = set(args.variants.split(","))
        fns = {kk: vv for kk, vv in fns.items() if kk in sel}

    # correctness check vs dense XLA oracle (timing-only probes exempt)
    dense_b = np.zeros((k, n), np.float32)
    ip, ix = np.asarray(bcsc.indptr), np.asarray(bcsc.indices)
    dat = np.asarray(bcsc.data, np.float32)
    for j in range(n // bn):
        for pos in range(int(ip[j]), int(ip[j + 1])):
            r = int(ix[pos])
            dense_b[r * bk:(r + 1) * bk, j * bn:(j + 1) * bn] = dat[pos]
    oracle = (a_np.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)
              @ dense_b)
    for name, fn in fns.items():
        if name == "minimal":
            continue
        got = np.asarray(fn(a0, v), np.float32)
        err = np.max(np.abs(got - oracle)) / max(1e-30,
                                                 np.max(np.abs(oracle)))
        status = "OK" if err < 5e-2 else "FAIL"
        print(f"check {name}: rel-linf {err:.2e} {status}", flush=True)

    # chain steps: full-output consumption through the VALUES
    def make_step(fn):
        def step(vv):
            o = fn(a0, vv)
            z = (jnp.sum(o) * 0.0).astype(jnp.bfloat16)
            return vv.at[0, 0, 0].add(z)
        return step

    names = list(fns)
    cands = [(make_step(fns[nm]), (v,), 0) for nm in names]
    t0 = time.perf_counter()
    times, rows = bench_chain_interleaved(cands, rounds=args.rounds,
                                          per_round=True)
    print(f"measured in {time.perf_counter() - t0:.1f}s", flush=True)

    nnz = bcsc.nblocks * bk * bn
    useful = 2 * nnz * m
    print(f"\nuseful flops/call: {useful/1e9:.3f} GF")
    for nm, t in zip(names, times):
        if t is None:
            print(f"{nm:>10}: FAILED")
            continue
        print(f"{nm:>10}: {t*1e6:8.2f} us  useful {useful/t/1e12:6.2f} TF/s")
    # paired medians vs union4 (window-robust)
    if "union4" in names:
        bi = names.index("union4")
        for i, nm in enumerate(names):
            rs = [ti / tb for ti, tb in zip(rows[i] or [], rows[bi] or [])
                  if ti and tb]
            if rs:
                print(f"median paired t({nm})/t(union4): "
                      f"{float(np.median(rs)):.3f}")


if __name__ == "__main__":
    main()
