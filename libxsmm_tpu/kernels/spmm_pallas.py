"""Pallas BCSC SpMM kernel: pattern-driven block scheduling on the MXU.

The TPU-native equivalent of the reference's BCSC B-sparse AMX kernels
(/root/reference/src/generator_packed_spgemm_bcsc_bsparse_avx_avx2_avx512_amx.c):
where the reference JITs the block pattern into tile-load/compute sequences,
this kernel feeds the pattern through Pallas scalar prefetch
(PrefetchScalarGridSpec) so the BLOCK INDEX MAPS themselves are driven by
the sparsity structure:

  * grid = (m_tiles, nblocks): one step per (A row-tile, nonzero block),
    blocks in block-column (CSC) order;
  * the A input block is selected by the block's row id (prefetched),
    the output block by the block's column id;
  * consecutive steps hitting the same output block keep it resident in
    VMEM (Pallas revisiting); the first step of each column zeroes it.

Compared to the gather+segment-sum XLA formulation (ops/sparse.py
strategy="sparse"), A panels are NOT materialized per block — each is
DMA'd once per (row-tile, block), and the accumulator never round-trips
to HBM. Empty block-columns are padded with one zero block at create time
so every output block is visited.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import device
from ..descriptor import GemmShape, SpgemmConfig
from ..dtypes import Datatype, to_jnp


def _pad_empty_columns(indptr: np.ndarray, indices: np.ndarray,
                       nblocks_data: int
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Insert a dummy block (row 0, value index -> zero slot) into every
    empty block-column; returns (rows, cols, val_idx) flattened schedules."""
    nb = len(indptr) - 1
    rows, cols, vidx = [], [], []
    for jb in range(nb):
        s, e = int(indptr[jb]), int(indptr[jb + 1])
        if s == e:
            rows.append(0)
            cols.append(jb)
            vidx.append(nblocks_data)     # the appended zero block
        else:
            for l in range(s, e):
                rows.append(int(indices[l]))
                cols.append(jb)
                vidx.append(l)
    return (np.asarray(rows, np.int32), np.asarray(cols, np.int32),
            np.asarray(vidx, np.int32))


def _block_schedule(indptr: np.ndarray, indices: np.ndarray,
                    nblocks_data: int):
    """Shared schedule for the pattern-driven kernels: pad empty columns,
    mark each column's first visit, put everything device-resident. ONE
    implementation so build_bcsc_spmm and build_bcsc_spmm_super cannot
    silently diverge on the scheduling logic.

    Returns (nsteps, (rows, cols, vidx, first) device arrays)."""
    rows, cols, vidx = _pad_empty_columns(np.asarray(indptr),
                                          np.asarray(indices), nblocks_data)
    first = np.ones(len(rows), np.int32)
    first[1:] = (cols[1:] != cols[:-1]).astype(np.int32)
    return len(rows), tuple(
        jax.device_put(jnp.asarray(x)) for x in (rows, cols, vidx, first))


def _pick_m_tile(m: int, cap: int = 256) -> Optional[int]:
    """Largest row-tile <= cap dividing m (8-aligned when m > cap), or
    None. Shared coverage rule for the block-scheduled kernels: the old
    per-kernel `tm = min(m, 256); m % tm -> reject` duplicated the logic
    AND rejected shapes like m=384 that a 192-row tile serves fine."""
    if m <= cap:
        return m
    for tm in range(cap, 7, -8):
        if m % tm == 0:
            return tm
    return None


def build_bcsc_spmm(shape: GemmShape, config: SpgemmConfig,
                    indptr: np.ndarray, indices: np.ndarray
                    ) -> Optional[Callable]:
    """Return fn(a, values) -> C(m, n) with beta=0 semantics, or None when
    the descriptor doesn't fit this kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bk, bn = config.bk, config.bn
    m, n, k = shape.m, shape.n, shape.k
    if m % 8 or bk % 8 or bn % 8:
        return None
    if shape.a_in_type not in (Datatype.F32, Datatype.BF16):
        return None
    in_dt = to_jnp(shape.a_in_type)
    out_dt = to_jnp(shape.out_type)
    prec = (jax.lax.Precision.HIGHEST if shape.a_in_type == Datatype.F32
            else jax.lax.Precision.DEFAULT)

    nsteps, (rows_d, cols_d, vidx_d, first_d) = _block_schedule(
        indptr, indices, len(indices))
    tm = _pick_m_tile(m)
    if tm is None:
        return None
    m_tiles = m // tm

    # Mosaic requires trailing block dims to be 128-divisible OR equal to
    # the full array dims; so A is fed as panels (kb, m, bk) and C emitted
    # as column blocks (nb, m, bn) — trailing dims == full dims.
    nb = n // bn
    kb = k // bk

    def kernel(rows_ref, cols_ref, vidx_ref, first_ref,
               a_ref, v_ref, o_ref):
        l = pl.program_id(1)

        @pl.when(first_ref[l] == 1)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        # accumulator buffer is f32 regardless of out dtype (Mosaic
        # requires 32-bit matmul acc); cast happens outside the call
        o_ref[0] += jax.lax.dot(
            a_ref[0], v_ref[0],
            preferred_element_type=jnp.float32,
            precision=prec)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(m_tiles, nsteps),
        in_specs=[
            # A panel (row-tile x block-row), chosen by the block's row id
            pl.BlockSpec((1, tm, bk),
                         lambda i, l, rows, cols, vidx, first:
                         (rows[l], i, i - i)),
            # the block's values, chosen by its value index
            pl.BlockSpec((1, bk, bn),
                         lambda i, l, rows, cols, vidx, first:
                         (vidx[l], i - i, i - i)),
        ],
        out_specs=pl.BlockSpec((1, tm, bn),
                               lambda i, l, rows, cols, vidx, first:
                               (cols[l], i, i - i)),
    )

    isz = jnp.dtype(in_dt).itemsize
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, m, bn), jnp.float32),
        interpret=device.use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * tm * bk * bn * m_tiles,
            bytes_accessed=(nsteps * m_tiles * (tm * bk + bk * bn) * isz
                            + nb * m * bn * 4),
            transcendentals=0),
    )

    @jax.jit
    @jax.named_scope(f"xsmm_pallas_bcsc_{m}x{n}x{k}_b{bk}x{bn}")
    def run(rows, cols, vidx, first, a, values):
        vpad = jnp.concatenate(
            [values.astype(in_dt), jnp.zeros((1, bk, bn), in_dt)], axis=0)
        panels = (a.astype(in_dt).reshape(m, kb, bk)
                  .transpose(1, 0, 2))                      # (kb, m, bk)
        out = call(rows, cols, vidx, first, panels, vpad)
        return out.transpose(1, 0, 2).reshape(m, n).astype(out_dt)

    def fn(a, values):
        # schedule arrays are device-resident bound ARGS, not jit closure
        # constants (constants re-upload per call through the tunnel)
        return run(rows_d, cols_d, vidx_d, first_d, a, values)

    return fn


def _cluster_union_groups(indptr: np.ndarray, indices: np.ndarray,
                          W: int, min_gain: int = 1
                          ) -> Optional[np.ndarray]:
    """Greedy block-column clustering for the union kernel.

    The union kernel's compute scales with the MAX per-group k-union U
    (the rhs/scratch shapes are static over the worst group), so grouping
    ADJACENT block-columns — whose row supports are unrelated for a random
    pattern — pays union(W independent supports) ~ 1-(1-d)^W everywhere.
    Grouping columns with SIMILAR supports instead drives each group's
    union toward max(|support|). Greedy balanced assignment: place columns
    in decreasing support order into the non-full group whose union grows
    least (ties: smallest union). Python-int bitmasks make union/popcount
    O(kb/64) words.

    Plays the role of the reference's create-time block sequencing freedom
    (the JIT emits whatever block order it likes,
    generator_packed_spgemm_bcsc_bsparse_avx_avx2_avx512_amx.c) — lane
    packing makes column ORDER a free variable on TPU too; the cost is one
    (m, n) column gather to restore the caller's order.

    Returns the permuted block-column order (len nb), or None when the
    saving does not clear the restore-gather's cost: the output column
    gather re-reads and re-writes the whole (m, n) result (~2 HBM passes).
    Break-even (independent of m and n): saved MXU time
    nsg*ΔU*bk*m*128*2/peak vs gather 2*m*n*osz/hbm with n = nsg*128
    ⇒ ΔU*bk >= osz*peak/hbm k-rows — ~1000 rows at f32-out on v5e, NOT
    the ~128 the r3 heuristic assumed (the r4 bench measured the 4-panel
    gate regressing the structured case 0.78x: 9 saved panels paid a
    full-output gather). Callers pass that geometry-derived `min_gain`.
    """
    nb = len(indptr) - 1
    if nb % W or len(indices) == 0:
        return None
    nsg = nb // W
    masks = []
    for j in range(nb):
        mask = 0
        for r in indices[int(indptr[j]):int(indptr[j + 1])]:
            mask |= 1 << int(r)
        masks.append(mask)

    def max_union(groups_cols):
        worst = 1
        for cols in groups_cols:
            u = 0
            for j in cols:
                u |= masks[j]
            worst = max(worst, u.bit_count())
        return worst

    base = max_union([range(g * W, (g + 1) * W) for g in range(nsg)])

    order = sorted(range(nb), key=lambda j: -masks[j].bit_count())
    groups: list = [[] for _ in range(nsg)]
    gmasks = [0] * nsg
    for j in order:
        best, bestcost = None, None
        mj = masks[j]
        for g in range(nsg):
            if len(groups[g]) == W:
                continue
            u = gmasks[g] | mj
            cost = (u.bit_count() - gmasks[g].bit_count(), u.bit_count())
            if bestcost is None or cost < bestcost:
                best, bestcost = g, cost
        groups[best].append(j)
        gmasks[best] |= mj
    clustered = max(u.bit_count() for u in gmasks) if nsg else 1
    if clustered > base - max(1, min_gain):
        return None
    return np.asarray([j for g in groups for j in g], np.int32)


def build_bcsc_spmm_union(shape: GemmShape, config: SpgemmConfig,
                          indptr: np.ndarray, indices: np.ndarray,
                          double_buffer: bool = False,
                          cluster: bool = True,
                          assemble_dma: bool = False,
                          fuse_rhs: bool = False,
                          u_align: int = 1,
                          hbm_a: bool = False
                          ) -> Optional[Callable]:
    """K-union-compacted BCSC SpMM: fn(a, values) -> C(m, n), beta=0.

    The sparse lowering designed to beat densify at MODERATE block density
    (where per-block scheduling loses to the MXU and supertile occupancy
    saturates): output is processed in 128-lane COLUMN GROUPS; for each
    group the union of block-rows its columns touch is compacted along k at
    create time. Per grid step the kernel assembles the group's compacted
    A-panel stack (U*bk, tm) in VMEM from a RESIDENT transposed A — A is
    DMA'd from HBM once per m-tile, not per block — and runs ONE full-depth,
    full-lane MXU contraction against the group's compacted+densified
    values (U*bk, 128). Compute is union-density * dense (vs 1.0 for
    densify), all of it on 128-wide tiles.

    The create-time compaction plays the role of the reference's
    JIT-time block sequencing (generator_packed_spgemm_bcsc_bsparse_
    avx_avx2_avx512_amx.c); the union grouping is the TPU-native answer to
    its AMX tile loops.

    double_buffer=True ("union2"): two scratch panels in software-pipelined
    alternation — step g dots the panel assembled at step g-1 while
    assembling group g+1's panel into the OTHER buffer. The assembly is VPU
    copy work and the dot is MXU work with no data dependency between them,
    so Mosaic is free to interleave the two engines; the serial variant's
    assemble->dot chain forbids that (r3 estimate: assembly ~ half the step
    at 20% density). Costs 2x scratch VMEM (tm may shrink one notch).

    assemble_dma=True ("union3", implies the double-buffered pipeline):
    panel assembly runs as EXPLICIT async copies on the DMA engine
    (pltpu.make_async_copy, one per union slot, per-(buffer, slot) DMA
    semaphores) instead of VPU ref copies — step g starts group g+1's U
    copies, dots the current panel on the MXU, and only waits the next
    buffer's semaphores at step g+1. Assembly bandwidth then comes from
    the copy engines and overlaps the dot by HARDWARE, not by Mosaic's
    scheduling discretion (VERDICT r3 #6: the union kernel's measured gap
    to useful peak is assembly-bound at 20%% density).

    fuse_rhs=True ("union4", implies the double-buffered pipeline): the
    RHS compaction — a SEPARATE Pallas pass in the other variants, whose
    (nsg, U*bk, 128) product round-trips HBM (write + read-back) every
    call — is fused INTO the kernel. The padded value store is tiny
    (nnz-proportional) and sits VMEM-resident for the whole call; each
    step assembles the NEXT group's rhs panel into double-buffered
    scratch right next to the A-panel assembly, so both assemblies
    overlap the MXU dot and the rhs bytes never touch HBM (r4: the
    separate-pass design left bcsc20 at 0.111 useful-peak with the rhs
    round-trip + extra launch on the critical path).
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bk, bn = config.bk, config.bn
    m, n, k = shape.m, shape.n, shape.k
    if 128 % bn or n % 128 or k % bk:
        return None
    if shape.a_in_type not in (Datatype.F32, Datatype.BF16):
        return None
    in_dt = to_jnp(shape.a_in_type)
    out_dt = to_jnp(shape.out_type)
    sub = 8 if in_dt == jnp.float32 else 16
    if bk % sub or m % sub:
        return None
    prec = (jax.lax.Precision.HIGHEST if shape.a_in_type == Datatype.F32
            else jax.lax.Precision.DEFAULT)

    W = 128 // bn                   # block-columns per 128-lane group
    nb = n // bn
    nsg = n // 128
    nblocks = len(indices)
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)

    # create-time block-column clustering: regroup columns to minimize the
    # max per-group union (the quantity compute scales with); restore the
    # caller's column order with one output gather. Break-even gain is
    # osz*peak/hbm saved k-rows (see _cluster_union_groups) — geometry-
    # derived, NOT a constant: the r3 4-panel gate measured 0.78x on the
    # structured bench case because the (m, n) restore gather out-costs
    # hundreds of saved union rows.
    geo = device.get_geometry()
    peak = (geo.peak_bf16_tflops if in_dt == jnp.bfloat16
            else geo.peak_f32_tflops)
    gain_rows = (jnp.dtype(out_dt).itemsize
                 * peak * 1e12 / (geo.hbm_gbps * 1e9))
    perm = (_cluster_union_groups(indptr, indices, W,
                                  min_gain=-(-int(gain_rows) // bk))
            if cluster else None)
    if perm is not None:
        counts = np.diff(indptr)[perm]
        vmap = np.concatenate(
            [np.arange(int(indptr[j]), int(indptr[j + 1]), dtype=np.int64)
             for j in perm]) if nblocks else np.zeros(0, np.int64)
        indices = indices[vmap] if nblocks else indices
        indptr = np.concatenate(
            [[0], np.cumsum(counts)]).astype(indptr.dtype)
        # out column selector: original block-col j sits at group position
        # inv[j] after permutation
        inv = np.empty(nb, np.int64)
        inv[perm] = np.arange(nb)
        colsel = (inv[:, None] * bn
                  + np.arange(bn)[None, :]).reshape(-1).astype(np.int32)
        colsel_d = jax.device_put(jnp.asarray(colsel))
    else:
        vmap = None

    # per-group union of block-rows + value-gather map (host, create time)
    unions = []
    for g in range(nsg):
        rows = set()
        for j in range(g * W, (g + 1) * W):
            rows.update(int(r) for r in
                        indices[int(indptr[j]):int(indptr[j + 1])])
        unions.append(sorted(rows))
    U = max(1, max(len(u) for u in unions))
    if u_align > 1:
        # pad the union depth so the contraction U*bk is MXU-aligned
        # (u_align = 128//bk -> %128 contraction): the pad slots point at
        # block-row 0 of A times the appended ZERO value block, so they
        # contribute nothing — trade ~u_align/2 extra bk-rows of dot for
        # an aligned contraction ("union4a"; r5 lab: the 672-row dot ran
        # 0.62-0.73 of peak and misalignment was a suspect)
        U = -(-U // u_align) * u_align
    if U * bk > k:
        U = k // bk                 # fully dense union: still correct
    krows = np.zeros((nsg, U), np.int32)
    gmap = np.full((nsg, U, W), nblocks, np.int32)   # -> appended zero block
    for g, rows in enumerate(unions):
        rows = rows[:U]
        krows[g, :len(rows)] = rows
        rpos = {r: u for u, r in enumerate(rows)}
        for wj in range(W):
            j = g * W + wj
            for pos in range(int(indptr[j]), int(indptr[j + 1])):
                r = int(indices[pos])
                if r in rpos:
                    # value indices address the caller's ORIGINAL value
                    # array; map back through the clustering permutation
                    gmap[g, rpos[r], wj] = (int(vmap[pos])
                                            if vmap is not None else pos)
    krows_d = jax.device_put(jnp.asarray(krows.reshape(-1)))
    gmap_d = jax.device_put(jnp.asarray(gmap.reshape(-1)))

    # m-tile: keep resident A^T (k, tm) + scratch panel(s) (U*bk, tm) +
    # buffers within ~half of VMEM
    budget = device.get_geometry().vmem_bytes // 2
    isz = jnp.dtype(in_dt).itemsize
    if assemble_dma and fuse_rhs:
        return None                 # one pipeline flavor at a time
    if hbm_a:
        # union5 = union4's fused rhs + the A-prologue overlap: A^T is an
        # ANY-space operand, its bulk HBM->VMEM copy is issued by the
        # kernel itself and lands WHILE groups 0/1 run off per-slot
        # direct-HBM panel DMAs (VERDICT r4 #2(c): the serial resident-
        # block prologue costs ~2.7 us of a ~23 us call)
        if assemble_dma:
            return None
        fuse_rhs = True
    if assemble_dma or fuse_rhs:
        double_buffer = True        # both pipelines ARE double-buffered
    nbuf = 2 if double_buffer else 1
    # fused-rhs residents: the padded value store (lane-padded to 128 in
    # VMEM tiling) + two rhs panel buffers
    extra = (((nblocks + 1) * bk * max(bn, 128)
              + 2 * U * bk * 128) * isz if fuse_rhs else 0)
    if extra > budget // 2:
        return None                 # value store too big to sit resident
    tm = m
    while tm > sub and (k + nbuf * U * bk) * tm * isz + extra > budget:
        tm //= 2
    if m % tm:
        return None
    # Mosaic legality: the A^T block (k, tm) has tm as its TRAILING dim —
    # it must be %128 or the full dim — and the (tm, 128) output block
    # needs sublane-aligned tm. An illegal tile must make the BUILDER
    # bail (None -> the autotune drops the candidate) instead of handing
    # back a kernel that fails only at deferred Mosaic compile on real
    # TPU (interpret-mode CI hides it).
    if (tm != m and tm % 128) or tm % sub:
        return None
    if hbm_a and tm % 128:
        # the manual HBM panel DMAs need a 128-lane-aligned column slice;
        # tm=32-class geometries crash the Mosaic compile (r5, measured on
        # hardware — interpret mode hides it), so the builder refuses and
        # the autotuner drops the candidate
        return None
    m_tiles = m // tm

    def assemble(krows_ref, at_ref, dst, grp):
        for u in range(U):          # static unroll: U is a create-time const
            idx = krows_ref[grp * U + u]
            dst[u * bk:(u + 1) * bk, :] = at_ref[pl.ds(idx * bk, bk), :]

    def dot_group(cur, rhs_ref, o_ref):
        # Mosaic requires a 32-bit matmul accumulator: dot in f32 and cast
        # on the store (a bf16 preferred_element_type fails TPU verification)
        o_ref[...] = jax.lax.dot_general(
            cur[...], rhs_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(o_ref.dtype)

    def kernel(krows_ref, at_ref, rhs_ref, o_ref, scratch):
        g = pl.program_id(1)
        assemble(krows_ref, at_ref, scratch, g)
        dot_group(scratch, rhs_ref, o_ref)

    def kernel_db(krows_ref, at_ref, rhs_ref, o_ref, s0, s1):
        # Software-pipelined alternation: group g's panel was assembled at
        # step g-1 (prologue for g==0); while the MXU dots it, the VPU
        # assembles group g+1 into the other buffer — no dependency between
        # the two, so Mosaic may overlap the engines. Parity is unrolled
        # into pl.when branches (a traced leading index on a 3-D scratch
        # write is a Mosaic hazard; the branch duplication is static).
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():                     # new m-tile: at_ref changed, group 0
            assemble(krows_ref, at_ref, s0, g)   # must re-assemble (par 0)

        even = jax.lax.rem(g, jnp.int32(2)) == 0

        def body(cur, nxt):
            @pl.when(g + 1 < nsg)
            def _():
                assemble(krows_ref, at_ref, nxt, g + 1)
            dot_group(cur, rhs_ref, o_ref)

        @pl.when(even)
        def _():
            body(s0, s1)

        @pl.when(jnp.logical_not(even))
        def _():
            body(s1, s0)

    def kernel_dma(krows_ref, at_ref, rhs_ref, o_ref, s0, s1, sems):
        """DMA-assembled pipeline: the U per-slot copies for group g+1 run
        on the copy engines WHILE the MXU dots group g's panel; their
        semaphores are awaited only when that buffer is consumed. sems is
        a (2, U) DMA semaphore array, slot [buf][u]."""
        g = pl.program_id(1)

        def start_copies(buf, bsl, grp):
            for u in range(U):
                idx = krows_ref[grp * U + u]
                # i32 semaphore indices: python-int indices trace as i64
                # under jax_enable_x64 (flipped globally by any F64
                # dispatch) and tpu.memref_slice rejects i64 (r4 suite)
                pltpu.make_async_copy(
                    at_ref.at[pl.ds(idx * bk, bk), :],
                    buf.at[u * bk:(u + 1) * bk, :],
                    sems.at[jnp.int32(bsl), jnp.int32(u)]).start()

        def wait_copies(buf, bsl, grp):
            for u in range(U):
                idx = krows_ref[grp * U + u]
                pltpu.make_async_copy(
                    at_ref.at[pl.ds(idx * bk, bk), :],
                    buf.at[u * bk:(u + 1) * bk, :],
                    sems.at[jnp.int32(bsl), jnp.int32(u)]).wait()

        @pl.when(g == 0)
        def _():                     # new m-tile: prologue group 0 into s0
            start_copies(s0, 0, g)

        even = jax.lax.rem(g, jnp.int32(2)) == 0

        def body(cur, cur_sl, nxt, nxt_sl):
            @pl.when(g + 1 < nsg)
            def _():
                start_copies(nxt, nxt_sl, g + 1)
            wait_copies(cur, cur_sl, g)
            dot_group(cur, rhs_ref, o_ref)

        @pl.when(even)
        def _():
            body(s0, 0, s1, 1)

        @pl.when(jnp.logical_not(even))
        def _():
            body(s1, 1, s0, 0)

    def kernel_fused(krows_ref, gmap_ref, at_ref, vs_ref, o_ref,
                     s0, s1, r0, r1):
        """union4: rhs panels assembled IN-KERNEL from the VMEM-resident
        padded value store (vs_ref), double-buffered like the A panels —
        the rhs never round-trips HBM and there is no second pass."""
        g = pl.program_id(1)

        def fill(dst_a, dst_r, grp):
            assemble(krows_ref, at_ref, dst_a, grp)
            for u in range(U):
                for w in range(W):   # static unroll: U, W create-time
                    idx = gmap_ref[(grp * U + u) * W + w]
                    dst_r[u * bk:(u + 1) * bk, w * bn:(w + 1) * bn] = \
                        vs_ref[pl.ds(idx * bk, bk), :]

        @pl.when(g == 0)
        def _():                     # new m-tile: prologue group 0
            fill(s0, r0, g)

        even = jax.lax.rem(g, jnp.int32(2)) == 0

        def body(cur_a, cur_r, nxt_a, nxt_r):
            @pl.when(g + 1 < nsg)
            def _():
                fill(nxt_a, nxt_r, g + 1)
            o_ref[...] = jax.lax.dot_general(
                cur_a[...], cur_r[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(o_ref.dtype)

        @pl.when(even)
        def _():
            body(s0, r0, s1, r1)

        @pl.when(jnp.logical_not(even))
        def _():
            body(s1, r1, s0, r0)

    def kernel_hbm(krows_ref, gmap_ref, at_hbm, vs_ref, o_ref,
                   a_vm, s0, s1, r0, r1, sems, bulk_sem):
        """union5: union4's fused-rhs pipeline with the A-prologue
        OVERLAPPED — A^T stays in HBM (ANY space); at each m-tile's first
        step the kernel launches the bulk (k, tm) copy into a_vm and
        feeds groups 0/1 from per-slot direct-HBM panel DMAs while it
        lands; groups >=2 assemble from the VMEM copy exactly like
        union4. Every DMA is awaited exactly once (Mosaic contract):
        panel sems (2, U) at g==0/g==1, the bulk at g==1."""
        i = pl.program_id(0)
        g = pl.program_id(1)
        coff = i * tm                    # this m-tile's column offset

        def hbm_panel_copy(buf, bsl, grp):
            for u in range(U):
                idx = krows_ref[grp * U + u]
                yield pltpu.make_async_copy(
                    at_hbm.at[pl.ds(idx * bk, bk), pl.ds(coff, tm)],
                    buf.at[u * bk:(u + 1) * bk, :],
                    sems.at[jnp.int32(bsl), jnp.int32(u)])

        def fill_rhs(dst_r, grp):
            for u in range(U):
                for w in range(W):       # static unroll
                    idx = gmap_ref[(grp * U + u) * W + w]
                    dst_r[u * bk:(u + 1) * bk, w * bn:(w + 1) * bn] = \
                        vs_ref[pl.ds(idx * bk, bk), :]

        def fill_a(dst_a, grp):          # from the landed VMEM copy
            for u in range(U):
                idx = krows_ref[grp * U + u]
                dst_a[u * bk:(u + 1) * bk, :] = \
                    a_vm[pl.ds(idx * bk, bk), :]

        bulk = pltpu.make_async_copy(
            at_hbm.at[:, pl.ds(coff, tm)], a_vm, bulk_sem)

        @pl.when(g == 0)
        def _():                         # new m-tile prologue
            if nsg > 1:
                bulk.start()
            for cp in hbm_panel_copy(s0, 0, 0):
                cp.start()
            fill_rhs(r0, 0)
            if nsg > 1:
                for cp in hbm_panel_copy(s1, 1, 1):
                    cp.start()
                fill_rhs(r1, 1)

        @pl.when(g == 0)
        def _():
            for cp in hbm_panel_copy(s0, 0, 0):
                cp.wait()

        @pl.when(g == 1)
        def _():
            bulk.wait()
            for cp in hbm_panel_copy(s1, 1, 1):
                cp.wait()

        even = jax.lax.rem(g, jnp.int32(2)) == 0

        def body(cur_a, cur_r, nxt_a, nxt_r):
            @pl.when(jnp.logical_and(g >= 1, g + 1 < nsg))
            def _():                     # groups 0/1 were DMA-prefilled
                fill_a(nxt_a, g + 1)
                fill_rhs(nxt_r, g + 1)
            o_ref[...] = jax.lax.dot_general(
                cur_a[...], cur_r[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(o_ref.dtype)

        @pl.when(even)
        def _():
            body(s0, r0, s1, r1)

        @pl.when(jnp.logical_not(even))
        def _():
            body(s1, r1, s0, r0)

    scratch_shapes = [pltpu.VMEM((U * bk, tm), in_dt)
                      for _ in range(nbuf)]
    if assemble_dma:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2, U)))
    if fuse_rhs:
        scratch_shapes += [pltpu.VMEM((U * bk, 128), in_dt),
                           pltpu.VMEM((U * bk, 128), in_dt)]
    if hbm_a:
        # a_vm leads the scratch list (ref order: a_vm, s0, s1, r0, r1,
        # panel sems, bulk sem)
        scratch_shapes = ([pltpu.VMEM((k, tm), in_dt)] + scratch_shapes
                          + [pltpu.SemaphoreType.DMA((2, U)),
                             pltpu.SemaphoreType.DMA])

    if hbm_a:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,      # krows + gmap
            grid=(m_tiles, nsg),
            in_specs=[
                # A^T stays in HBM; the kernel schedules its own copies
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                # the PADDED 2-D value store, resident for the whole call
                pl.BlockSpec(((nblocks + 1) * bk, bn),
                             lambda i, g, krows, gmap: (i - i, i - i)),
            ],
            out_specs=pl.BlockSpec((tm, 128),
                                   lambda i, g, krows, gmap: (i, g)),
            scratch_shapes=scratch_shapes,
        )
    elif fuse_rhs:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,      # krows + gmap
            grid=(m_tiles, nsg),
            in_specs=[
                # A^T block (k, tm): resident across the inner grid dim
                pl.BlockSpec((k, tm),
                             lambda i, g, krows, gmap: (i - i, i)),
                # the PADDED 2-D value store, resident for the whole call
                pl.BlockSpec(((nblocks + 1) * bk, bn),
                             lambda i, g, krows, gmap: (i - i, i - i)),
            ],
            out_specs=pl.BlockSpec((tm, 128),
                                   lambda i, g, krows, gmap: (i, g)),
            scratch_shapes=scratch_shapes,
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_tiles, nsg),
            in_specs=[
                # A^T block (k, tm): index varies only with the OUTER grid
                # dim, so it stays VMEM-resident across all nsg inner steps
                # — one HBM read of A per m-tile instead of one per block
                pl.BlockSpec((k, tm), lambda i, g, krows: (i - i, i)),
                # the group's compacted+densified values
                pl.BlockSpec((1, U * bk, 128),
                             lambda i, g, krows: (g, i - i, i - i)),
            ],
            out_specs=pl.BlockSpec((tm, 128), lambda i, g, krows: (i, g)),
            scratch_shapes=scratch_shapes,
        )

    osz = jnp.dtype(out_dt).itemsize
    call = pl.pallas_call(
        kernel_hbm if hbm_a else (
            kernel_fused if fuse_rhs else (
                kernel_dma if assemble_dma else (
                    kernel_db if double_buffer else kernel))),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dt),
        interpret=device.use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsg * U * bk * 128 * m,
            bytes_accessed=(m_tiles * k * tm * isz
                            + ((nblocks + 1) * bk * bn if fuse_rhs
                               else nsg * U * bk * 128) * isz
                            + m * n * osz),
            transcendentals=0),
    )

    # RHS compaction (non-fused variants only): a one-pass Pallas gather
    # kernel when the value store fits VMEM (the XLA take + 5-D transpose
    # chain costs ~a matmul's worth of time per call, r3 probe); XLA
    # fallback otherwise. union4 assembles the rhs inside the main kernel.
    compactor = (None if fuse_rhs else
                 build_union_compact_rhs(nsg, U, W, bk, bn, nblocks,
                                         gmap, in_dt))

    @jax.jit
    @jax.named_scope(
        f"xsmm_pallas_bcsc_union"
        f"{'5' if hbm_a else ('4' if fuse_rhs else ('2' if double_buffer else ''))}"
        f"_{m}x{n}x{k}_U{U}")
    def run(krows_j, gmap_j, colsel_j, a, values):
        at = a.astype(in_dt).T
        if fuse_rhs:
            v2d = jnp.concatenate(
                [values.astype(in_dt), jnp.zeros((1, bk, bn), in_dt)],
                axis=0).reshape((nblocks + 1) * bk, bn)
            out = call(krows_j, gmap_j, at, v2d)
        elif compactor is not None:
            v2d = jnp.concatenate(
                [values.astype(in_dt), jnp.zeros((1, bk, bn), in_dt)],
                axis=0).reshape((nblocks + 1) * bk, bn)
            # thread the threaded gmap_j through (same flattened map) so
            # it stays a runtime arg, not an inlined closure constant
            rhs = compactor(gmap_j, v2d)
            out = call(krows_j, at, rhs)
        else:
            vpad = jnp.concatenate(
                [values.astype(in_dt), jnp.zeros((1, bk, bn), in_dt)],
                axis=0)
            rhs = jnp.take(vpad, gmap_j, axis=0).reshape(nsg, U, W, bk, bn)
            rhs = rhs.transpose(0, 1, 3, 2, 4).reshape(nsg, U * bk, 128)
            out = call(krows_j, at, rhs)
        if colsel_j is not None:
            # clustering permuted the lane groups; one column gather
            # restores the caller's order (HBM-cheap vs the saved MXU work)
            out = jnp.take(out, colsel_j, axis=1)
        return out

    csel = colsel_d if perm is not None else None

    def fn(a, values):
        return run(krows_d, gmap_d, csel, a, values)

    fn.union_panels = U            # introspection for tests/autotune logs
    fn.clustered = perm is not None
    return fn


def build_bcsc_densify(shape: GemmShape, config: SpgemmConfig,
                       indptr: np.ndarray, indices: np.ndarray
                       ) -> Optional[Callable]:
    """Pallas densifier for the BCSC "dense" strategy: values -> dense B.

    fn(values (nblocks, bk, bn)) -> (k, n). Replaces the per-call XLA
    take + 4-D transpose (which round-trips the expanded B through HBM
    twice and relayouts it) with ONE pass: the padded value store sits in
    VMEM ((nblocks+1)*bk, bn 2-D layout), each grid step writes one (bk, n)
    row-panel of B with nb static-lane-offset copies selected by the
    scalar-prefetched gather map. The r3 probe measured the XLA expansion
    chain costing ~as much as the 1024^3 matmul it feeds.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bk, bn = config.bk, config.bn
    k, n = shape.k, shape.n
    # guard the dtype the kernel LOWERS (the value store, b_in_type) — the
    # sublane rule below assumes f32/bf16 tiling; an i8 store would pass an
    # a_in_type check and fail only at deferred Mosaic compile on TPU
    b_t = shape.b_in_type if shape.b_in_type else shape.a_in_type
    if b_t not in (Datatype.F32, Datatype.BF16):
        return None
    in_dt = to_jnp(b_t)
    sub = 8 if in_dt == jnp.float32 else 16
    if bk % sub or n % 128 or bn % 8:
        return None
    nblocks = len(indices)
    isz = jnp.dtype(in_dt).itemsize
    vbytes = (nblocks + 1) * bk * bn * isz
    if vbytes > device.get_geometry().vmem_bytes // 4:
        return None                     # value store must sit in VMEM
    kb, nb = k // bk, n // bn

    gmap = np.full((kb, nb), nblocks, np.int32)
    for j in range(nb):
        gmap[indices[indptr[j]:indptr[j + 1]], j] = np.arange(
            indptr[j], indptr[j + 1], dtype=np.int32)
    gmap_d = jax.device_put(jnp.asarray(gmap.reshape(-1)))

    def kernel(gmap_ref, v_ref, o_ref):
        i = pl.program_id(0)
        for j in range(nb):             # static unroll: nb is create-time
            idx = gmap_ref[i * nb + j]
            o_ref[:, j * bn:(j + 1) * bn] = v_ref[pl.ds(idx * bk, bk), :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kb,),
        in_specs=[pl.BlockSpec(((nblocks + 1) * bk, bn),
                               lambda i, gm: (i - i, i - i))],
        out_specs=pl.BlockSpec((bk, n), lambda i, gm: (i, i - i)),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, n), in_dt),
        interpret=device.use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=vbytes + k * n * isz,
            transcendentals=0),
    )

    @jax.jit
    @jax.named_scope(f"xsmm_pallas_bcsc_densify_{k}x{n}_b{bk}x{bn}")
    def run(gm, values):
        v2d = jnp.concatenate(
            [values.astype(in_dt), jnp.zeros((1, bk, bn), in_dt)],
            axis=0).reshape((nblocks + 1) * bk, bn)
        return call(gm, v2d)

    def fn(gm, values):
        # the gather map is a RUNTIME argument so callers that inline this
        # inside their own jit don't bake it as a closure constant (which
        # this backend re-uploads every call, CLAUDE.md); fn.gmap is the
        # matching device-resident array for standalone use
        return run(gm, values)

    fn.gmap = gmap_d
    return fn


def build_union_compact_rhs(nsg: int, U: int, W: int, bk: int, bn: int,
                            nblocks: int, gmap: np.ndarray, in_dt
                            ) -> Optional[Callable]:
    """Pallas compactor for the union kernel's RHS: values -> per-group
    compacted+densified (nsg, U*bk, 128) in ONE pass (replaces the XLA
    take + 5-D transpose chain the r3 probe found on the critical path).
    `gmap` is the (nsg, U, W) value-index map (nblocks = zero slot)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .. import device as device_mod

    isz = jnp.dtype(in_dt).itemsize
    vbytes = (nblocks + 1) * bk * bn * isz
    if vbytes > device_mod.get_geometry().vmem_bytes // 4:
        return None
    gmap_d = jax.device_put(jnp.asarray(gmap.reshape(-1)))

    def kernel(gmap_ref, v_ref, o_ref):
        g = pl.program_id(0)
        for u in range(U):
            for w in range(W):          # static unroll: U, W create-time
                idx = gmap_ref[(g * U + u) * W + w]
                o_ref[0, u * bk:(u + 1) * bk, w * bn:(w + 1) * bn] = \
                    v_ref[pl.ds(idx * bk, bk), :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsg,),
        in_specs=[pl.BlockSpec(((nblocks + 1) * bk, bn),
                               lambda g, gm: (g - g, g - g))],
        out_specs=pl.BlockSpec((1, U * bk, 128), lambda g, gm: (g, g - g,
                                                                g - g)),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsg, U * bk, 128), in_dt),
        interpret=device_mod.use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=vbytes + nsg * U * bk * 128 * isz,
            transcendentals=0),
    )

    def fn(gm, vpad_2d):
        """gm: flattened (nsg*U*W,) value-index map (device-resident);
        vpad_2d: ((nblocks+1)*bk, bn) padded value store. The map is a
        runtime argument — a closure constant would re-upload per call
        when the caller inlines this in its own jit (CLAUDE.md)."""
        return call(gm, vpad_2d)

    fn.gmap = gmap_d
    return fn


def build_bcsc_spmm_super(shape: GemmShape, s_indptr: np.ndarray,
                          s_indices: np.ndarray) -> Optional[Callable]:
    """128x128-supertile BCSC SpMM: fn(a, sup_values) -> C(m, n), beta=0.

    Unlike build_bcsc_spmm, blocks here ARE 128 wide, so A is read and C
    written DIRECTLY with (tm, 128) blocks — no create-per-call panel
    transposes (those full-array relayouts cost more than the SpMM itself
    at low occupancy). sup_values: (ns, 128, 128) in CSC supertile order.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SB = 128
    m, n, k = shape.m, shape.n, shape.k
    if m % 8 or k % SB or n % SB:
        return None
    if shape.a_in_type not in (Datatype.F32, Datatype.BF16):
        return None
    in_dt = to_jnp(shape.a_in_type)
    out_dt = to_jnp(shape.out_type)
    prec = (jax.lax.Precision.HIGHEST if shape.a_in_type == Datatype.F32
            else jax.lax.Precision.DEFAULT)

    nsteps, (rows_d, cols_d, vidx_d, first_d) = _block_schedule(
        s_indptr, s_indices, len(s_indices))
    tm = _pick_m_tile(m)
    if tm is None:
        return None
    m_tiles = m // tm

    def kernel(rows_ref, cols_ref, vidx_ref, first_ref,
               a_ref, v_ref, o_ref):
        l = pl.program_id(1)

        @pl.when(first_ref[l] == 1)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jax.lax.dot(
            a_ref[...], v_ref[0],
            preferred_element_type=jnp.float32, precision=prec)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(m_tiles, nsteps),
        in_specs=[
            pl.BlockSpec((tm, SB),
                         lambda i, l, rows, cols, vidx, first:
                         (i, rows[l])),
            pl.BlockSpec((1, SB, SB),
                         lambda i, l, rows, cols, vidx, first:
                         (vidx[l], i - i, i - i)),
        ],
        out_specs=pl.BlockSpec((tm, SB),
                               lambda i, l, rows, cols, vidx, first:
                               (i, cols[l])),
    )

    isz = jnp.dtype(in_dt).itemsize
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=device.use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * tm * SB * SB * m_tiles,
            bytes_accessed=(nsteps * m_tiles * (tm * SB + SB * SB) * isz
                            + m * n * 4),
            transcendentals=0),
    )

    @jax.jit
    @jax.named_scope(f"xsmm_pallas_bcsc_super_{m}x{n}x{k}")
    def run(rows, cols, vidx, first, a, sup):
        spad = jnp.concatenate(
            [sup.astype(in_dt), jnp.zeros((1, SB, SB), in_dt)], axis=0)
        return call(rows, cols, vidx, first,
                    a.astype(in_dt), spad).astype(out_dt)

    def fn(a, sup_values):
        return run(rows_d, cols_d, vidx_d, first_d, a, sup_values)

    # inline-friendly form for callers that fuse this kernel inside their
    # OWN jit (ops/sparse strategy='super'): the schedule arrays must ride
    # as jit ARGUMENTS there — captured through `fn` they would bake into
    # the outer trace as closure constants, re-uploaded per call
    fn.raw = run
    fn.schedule = (rows_d, cols_d, vidx_d, first_d)
    return fn
