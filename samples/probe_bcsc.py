"""Component-cost probe for the BCSC 1024^3 bench case (round-3 perf work).

Breaks the dense and union strategies into their per-call stages and times
each with the chained discipline, to locate where the issued-FLOP rate is
lost (VERDICT r2 #1). Run on the real TPU.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from libxsmm_tpu.descriptor import GemmFlags, GemmShape, SpgemmConfig
from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.ops.sparse import BcscMatrix, create_packed_spgemm_bcsc
from libxsmm_tpu.utils.timer import bench_chain

DENSITY = float(sys.argv[1]) if len(sys.argv) > 1 else 0.2
m = k = n = 1024
bk = bn = 32

rng = np.random.default_rng(2)
bmat = rng.standard_normal((k, n)).astype(np.float32)
keep = rng.random((k // bk, n // bn)) < DENSITY
bmat *= np.kron(keep, np.ones((bk, bn), np.float32))
bc = BcscMatrix.from_dense(bmat, bk, bn)
nblocks = bc.nblocks
print(f"density={DENSITY} nblocks={nblocks}")

shape = GemmShape(m, n, k, a_in_type=Datatype.BF16, b_in_type=Datatype.BF16,
                  out_type=Datatype.F32)   # match bench.py make_bcsc_case
cfg = SpgemmConfig(bk=bk, bn=bn)

a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
vals = jnp.asarray(bc.data, jnp.bfloat16)

kb, nb = k // bk, n // bn

# gather map for densify (same construction as ops/sparse dense strategy)
gmap = np.full((kb, nb), nblocks, np.int32)
indptr, indices = bc.indptr, bc.indices
for j in range(nb):
    gmap[indices[indptr[j]:indptr[j + 1]], j] = np.arange(
        indptr[j], indptr[j + 1], dtype=np.int32)
gmapd = jax.device_put(jnp.asarray(gmap.reshape(-1)))


def stage(name, fn, args, chain_idx, useful_flops=None):
    t = bench_chain(fn, args, chain_idx=chain_idx, reps=30)
    us = t * 1e6
    extra = ""
    if useful_flops:
        extra = f"  {useful_flops / t / 1e12:6.2f} TF/s"
    print(f"{name:28s} {us:9.1f} us{extra}")
    return t


NNZ = nblocks * bk * bn
USEFUL = 2 * NNZ * m

# --- stage: densify (take + transpose) alone ---
@jax.jit
def densify(gm, v):
    vpad = jnp.concatenate([v, jnp.zeros((1, bk, bn), v.dtype)], axis=0)
    dense = jnp.take(vpad, gm, axis=0).reshape(kb, nb, bk, bn)
    return dense.transpose(0, 2, 1, 3).reshape(k, n)


# --- stage: dense matmul alone (pre-densified B) ---
bdense = densify(gmapd, vals)


@jax.jit
def matmul(x, bd):
    return jax.lax.dot_general(x, bd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.bfloat16)


# --- stage: take WITHOUT transpose ---
@jax.jit
def take_only(gm, v):
    vpad = jnp.concatenate([v, jnp.zeros((1, bk, bn), v.dtype)], axis=0)
    return jnp.take(vpad, gm, axis=0)


# --- stage: a.T alone ---
@jax.jit
def transpose_a(x):
    return x.T


stage("densify(take+transpose)", densify, (gmapd, vals), 1)
stage("take only", take_only, (gmapd, vals), 1)
stage("a.T", transpose_a, (a,), 0)
stage("dense matmul alone", matmul, (a, bdense), 0,
      useful_flops=2 * m * n * k)

# --- full strategies through the public API ---
for strat in ("dense", "union"):
    kern = create_packed_spgemm_bcsc(shape, GemmFlags.BETA_0, cfg,
                                     indptr, indices, strategy=strat)
    stage(f"full {strat}", kern, (a, vals), 1, useful_flops=USEFUL)

# --- union sub-stages ---
from libxsmm_tpu.kernels import spmm_pallas

pfn = spmm_pallas.build_bcsc_spmm_union(shape, cfg, indptr, indices)
U = pfn.union_panels
W = 128 // bn
nsg = n // 128
print(f"union U={U} of kb={kb} (union density {U / kb:.2f})")

# rebuild the internal pieces to time the rhs compaction alone
unions = []
for g in range(nsg):
    rows = set()
    for j in range(g * W, (g + 1) * W):
        rows.update(int(r) for r in indices[int(indptr[j]):int(indptr[j + 1])])
    unions.append(sorted(rows)[:U])
gmap_u = np.full((nsg, U, W), nblocks, np.int32)
for g, rows in enumerate(unions):
    rpos = {r: u for u, r in enumerate(rows)}
    for wj in range(W):
        j = g * W + wj
        for pos in range(int(indptr[j]), int(indptr[j + 1])):
            r = int(indices[pos])
            if r in rpos:
                gmap_u[g, rpos[r], wj] = pos
gmap_ud = jax.device_put(jnp.asarray(gmap_u.reshape(-1)))


@jax.jit
def compact_rhs(gm, v):
    vpad = jnp.concatenate([v, jnp.zeros((1, bk, bn), v.dtype)], axis=0)
    rhs = jnp.take(vpad, gm, axis=0).reshape(nsg, U, W, bk, bn)
    return rhs.transpose(0, 1, 3, 2, 4).reshape(nsg, U * bk, 128)


stage("union rhs compaction(XLA)", compact_rhs, (gmap_ud, vals), 1)

# new one-pass pallas expansion kernels (r3)
dfn = spmm_pallas.build_bcsc_densify(shape, cfg, indptr, indices)
if dfn is not None:
    stage("pallas densify", dfn, (dfn.gmap, vals), 0)
cfn = spmm_pallas.build_union_compact_rhs(nsg, U, W, bk, bn, nblocks,
                                          gmap_u, jnp.bfloat16)
if cfn is not None:
    v2d = jnp.concatenate([vals, jnp.zeros((1, bk, bn), jnp.bfloat16)],
                          axis=0).reshape((nblocks + 1) * bk, bn)
    stage("pallas compact rhs", cfn, (cfn.gmap, v2d), 0)

print("done")
