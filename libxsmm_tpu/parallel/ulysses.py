"""Ulysses (all-to-all head-parallel) sequence parallelism.

The second context-parallel flavor next to the ppermute ring
(parallel/ring_attention.py). The reference has no distributed or
attention layer at all (SURVEY.md §2.6/§5.7 — verified absent); like
the ring, this is new-axis work built the TPU way: `shard_map` over a
mesh axis with XLA collectives, no host scheduling.

Design (DeepSpeed-Ulysses, arXiv:2309.14509, re-derived for shard_map):
activations arrive SEQUENCE-sharded — q/v (bh, s/P, hd), kT
(bh, hd, s/P) per device — and attention needs the full sequence per
head. Instead of rotating K/V segments P-1 times (the ring), ONE
all-to-all per operand resharding

    (bh, s/P, hd)  ->  (bh/P, s, hd)

turns sequence-sharding into HEAD-sharding; every device then runs the
ordinary fused flash kernel (kernels/attention_pallas.py) on its bh/P
heads over the FULL sequence — causality is exact locally, no
chunk-wise masking or LSE cross-combining — and one reverse all-to-all
restores sequence sharding on the output.

Comm model (per device, per call): 4 all-to-alls (q, kT, v in; out
back), each moving the (P-1)/P remote fraction of one local operand:

    bytes = 4 * bh * (s/P) * hd * itemsize * (P-1)/P

vs the ring's (P-1) * 2 * bh * (s/P) * hd * itemsize — a factor 2/P
less traffic, so Ulysses wins whenever it is applicable (heads
divisible by P, i.e. bh >= P); the ring remains the flavor for few-head
/ many-device regimes (bh < P) and for latency-hiding overlap (its
rotations interleave with compute; Ulysses' all-to-alls are barriers
around one big local kernel). `recommend_cp_flavor` encodes exactly
this crossover. Asserted against the lowered HLO in
tests/test_parallel.py.

Differentiability is free: `jax.lax.all_to_all` transposes to the
reverse all-to-all and the local kernel is the library's custom-VJP
flash attention, so autodiff derives the backward (two all-to-alls
around the Pallas flash backward) with no hand-written ring pass.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .ring_attention import ring_comm_bytes_per_device


def ulysses_comm_bytes_per_device(bh: int, s: int, hd: int, ndev: int,
                                  dtype) -> int:
    """Analytic per-device comm volume: 4 all-to-alls (q, kT, v, out),
    each sending the (P-1)/P remote fraction of one local shard."""
    isz = jnp.dtype(dtype).itemsize
    local = bh * (s // ndev) * hd * isz
    return 4 * local * (ndev - 1) // ndev


def recommend_cp_flavor(bh: int, s: int, hd: int, ndev: int,
                        dtype) -> dict:
    """The CP-flavor crossover, as data: Ulysses moves 2/P of the ring's
    bytes but needs heads divisible by the axis (bh >= P); the ring has
    no head constraint and overlaps its hops with compute."""
    ring = ring_comm_bytes_per_device(bh, s, hd, ndev, dtype)
    out = {"ring_bytes": ring, "ulysses_applicable": bh % ndev == 0}
    if bh % ndev == 0:
        uly = ulysses_comm_bytes_per_device(bh, s, hd, ndev, dtype)
        out["ulysses_bytes"] = uly
        out["pick"] = "ulysses" if uly < ring else "ring"
    else:
        out["pick"] = "ring"
    return out


def make_ulysses_attention(mesh: Mesh, axis: str, bh: int, s: int, hd: int,
                           dtype=jnp.bfloat16, causal: bool = False,
                           scale: Optional[float] = None):
    """Build a jitted Ulysses sequence-parallel attention over mesh[axis].

    Same external contract as make_ring_attention: returns
    (fn, shardings) where fn(q, kT, v) -> out for GLOBAL q/v (bh, s, hd)
    and kT (bh, hd, s), all sequence-sharded over `axis`; the result
    matches single-device attention on the full sequence.
    """
    from ..dtypes import from_jnp
    from ..ops.attention import dispatch_flash_attention

    ndev = mesh.shape[axis]
    if s % ndev:
        raise ValueError(f"s={s} must divide over {ndev} devices")
    if bh % ndev:
        raise ValueError(f"Ulysses needs heads divisible by the axis: "
                         f"bh={bh} % {ndev} != 0 (use the ring flavor)")
    sc = float(scale) if scale is not None else float(hd) ** -0.5
    jdt = jnp.dtype(dtype)
    # the local kernel sees bh/P heads over the FULL sequence; the public
    # dispatch entry supplies the custom-VJP fused kernel (or its exact
    # XLA fallback outside the Pallas envelope)
    kern = dispatch_flash_attention(bh // ndev, s, hd, from_jnp(jdt),
                                    causal=causal, scale=sc)

    def local_fn(q, kT, v):
        # sequence-sharded -> head-sharded: one all-to-all per operand
        qh = jax.lax.all_to_all(q, axis, 0, 1, tiled=True)
        vh = jax.lax.all_to_all(v, axis, 0, 1, tiled=True)
        kTh = jax.lax.all_to_all(kT, axis, 0, 2, tiled=True)
        o = kern(qh, kTh, vh)
        # head-sharded -> sequence-sharded
        return jax.lax.all_to_all(o, axis, 1, 0, tiled=True)

    shmapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, axis),
                  P(None, axis, None)),
        out_specs=P(None, axis, None),
        # pallas_call out_shapes carry no varying-mesh-axes annotation
        # (the ring_attention caveat); parity tests pin correctness
        check_vma=False)
    fn = jax.jit(shmapped)
    shardings = {
        "q": NamedSharding(mesh, P(None, axis, None)),
        "kT": NamedSharding(mesh, P(None, None, axis)),
        "v": NamedSharding(mesh, P(None, axis, None)),
    }
    return fn, shardings


def lowered_text(mesh, axis, bh, s, hd, dtype=jnp.bfloat16,
                 causal: bool = False) -> str:
    """StableHLO of the Ulysses program (tests assert all-to-all presence
    + payload shapes — the backend-independent comm evidence)."""
    fn, sh = make_ulysses_attention(mesh, axis, bh, s, hd, dtype, causal)
    q = jnp.zeros((bh, s, hd), dtype)
    kT = jnp.zeros((bh, hd, s), dtype)
    v = jnp.zeros((bh, s, hd), dtype)
    args = (jax.device_put(q, sh["q"]), jax.device_put(kT, sh["kT"]),
            jax.device_put(v, sh["v"]))
    return fn.lower(*args).as_text()
