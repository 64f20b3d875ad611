"""Pallas batched small-GEMM kernel — the MXU answer to LIBXSMM's SMM JIT.

The reference's whole reason to exist is small matmuls (MNK^(1/3) <= 64,
README.md "what is a small MM") where library overheads and cache behavior
dominate; it JIT-emits exact-shape microkernels
(/root/reference/src/generator_gemm_avx512_microkernel.c et al.). On TPU a
single small matmul cannot fill the 128x128 MXU — the performance problem is
reshaped into: stream MANY independent small GEMMs at HBM bandwidth with the
MXU never the bottleneck.

Kernel strategy: grid over batch chunks of GG problems; each step issues one
batched dot_general (Mosaic lowers the batch dim to a sequence of MXU passes
while the grid pipeline double-buffers the next chunk's HBM->VMEM DMA). The
workload is bandwidth-bound (32^3 f32: 5.3 FLOP/byte => the roofline is HBM
speed, BASELINE.md), so the job is keeping DMA saturated; the chunk size is
picked to give each pipeline stage ~0.75 MB of traffic, which measured best
on v5e-class hardware (30 TF/s f32 at 32^3, 1.4x over XLA's batched dot;
see bench.py).

(A block-diagonal-packing variant that fuses G problems into one wide MXU
pass was prototyped and rejected: Mosaic 2026-08 lacks value-level
dynamic_update_slice and miscompiles the iota-mask construction; batched
dot_general is both supported and faster in practice.)
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .. import device
from ..descriptor import GemmDescriptor
from ..dtypes import Datatype, to_jnp


def _supported(desc: GemmDescriptor) -> bool:
    s = desc.shape
    if desc.trans_a or desc.trans_b:
        return False  # XLA path handles transposes
    if s.a_in_type not in (Datatype.F32, Datatype.BF16, Datatype.F16):
        return False
    if s.b_in_type != s.a_in_type:
        return False
    if s.m > 256 or s.n > 128 or s.k > 128:
        return False
    return True


def build_batched_gemm(desc: GemmDescriptor, batch: int) -> Optional[Callable]:
    """Return fn(a, b[, c]) for a:(B,m,k) b:(B,k,n), or None if the
    descriptor should take the XLA route."""
    if not _supported(desc):
        return None

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = desc.shape
    m, n, k = s.m, s.n, s.k
    in_dt = to_jnp(s.a_in_type)
    out_dt = to_jnp(s.out_type)
    comp_dt = jnp.float32
    # full f32 MXU passes for f32 inputs (see ops.gemm.matmul_precision)
    precision = (jax.lax.Precision.HIGHEST if s.a_in_type == Datatype.F32
                 else jax.lax.Precision.DEFAULT)
    beta0 = desc.beta == 0
    interpret = device.use_interpret()

    # problems per grid step: give each pipeline stage ~0.75 MB of traffic
    # (measured sweet spot on v5e-class hardware; see module docstring)
    target_step_bytes = 768 * 1024
    per_problem = (m * k + k * n + m * n) * jnp.dtype(in_dt).itemsize
    gg = max(1, min(128, target_step_bytes // max(per_problem, 1)))
    gg = min(gg, batch)

    steps = max(1, -(-batch // gg))
    padded = steps * gg

    def kernel(a_ref, b_ref, *rest):
        if beta0:
            o_ref = rest[0]
        else:
            c_ref, o_ref = rest
        acc = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=comp_dt, precision=precision)
        if not beta0:
            acc = acc + c_ref[:].astype(comp_dt)
        o_ref[:] = acc.astype(out_dt)

    flops = 2 * m * n * k * gg
    isz = jnp.dtype(in_dt).itemsize
    osz = jnp.dtype(out_dt).itemsize
    bytes_step = gg * (m * k * isz + k * n * isz + m * n * osz
                       + (0 if beta0 else m * n * osz))

    in_specs = [
        pl.BlockSpec((gg, m, k), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gg, k, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not beta0:
        in_specs.append(pl.BlockSpec((gg, m, n), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))

    call = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gg, m, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, m, n), out_dt),
        cost_estimate=pl.CostEstimate(
            flops=flops * steps,
            bytes_accessed=bytes_step * steps,
            transcendentals=0),
        interpret=interpret,
    )

    @jax.named_scope(desc.name() + "_batched_pallas")
    def fn(a, b, c=None):
        pad = padded - batch
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
            b = jnp.pad(b, ((0, pad), (0, 0), (0, 0)))
            if c is not None:
                c = jnp.pad(c, ((0, pad), (0, 0), (0, 0)))
        args = (a, b) if beta0 else (a, b, c)
        out = call(*args)
        return out[:batch] if pad else out

    return fn
