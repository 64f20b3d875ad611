"""TPP-MoE: mixture-of-experts FFN — expert parallelism (ep) for the
library's own specialty, BATCHED SMALL GEMM.

An MoE layer's expert compute is exactly the workload LIBXSMM exists
for: E independent small GEMMs over (capacity, d) token panels
(reference analogue: the packed/batched small-GEMM domain,
/root/reference/samples/magazine/magazine_batch.c and
src/generator_packed_gemm.c — here expressed as one batched einsum so
the MXU sees E stacked panels in a single pass). The reference has no
model layer or distribution runtime (SURVEY.md §2.6); the routing and
the ep sharding are new-axis work like the BSR ring.

TPU-first design decisions:
  * STATIC shapes end-to-end (GShard/Switch capacity formulation): top-1
    routing materializes a (S, E, C) one-hot dispatch tensor; tokens past
    an expert's capacity are dropped (their combine weight is zero) —
    no dynamic gather/scatter, no data-dependent shapes under jit.
  * Dispatch/combine are einsums — they fuse and shard; the argmax is
    the only non-differentiable piece and gradients flow through the
    gate VALUES (standard top-1 straight-through-free estimator).
  * ep sharding: expert weights P('ep', ...) and the dispatched
    (E, C, d) token panels constrained to P('ep', None, None) — GSPMD
    derives the token all-to-all from the resharding of the dispatch
    einsum's output (ICI collective, never materializing a gathered
    expert weight). dp composes freely on the token axis.
  * Load-balance auxiliary loss (Switch: E * sum_e f_e * p_e) keeps the
    router from collapsing; it is part of the train objective.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..descriptor import UnaryFlags, UnaryType
from ..ops.eltwise import apply_unary_op
from ..ops.gemm import pass_precision


@dataclasses.dataclass(frozen=True)
class MoeConfig:
    dim: int = 64
    hidden: int = 128
    n_experts: int = 8
    top_k: int = 1                  # 1 = Switch routing, 2 = GShard
    capacity_factor: float = 1.25   # C = ceil(cf * k * S / E)
    aux_loss_weight: float = 1e-2
    activation: UnaryType = UnaryType.GELU
    dtype: str = "float32"


def capacity(cfg: MoeConfig, n_tokens: int) -> int:
    return max(1, int(np.ceil(cfg.capacity_factor * cfg.top_k * n_tokens
                              / cfg.n_experts)))


def init_params(cfg: MoeConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    d, h, e = cfg.dim, cfg.hidden, cfg.n_experts

    def mat(fan_in, *shape):
        return jnp.asarray(rng.standard_normal(shape) / np.sqrt(fan_in),
                           cfg.dtype)

    return {
        "wg": mat(d, d, e),                  # router
        "w1": mat(d, e, d, h), "b1": jnp.zeros((e, h), cfg.dtype),
        "w2": mat(h, e, h, d), "b2": jnp.zeros((e, d), cfg.dtype),
    }


def _route(logits, n_experts: int, cap: int, top_k: int = 1):
    """Top-k capacity routing: (S, E) logits -> dispatch (S, E, C) one-hot,
    combine (S, E, C) gate-weighted, aux load-balance loss. top_k=1 is
    Switch (raw gate weight); top_k=2 is GShard (the k gate values are
    renormalized, and capacity slots queue RANK-MAJOR: every token's
    first choice is seated before any second choice — the GShard policy)."""
    s, e = logits.shape
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    vals, idx = jax.lax.top_k(gates, top_k)                # (S, k)
    if top_k > 1:
        vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(idx, n_experts, dtype=jnp.float32)  # (S, k, E)
    # rank-major arrival order: flatten to (k*S, E) with rank outermost
    oh_flat = onehot.transpose(1, 0, 2).reshape(top_k * s, e)
    pos_flat = jnp.cumsum(oh_flat, axis=0) - oh_flat
    pos = pos_flat.reshape(top_k, s, e).transpose(1, 0, 2)  # (S, k, E)
    pos_tok = jnp.sum(pos * onehot, axis=-1)                # (S, k)
    keep = (pos_tok < cap).astype(jnp.float32)
    slot = jax.nn.one_hot(pos_tok.astype(jnp.int32), cap,
                          dtype=jnp.float32)                # (S, k, C)
    per_rank = onehot[..., None] * slot[:, :, None, :]      # (S, k, E, C)
    dispatch = jnp.sum(per_rank * keep[..., None, None], axis=1)
    combine = jnp.sum(per_rank * (vals * keep)[..., None, None], axis=1)
    # Switch aux loss over FIRST choices: E * sum_e (fraction_e * prob_e)
    frac = jnp.mean(onehot[:, 0], axis=0)
    prob = jnp.mean(gates, axis=0)
    aux = n_experts * jnp.sum(frac * prob)
    return dispatch, combine, aux


def forward(params: dict, x, cfg: MoeConfig, mesh: Mesh = None,
            ep_axis: str = "ep"):
    """x (S, d) -> (y (S, d), aux_loss). With a mesh, the dispatched
    panels are sharding-constrained to the ep axis so GSPMD inserts the
    token all-to-all instead of gathering expert weights."""
    s, d = x.shape
    cap = capacity(cfg, s)
    logits = jnp.dot(x, params["wg"], preferred_element_type=jnp.float32,
                     precision=pass_precision(x.dtype))
    dispatch, combine, aux = _route(logits, cfg.n_experts, cap, cfg.top_k)

    xe = jnp.einsum("sec,sd->ecd", dispatch.astype(x.dtype), x,
                    preferred_element_type=jnp.float32,
                    precision=pass_precision(x.dtype)).astype(x.dtype)
    if mesh is not None:
        xe = jax.lax.with_sharding_constraint(
            xe, NamedSharding(mesh, P(ep_axis, None, None)))
    # expert FFN: E stacked small GEMMs — the library's batched SMM shape
    h = jnp.einsum("ecd,edh->ech", xe, params["w1"],
                   preferred_element_type=jnp.float32,
                   precision=pass_precision(x.dtype))
    h = h + params["b1"][:, None, :]
    h = apply_unary_op(cfg.activation, UnaryFlags.NONE, h).astype(x.dtype)
    ye = jnp.einsum("ech,ehd->ecd", h, params["w2"],
                    preferred_element_type=jnp.float32,
                    precision=pass_precision(x.dtype))
    ye = (ye + params["b2"][:, None, :]).astype(x.dtype)
    if mesh is not None:
        ye = jax.lax.with_sharding_constraint(
            ye, NamedSharding(mesh, P(ep_axis, None, None)))
    y = jnp.einsum("sec,ecd->sd", combine.astype(jnp.float32),
                   ye.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=pass_precision(jnp.float32))
    return y.astype(x.dtype), aux


def reference_forward(params: dict, x, cfg: MoeConfig):
    """Per-token numpy oracle (no capacity drops: capacity_factor must
    cover the draw — tests size it so) for parity checks."""
    xf = np.asarray(x, np.float32)
    wg = np.asarray(params["wg"], np.float32)
    logits = xf @ wg
    e = np.exp(logits - logits.max(-1, keepdims=True))
    gates = e / e.sum(-1, keepdims=True)
    order = np.argsort(-gates, axis=-1)[:, :cfg.top_k]
    out = np.zeros_like(xf)
    for i in range(xf.shape[0]):
        picks = order[i]
        g = gates[i, picks]
        if cfg.top_k > 1:
            g = g / g.sum()
        for k, gk in zip(picks, g):
            h = xf[i] @ np.asarray(params["w1"][k], np.float32) \
                + np.asarray(params["b1"][k], np.float32)
            h = np.asarray(apply_unary_op(cfg.activation, UnaryFlags.NONE,
                                          jnp.asarray(h, jnp.float32)))
            y = h @ np.asarray(params["w2"][k], np.float32) + np.asarray(
                params["b2"][k], np.float32)
            out[i] += gk * y
    return out


def loss_fn(params, x, y, cfg: MoeConfig, mesh=None):
    pred, aux = forward(params, x, cfg, mesh)
    mse = jnp.mean((pred.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)
    return mse + cfg.aux_loss_weight * aux


def train_step(params, x, y, cfg: MoeConfig, lr: float = 1e-3, mesh=None):
    loss, grads = jax.value_and_grad(loss_fn)(params, x, y, cfg, mesh)
    return jax.tree.map(lambda p, g: p - lr * g, params, grads), loss


def shard_params(params: dict, mesh: Mesh, ep_axis: str = "ep") -> dict:
    """Router replicated; every expert tensor sharded over ep on the
    EXPERT dimension (never gathered — the tokens move, not the weights)."""
    ep = lambda *spec: NamedSharding(mesh, P(*spec))
    return {
        "wg": jax.device_put(params["wg"], ep(None, None)),
        "w1": jax.device_put(params["w1"], ep(ep_axis, None, None)),
        "b1": jax.device_put(params["b1"], ep(ep_axis, None)),
        "w2": jax.device_put(params["w2"], ep(ep_axis, None, None)),
        "b2": jax.device_put(params["b2"], ep(ep_axis, None)),
    }


# ------------------------------------------- explicit all-to-all dispatch
#
# Second ep flavor (VERDICT r4 #9): where `forward` lets GSPMD derive the
# token movement from the dispatch einsum's output resharding, this
# variant ISSUES the token all-to-all itself inside shard_map — the ep
# analogue of spmm_dist's explicit ring2 next to the derived ring.
# Tokens arrive ep-sharded (every device routes its OWN s/P tokens with a
# LOCAL capacity), panels move with exactly two lax.all_to_all calls
# (dispatch out, expert results back), experts compute (E/P) stacked
# small GEMMs over (P*C_loc) token rows. Routing semantics match the
# einsum variant whenever capacity covers the draw (no drops), which is
# what the parity tests pin; under scarcity the drop POLICY differs by
# construction (per-shard capacity vs global) and is documented here.


def moe_a2a_comm_bytes_per_device(cfg: MoeConfig, s_local: int, ndev: int,
                                  dtype=None) -> int:
    """Analytic per-device comm volume of forward_a2a: 2 all-to-alls
    (dispatched panels out, expert outputs back), each moving the
    (P-1)/P remote fraction of the local (E, C_loc, d) panel."""
    isz = jnp.dtype(dtype or cfg.dtype).itemsize
    panel = cfg.n_experts * capacity(cfg, s_local) * cfg.dim * isz
    return 2 * panel * (ndev - 1) // ndev


def forward_a2a(params: dict, x, cfg: MoeConfig, mesh: Mesh,
                dp_axis: str = None, ep_axis: str = "ep"):
    """x (S, d) GLOBAL, sharded over (dp?, ep) on the token axis ->
    (y (S, d), aux). Explicit-collective MoE: per-shard top-k routing,
    one lax.all_to_all out, E/P local expert FFNs, one all_to_all back,
    local combine. aux is the pmean of the per-shard Switch losses."""
    ep = mesh.shape[ep_axis]
    if cfg.n_experts % ep:
        raise ValueError(f"n_experts={cfg.n_experts} must divide ep={ep}")
    axes = (dp_axis, ep_axis) if dp_axis else (ep_axis,)
    tok_spec = P(axes if dp_axis else ep_axis, None)

    def local_fn(params, x):
        s_loc, d = x.shape
        cap = capacity(cfg, s_loc)
        logits = jnp.dot(x, params["wg"],
                         preferred_element_type=jnp.float32,
                         precision=pass_precision(x.dtype))
        dispatch, combine, aux = _route(logits, cfg.n_experts, cap,
                                        cfg.top_k)
        xe = jnp.einsum("sec,sd->ecd", dispatch.astype(x.dtype), x,
                        preferred_element_type=jnp.float32,
                        precision=pass_precision(x.dtype)).astype(x.dtype)
        # (E, C, d) -> (P, E/P, C, d); slot j goes to device j, which
        # receives its OWN experts' tokens from every source shard
        xe = xe.reshape(ep, cfg.n_experts // ep, cap, d)
        xr = jax.lax.all_to_all(xe, ep_axis, 0, 0, tiled=True)
        # (src, E/P, C, d) -> (E/P, src*C, d): each local expert sees the
        # concatenation of every shard's capacity block
        xr = xr.transpose(1, 0, 2, 3).reshape(cfg.n_experts // ep,
                                              ep * cap, d)
        h = jnp.einsum("ecd,edh->ech", xr, params["w1"],
                       preferred_element_type=jnp.float32,
                       precision=pass_precision(x.dtype))
        h = h + params["b1"][:, None, :]
        h = apply_unary_op(cfg.activation, UnaryFlags.NONE,
                           h).astype(x.dtype)
        ye = jnp.einsum("ech,ehd->ecd", h, params["w2"],
                        preferred_element_type=jnp.float32,
                        precision=pass_precision(x.dtype))
        ye = (ye + params["b2"][:, None, :]).astype(x.dtype)
        ye = ye.reshape(cfg.n_experts // ep, ep, cap, d).transpose(
            1, 0, 2, 3)
        yr = jax.lax.all_to_all(ye, ep_axis, 0, 0, tiled=True)
        yr = yr.reshape(cfg.n_experts, cap, d)
        y = jnp.einsum("sec,ecd->sd", combine.astype(jnp.float32),
                       yr.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=pass_precision(jnp.float32))
        return y.astype(x.dtype), jax.lax.pmean(aux, axes)

    pspecs = {
        "wg": P(None, None),
        "w1": P(ep_axis, None, None), "b1": P(ep_axis, None),
        "w2": P(ep_axis, None, None), "b2": P(ep_axis, None),
    }
    mapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(pspecs, tok_spec),
        out_specs=(tok_spec, P()))
    return mapped(params, x)


def loss_fn_a2a(params, x, y, cfg: MoeConfig, mesh, dp_axis=None,
                ep_axis="ep"):
    pred, aux = forward_a2a(params, x, cfg, mesh, dp_axis, ep_axis)
    mse = jnp.mean((pred.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)
    return mse + cfg.aux_loss_weight * aux


def hlo_collectives(txt: str) -> dict:
    """Count collective ops in a lowered module (the backend-independent
    comm evidence used to compare the einsum and a2a variants)."""
    import re
    names = ("all_to_all", "all_reduce", "all_gather", "collective_permute",
             "reduce_scatter", "collective_broadcast")
    t = txt.replace("-", "_")
    return {n: len(re.findall(rf'"stablehlo\.{n}"|stablehlo\.{n}\W', t))
            for n in names}


def moe_comm_report(cfg: MoeConfig, mesh: Mesh, n_tokens: int,
                    dp_axis: str = "dp", ep_axis: str = "ep") -> dict:
    """Lowered-collective counts for both variants + the a2a analytic
    bytes model — 'compare lowered comm volume' (VERDICT r4 #9)."""
    ndev = mesh.shape[ep_axis]
    dp = mesh.shape.get(dp_axis, 1) if dp_axis else 1
    s_local = n_tokens // (dp * ndev)
    return {
        "einsum": hlo_collectives(lowered_text(cfg, mesh, n_tokens,
                                               dp_axis, ep_axis)),
        "a2a": hlo_collectives(lowered_text_a2a(cfg, mesh, n_tokens,
                                                dp_axis, ep_axis)),
        "a2a_bytes_per_device": moe_a2a_comm_bytes_per_device(
            cfg, s_local, ndev),
    }


_VARIANT_PICKS: dict = {}


def pick_moe_variant(cfg: MoeConfig, mesh: Mesh, n_tokens: int,
                     dp_axis: str = "dp", ep_axis: str = "ep") -> dict:
    """Create-time autotune between the einsum and explicit-a2a dispatch
    (the fsspmdm/BCSC discipline: measure both INTERLEAVED on the actual
    mesh, keep the winner; cached per (cfg, mesh-shape, tokens))."""
    key = (cfg, tuple(sorted(mesh.shape.items())), n_tokens, dp_axis)
    if key in _VARIANT_PICKS:
        return _VARIANT_PICKS[key]
    from ..utils.timer import bench_chain_interleaved

    params = shard_params(init_params(cfg), mesh, ep_axis)
    xsh = NamedSharding(mesh, P(dp_axis, None) if dp_axis
                        else P(None, None))
    xsh_a2a = NamedSharding(mesh, P((dp_axis, ep_axis), None) if dp_axis
                            else P(ep_axis, None))
    x = jnp.zeros((n_tokens, cfg.dim), cfg.dtype)
    f_ein = jax.jit(lambda p, xx: forward(p, xx, cfg, mesh, ep_axis)[0])
    f_a2a = jax.jit(lambda p, xx: forward_a2a(p, xx, cfg, mesh,
                                              dp_axis, ep_axis)[0])
    t_ein, t_a2a = bench_chain_interleaved(
        [(f_ein, (params, jax.device_put(x, xsh)), 1),
         (f_a2a, (params, jax.device_put(x, xsh_a2a)), 1)],
        reps=4, rounds=2, min_launch_s=0.005)
    pick = ("a2a" if (t_ein is None
                      or (t_a2a is not None and t_a2a < t_ein))
            else "einsum")
    out = {"einsum_s": t_ein, "a2a_s": t_a2a, "pick": pick}
    _VARIANT_PICKS[key] = out
    return out


def make_sharded_train_step(cfg: MoeConfig, mesh: Mesh, dp_axis: str = "dp",
                            ep_axis: str = "ep", lr: float = 1e-3,
                            variant: str = "einsum",
                            n_tokens: int = None):
    """jit the FULL train step over a (dp, ep) mesh: tokens batch-sharded
    over dp, experts sharded over ep. variant='einsum' lets GSPMD derive
    the token all-to-all from the dispatch einsum's resharding;
    'a2a' issues it explicitly in shard_map (tokens sharded over BOTH
    axes); 'auto' microbenches the two on the mesh (pick_moe_variant)."""
    if variant == "auto":
        variant = pick_moe_variant(cfg, mesh, n_tokens or 16 * mesh.size,
                                   dp_axis, ep_axis)["pick"]
    if variant == "a2a":
        xsharding = NamedSharding(mesh, P((dp_axis, ep_axis), None)
                                  if dp_axis else P(ep_axis, None))

        @jax.jit
        def step(params, x, y):
            loss, grads = jax.value_and_grad(loss_fn_a2a)(
                params, x, y, cfg, mesh, dp_axis, ep_axis)
            return jax.tree.map(lambda p, g: p - lr * g, params,
                                grads), loss

        return step, xsharding
    xsharding = NamedSharding(mesh, P(dp_axis, None))

    @jax.jit
    def step(params, x, y):
        return train_step(params, x, y, cfg, lr, mesh)

    return step, xsharding


def lowered_text(cfg: MoeConfig, mesh: Mesh, n_tokens: int,
                 dp_axis: str = "dp", ep_axis: str = "ep") -> str:
    """StableHLO of the sharded step (tests assert the ep sharding
    annotations survive into the lowered module)."""
    step, xsh = make_sharded_train_step(cfg, mesh, dp_axis, ep_axis)
    params = shard_params(init_params(cfg), mesh, ep_axis)
    x = jax.device_put(jnp.zeros((n_tokens, cfg.dim), cfg.dtype), xsh)
    y = jax.device_put(jnp.zeros((n_tokens, cfg.dim), cfg.dtype), xsh)
    return step.lower(params, x, y).as_text()


def lowered_text_a2a(cfg: MoeConfig, mesh: Mesh, n_tokens: int,
                     dp_axis: str = "dp", ep_axis: str = "ep") -> str:
    """StableHLO of the explicit-a2a sharded step (tests assert the real
    stablehlo.all_to_all ops are present — comm evidence)."""
    step, xsh = make_sharded_train_step(cfg, mesh, dp_axis, ep_axis,
                                        variant="a2a")
    params = shard_params(init_params(cfg), mesh, ep_axis)
    x = jax.device_put(jnp.zeros((n_tokens, cfg.dim), cfg.dtype), xsh)
    y = jax.device_put(jnp.zeros((n_tokens, cfg.dim), cfg.dtype), xsh)
    return step.lower(params, x, y).as_text()
