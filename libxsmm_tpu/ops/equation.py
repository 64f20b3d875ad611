"""Matrix-equation front-end: expression trees fused into one kernel.

Re-design of the reference's matrix-equation IR + JIT
(/root/reference/src/libxsmm_matrixeqn.{c,h} — builder API
include/libxsmm.h:148-162; generators src/generator_matequation*.c): the
user pushes ops and args in PREFIX (depth-first) order, then dispatches a
single kernel evaluating the whole tree.

TPU-native: the tree is traced into ONE jitted function — XLA performs the
fusion and temporary planning that the reference implements manually with
scratch-block vs register-block strategies
(generator_matequation_avx_avx512.c:290-305). The IR here is kept as a real
data structure (not just a closure) for the same reasons the reference keeps
one: validation, pretty-printing (libxsmm_meqn_tree_print :225) and
introspection.

Builder contract (mirrors the reference):
  eqn = meqn_create()
  meqn_push_back_binary_op(eqn, BinaryType.ADD, ...)    # prefix order
  meqn_push_back_arg(eqn, m, n, in_pos=0, ...)
  meqn_push_back_arg(eqn, m, n, in_pos=1, ...)
  fn = dispatch_meqn(eqn, out_m, out_n, out_type)
  out = fn(arg0, arg1)       # args by in_pos order

MATMUL/BRGEMM op types contract over shapes exactly like ops.gemm; unary
reduce/bcast flags follow ops.eltwise.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..descriptor import (BinaryFlags, BinaryType, TernaryFlags, TernaryType,
                          UnaryFlags, UnaryType)
from ..dtypes import Datatype, to_jnp
from ..registry import Kernel, KernelInfo, get_registry
from .eltwise import (apply_binary_op, apply_matmul_node,
                      apply_ternary_op, apply_unary_op)

_ARITY = {"unary": 1, "binary": 2, "ternary": 3}


@dataclasses.dataclass
class EqnNode:
    kind: str                    # "arg" | "unary" | "binary" | "ternary"
    op: Optional[object] = None  # UnaryType | BinaryType | TernaryType
    flags: int = 0
    dtype: Datatype = Datatype.F32
    m: int = 0
    n: int = 0
    in_pos: int = -1
    # secondary-operand argument slot (reference: op_metadata.op_arg_pos /
    # the exec-time arg.secondary pointer): GATHER / REDUCE_COLS_IDX nodes
    # read their index vector from the kernel argument at this position.
    op_arg_pos: int = -1
    # MATRIX_ARG_TYPE_SET cardinality hint (>0 = this arg is a stacked
    # (count, m, n) tensor set; 0 = singular). Validated at call time.
    set_card: int = 0
    children: List["EqnNode"] = dataclasses.field(default_factory=list)

    def is_complete(self) -> bool:
        if self.kind == "arg":
            return True
        return len(self.children) == _ARITY[self.kind]

    def pretty(self, depth: int = 0) -> str:
        pad = "  " * depth
        if self.kind == "arg":
            return f"{pad}ARG[{self.in_pos}] {self.m}x{self.n} {self.dtype.value}"
        lines = [f"{pad}{self.kind.upper()} {self.op.name} "
                 f"(flags={int(self.flags)}, {self.dtype.value})"]
        lines += [c.pretty(depth + 1) for c in self.children]
        return "\n".join(lines)


@dataclasses.dataclass
class Equation:
    idx: int
    root: Optional[EqnNode] = None
    _stack: List[EqnNode] = dataclasses.field(default_factory=list)
    nargs: int = 0

    def _attach(self, node: EqnNode) -> None:
        if self.root is None:
            self.root = node
        else:
            if not self._stack:
                raise ValueError("equation already complete; cannot push")
            self._stack[-1].children.append(node)
        if node.kind != "arg":
            self._stack.append(node)
        # pop completed operators
        while self._stack and self._stack[-1].is_complete():
            self._stack.pop()

    def is_complete(self) -> bool:
        return self.root is not None and not self._stack


# ---------------------------------------------------------------------------
# Struct-based builder metadata (reference v2 equation API,
# include/libxsmm.h:150-162, constructors src/libxsmm_matrixeqn.c:1322-1362)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MeqnArgShape:
    """libxsmm_meqn_arg_shape (include/libxsmm_typedefs.h:586-591)."""
    m: int
    n: int
    ld: int
    type: Datatype = Datatype.F32


@dataclasses.dataclass(frozen=True)
class MatrixArgAttributes:
    """libxsmm_matrix_arg_attributes (include/libxsmm_typedefs.h:641-646).
    `arg_type` 0 = SINGULAR, 1 = SET; set_type follows
    libxsmm_matrix_arg_set_type (NONE/ABS_ADDRESS/OFFSET_BASE/STRIDE_BASE)."""
    arg_type: int = 0
    set_type: int = 0
    set_cardinality_hint: int = 0
    set_stride_hint: int = 0


@dataclasses.dataclass(frozen=True)
class MeqnArgMetadata:
    """libxsmm_meqn_arg_metadata (constructor src/libxsmm_matrixeqn.c:1345)."""
    eqn_idx: int
    in_arg_pos: int


@dataclasses.dataclass(frozen=True)
class MeqnOpMetadata:
    """libxsmm_meqn_op_metadata (constructor src/libxsmm_matrixeqn.c:1354)."""
    eqn_idx: int
    op_arg_pos: int = -1


@dataclasses.dataclass(frozen=True)
class MeqnDescriptor:
    """libxsmm_meqn_descriptor (src/libxsmm_main.h:412-419): output shape +
    dtype + the equation handle."""
    m: int
    n: int
    ldo: int
    datatype: Datatype
    eqn_idx: int


def create_meqn_arg_shape(m: int, n: int, ld: int,
                          dtype: Datatype = Datatype.F32) -> MeqnArgShape:
    """libxsmm_create_meqn_arg_shape (include/libxsmm.h:150)."""
    return MeqnArgShape(m=m, n=n, ld=ld, type=Datatype(dtype))


def create_matrix_arg_attributes(arg_type: int = 0, set_type: int = 0,
                                 set_cardinality_hint: int = 0,
                                 set_stride_hint: int = 0
                                 ) -> MatrixArgAttributes:
    """libxsmm_create_matrix_arg_attributes (include/libxsmm.h:151)."""
    return MatrixArgAttributes(arg_type, set_type, set_cardinality_hint,
                               set_stride_hint)


def create_meqn_arg_metadata(eqn_idx: int, in_arg_pos: int) -> MeqnArgMetadata:
    """libxsmm_create_meqn_arg_metadata (include/libxsmm.h:152)."""
    return MeqnArgMetadata(eqn_idx=eqn_idx, in_arg_pos=in_arg_pos)


def create_meqn_op_metadata(eqn_idx: int, op_arg_pos: int = -1
                            ) -> MeqnOpMetadata:
    """libxsmm_create_meqn_op_metadata (include/libxsmm.h:153)."""
    return MeqnOpMetadata(eqn_idx=eqn_idx, op_arg_pos=op_arg_pos)


_equations: Dict[int, Equation] = {}
_eqn_lock = threading.Lock()
_next_idx = [0]


def meqn_create() -> int:
    """libxsmm_meqn_create analogue: returns an equation handle index."""
    with _eqn_lock:
        idx = _next_idx[0]
        _next_idx[0] += 1
        _equations[idx] = Equation(idx=idx)
        return idx


def _eqn(idx: int) -> Equation:
    try:
        return _equations[idx]
    except KeyError:
        raise ValueError(f"unknown equation index {idx}") from None


def meqn_push_back_arg(idx, m=None, n=None, in_pos=None,
                       dtype: Datatype = Datatype.F32,
                       arg_attr: "MatrixArgAttributes" = None) -> None:
    """libxsmm_meqn_push_back_arg analogue; in_pos = position of this arg in
    the dispatch-time argument list.

    Two call forms, matching both reference generations:
      meqn_push_back_arg(idx, m, n, in_pos, dtype)            # flattened
      meqn_push_back_arg(arg_metadata, arg_shape[, arg_attr]) # struct v2
    (include/libxsmm.h:154 takes metadata + shape + attributes)."""
    if isinstance(idx, MeqnArgMetadata):
        meta, shape = idx, m
        if not isinstance(shape, MeqnArgShape):
            raise TypeError("struct form needs a MeqnArgShape second arg")
        if isinstance(n, MatrixArgAttributes):
            arg_attr = n
        idx, m, n, in_pos, dtype = (meta.eqn_idx, shape.m, shape.n,
                                    meta.in_arg_pos, shape.type)
    if in_pos is None or int(in_pos) < 0:
        # a negative in_pos would silently alias args[-1] at eval time;
        # an omitted one would die on `in_pos + 1` with an opaque TypeError
        raise ValueError(f"in_pos must be a non-negative argument "
                         f"position, got {in_pos!r}")
    in_pos = int(in_pos)
    set_card = 0
    if arg_attr is not None and arg_attr.arg_type != 0:
        # MATRIX_ARG_TYPE_SET (tensor-set args feeding BRGEMM nodes,
        # typedefs.h:641-646): the reference's three addressing modes
        # (ABS_ADDRESS pointer array / OFFSET_BASE / STRIDE_BASE) all
        # collapse to ONE functional contract here — the argument is a
        # stacked (count, m, n) array whose leading axis the BRGEMM node
        # reduces (same design as BatchReduceConfig). The cardinality hint
        # is kept and validated against the leading dim at call time.
        if arg_attr.set_type not in (0, 1, 2, 3):
            raise ValueError(f"unknown set_type {arg_attr.set_type}")
        set_card = max(0, int(arg_attr.set_cardinality_hint))
    eqn = _eqn(idx)
    eqn._attach(EqnNode(kind="arg", m=m, n=n, in_pos=in_pos, dtype=dtype,
                        set_card=set_card))
    eqn.nargs = max(eqn.nargs, in_pos + 1)


def _meta_idx(idx) -> int:
    return idx.eqn_idx if isinstance(idx, MeqnOpMetadata) else idx


_IDX_OPS = (UnaryType.GATHER, UnaryType.REDUCE_COLS_IDX_OP_ADD,
            UnaryType.REDUCE_COLS_IDX_OP_MAX,
            UnaryType.REDUCE_COLS_IDX_OP_MIN)


def _needs_idx(op) -> bool:
    return op in _IDX_OPS


def meqn_push_back_unary_op(idx, op: UnaryType,
                            dtype: Datatype = Datatype.F32,
                            flags: UnaryFlags = UnaryFlags.NONE,
                            op_arg_pos: int = -1) -> None:
    """Accepts an int handle or a MeqnOpMetadata (reference v2 form).

    Index-consuming ops (GATHER, REDUCE_COLS_IDX_*) read their index vector
    from the kernel argument at `op_arg_pos` — the reference routes this
    through op_metadata.op_arg_pos / the exec-time arg.secondary pointer
    (samples/equation/equation_gather_reduce.c:151,165)."""
    if isinstance(idx, MeqnOpMetadata) and op_arg_pos < 0:
        op_arg_pos = idx.op_arg_pos
    if _needs_idx(op) and op_arg_pos < 0:
        raise ValueError(f"{op.name} equation node needs op_arg_pos (the "
                         "argument slot carrying the index vector)")
    eqn = _eqn(_meta_idx(idx))
    eqn._attach(EqnNode(kind="unary", op=op, flags=UnaryFlags(flags),
                        dtype=dtype, op_arg_pos=op_arg_pos))
    if op_arg_pos >= 0:
        eqn.nargs = max(eqn.nargs, op_arg_pos + 1)


def meqn_push_back_binary_op(idx, op: BinaryType,
                             dtype: Datatype = Datatype.F32,
                             flags: BinaryFlags = BinaryFlags.NONE) -> None:
    _eqn(_meta_idx(idx))._attach(
        EqnNode(kind="binary", op=op, flags=BinaryFlags(flags), dtype=dtype))


def meqn_push_back_ternary_op(idx, op: TernaryType,
                              dtype: Datatype = Datatype.F32,
                              flags: TernaryFlags = TernaryFlags.NONE) -> None:
    _eqn(_meta_idx(idx))._attach(
        EqnNode(kind="ternary", op=op, flags=TernaryFlags(flags),
                dtype=dtype))


def meqn_tree_print(idx: int) -> str:
    """libxsmm_meqn_tree_print analogue (returns and prints)."""
    s = _eqn(idx).root.pretty() if _eqn(idx).root else "<empty>"
    print(s)
    return s


def meqn_rpn_print(idx: int) -> str:
    """libxsmm_meqn_rpn_print analogue: post-order (RPN) op listing."""
    out = []

    def visit(node: EqnNode):
        for c in node.children:
            visit(c)
        if node.kind == "arg":
            out.append(f"ARG{node.in_pos}")
        else:
            out.append(node.op.name)

    root = _eqn(idx).root
    if root is not None:
        visit(root)
    s = " ".join(out) if out else "<empty>"
    print(s)
    return s


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def _eval(node: EqnNode, args: tuple, memo: dict, sig_cache: dict):
    """Per-node-dtype tree evaluation with shared-subtree memoization.

    Each operator node computes at ITS OWN dtype (the reference's node
    dtype field + tmp planning, src/libxsmm_matrixeqn.c:323-744): children
    are cast at node boundaries, so an F64 tree runs f64 end-to-end and a
    bf16 node's math runs in bf16 storage precision. Structurally identical
    subtrees (same ops/flags/dtypes/arg positions) are evaluated ONCE per
    call — the TPU reading of the reference's reg-score/tmp reuse planner
    (XLA CSE would usually dedup anyway; the memo makes it a contract)."""
    sig = sig_cache.get(id(node))
    if sig is None:
        sig_cache[id(node)] = sig = _tree_signature(node)
    hit = memo.get(sig)
    if hit is not None:
        return hit
    comp = to_jnp(node.dtype)
    if node.kind == "arg":
        a = args[node.in_pos]
        if node.set_card and (a.ndim != 3 or a.shape[0] != node.set_card):
            raise ValueError(
                f"arg {node.in_pos} is a tensor set of cardinality "
                f"{node.set_card}: expected shape ({node.set_card}, "
                f"{node.m}, {node.n}), got {a.shape}")
        res = a.astype(comp)
        memo[sig] = res
        return res
    kids = [_eval(c, args, memo, sig_cache) for c in node.children]
    for k in kids:
        if isinstance(k, tuple):
            raise ValueError("UNZIP nodes are root-only in equation trees "
                             "(multi-output, like the reference's DUMP)")
    if node.kind == "unary" and node.op == UnaryType.UNZIP:
        # raw-bit split (splitSGD family, equation_splitSGD.c:180): NO comp
        # cast — operate on the child's f32 bit pattern directly
        bits = jax.lax.bitcast_convert_type(kids[0].astype(jnp.float32),
                                            jnp.uint32)
        res = ((bits & 0xFFFF).astype(jnp.uint16),
               (bits >> 16).astype(jnp.uint16))
        memo[sig] = res
        return res
    if node.kind == "binary" and node.op == BinaryType.ZIP:
        # raw-bit merge of (lo16, hi16) uint16 operands back into f32
        lo = kids[0].astype(jnp.uint32)
        hi = kids[1].astype(jnp.uint32)
        res = jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)
        memo[sig] = res
        return res
    if node.kind == "unary" and _needs_idx(node.op):
        # index-consuming nodes: the index vector rides on a dedicated
        # kernel argument (reference arg.secondary, op_arg_pos metadata)
        idx_arr = args[node.op_arg_pos]
        x = kids[0].astype(comp)
        if node.op == UnaryType.GATHER:
            axis = 1 if UnaryFlags(node.flags) & UnaryFlags.GS_COLS else 0
            res = jnp.take(x, idx_arr.reshape(-1), axis=axis)
        else:
            rows = jnp.take(x, idx_arr.reshape(-1), axis=0)
            red = {UnaryType.REDUCE_COLS_IDX_OP_ADD: jnp.sum,
                   UnaryType.REDUCE_COLS_IDX_OP_MAX: jnp.max,
                   UnaryType.REDUCE_COLS_IDX_OP_MIN: jnp.min}[node.op]
            res = red(rows, axis=0, keepdims=True)
    elif node.kind == "unary":
        # BCAST_* flags are resolved by jnp broadcasting at the consumer op
        res = apply_unary_op(node.op, UnaryFlags(node.flags),
                             kids[0].astype(comp))
    elif node.kind == "binary":
        op = node.op
        if op.name.startswith("MATMUL") or op.name.startswith("BRGEMM"):
            a, b = kids
            a_dt = getattr(node.children[0], "dtype", Datatype.BF16)
            res = apply_matmul_node(op, a, b, a_dt, comp)
        else:
            res = apply_binary_op(op, BinaryFlags(node.flags),
                                  *(k.astype(comp) for k in kids))
    elif node.kind == "ternary":
        op = node.op
        if op.name.startswith("MATMUL") or op.name.startswith("BRGEMM"):
            a, b, c = kids
            a_dt = getattr(node.children[0], "dtype", Datatype.BF16)
            res = apply_matmul_node(op, a, b, a_dt, comp) + c.astype(comp)
        else:
            res = apply_ternary_op(op, TernaryFlags(node.flags),
                                   *(k.astype(comp) for k in kids))
    else:
        raise ValueError(node.kind)
    memo[sig] = res
    return res


def _tree_signature(node: EqnNode):
    if node.kind == "arg":
        return ("arg", node.m, node.n, node.in_pos, node.dtype,
                node.set_card)
    return (node.kind, node.op, int(node.flags), node.dtype,
            node.op_arg_pos,
            tuple(_tree_signature(c) for c in node.children))


def dispatch_meqn(idx: int, out_m=None, out_n: int = None,
                  out_type: Datatype = Datatype.F32) -> Kernel:
    """libxsmm_dispatch_meqn analogue: fuse the tree into one jitted kernel.

    Returned kernel takes the args in in_pos order: kernel(arg0, arg1, ...).
    Second arg may be a MeqnArgShape (the reference v2 signature,
    include/libxsmm.h:162) instead of out_m/out_n/out_type.
    """
    if isinstance(out_m, MeqnArgShape):
        out_m, out_n, out_type = out_m.m, out_m.n, out_m.type
    eqn = _eqn(idx)
    if not eqn.is_complete():
        raise ValueError(f"equation {idx} is incomplete")
    desc = ("meqn", _tree_signature(eqn.root), out_m, out_n, out_type)

    def _build(_key):
        out_dt = to_jnp(out_type)
        root = eqn.root
        if root.kind == "unary" and root.op == UnaryType.UNZIP \
                and out_type not in (Datatype.U16, Datatype.I16):
            # UNZIP emits raw uint16 bit halves; a value cast (astype) to
            # any float type would silently destroy the bit-split contract
            raise ValueError("UNZIP-rooted equations produce raw 16-bit "
                             "halves: out_type must be U16 or I16 "
                             f"(got {out_type})")

        # F64 anywhere in the tree needs x64 tracing (same contract as
        # ops.gemm._ensure_x64)
        def _has_f64(n):
            return (n.dtype == Datatype.F64
                    or any(_has_f64(c) for c in n.children))
        if (out_type == Datatype.F64 or _has_f64(root)) \
                and not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)

        @jax.named_scope(f"xsmm_meqn_{idx}_{out_m}x{out_n}")
        def run(*args):
            res = _eval(root, args, memo={}, sig_cache={})
            if isinstance(res, tuple):
                return tuple(r.astype(out_dt) for r in res)
            return res.astype(out_dt)

        # nflops: 2*m*n*k per matmul node, m*n per eltwise op node — the
        # introspection contract of libxsmm_get_kernel_info (kernel
        # nflops, main.c:3004). Each node is costed at its OWN inferred
        # shape (propagated bottom-up from the arg nodes), not the root's:
        # a matmul feeding a reduce, or one whose operands are themselves
        # op nodes, would otherwise be counted at the wrong dims.
        def _matmul_dims(node, idx_lens):
            """(m, n, k) of a MATMUL/BRGEMM node after transpose flags."""
            (am, an) = _node_shape(node.children[0], idx_lens)
            (bm, bn) = _node_shape(node.children[1], idx_lens)
            name = node.op.name
            if "A_TRANS" in name or "A_VNNI_TRANS" in name:
                am, an = an, am
            if "B_TRANS" in name:
                bm, bn = bn, bm
            return am, bn, an

        def _node_shape(node, idx_lens):
            if node.kind == "arg":
                return node.m, node.n
            name = node.op.name
            if (node.kind in ("binary", "ternary")
                    and (name.startswith("MATMUL")
                         or name.startswith("BRGEMM"))):
                m_, n_, _k = _matmul_dims(node, idx_lens)
                return m_, n_
            if "REDUCE_TO_SCALAR" in name:
                return 1, 1
            if node.kind == "unary" and _needs_idx(node.op):
                # index-consuming nodes shrink the tensor: cost them (and
                # everything above) at the POST-gather dims, not the
                # child's. GATHER's gathered count is the index-vector
                # length — unknown until the kernel sees real args
                # (idx_lens, refined on first call); the reduce variants
                # are statically (1, child_n).
                cm, cn = _node_shape(node.children[0], idx_lens)
                if node.op != UnaryType.GATHER:
                    return 1, cn
                g = idx_lens.get(node.op_arg_pos) if idx_lens else None
                if UnaryFlags(node.flags) & UnaryFlags.GS_COLS:
                    return cm, (g if g is not None else cn)
                return (g if g is not None else cm), cn
            shapes = [_node_shape(c, idx_lens) for c in node.children]
            return (max(s[0] for s in shapes),   # eltwise broadcast
                    max(s[1] for s in shapes))

        def _nflops(node, idx_lens=None):
            total = sum(_nflops(c, idx_lens) for c in node.children)
            if node.kind == "arg":
                return 0
            name = node.op.name
            if (node.kind in ("binary", "ternary")
                    and (name.startswith("MATMUL")
                         or name.startswith("BRGEMM"))):
                m_, n_, k_ = _matmul_dims(node, idx_lens)
                # a tensor-set (stacked) operand multiplies the node's work
                # by its cardinality: BRGEMM reduces `card` matmuls
                card = max([c.set_card for c in node.children
                            if c.kind == "arg"] + [1])
                return total + 2 * m_ * n_ * max(1, k_) * card
            if (node.kind == "unary" and _needs_idx(node.op)
                    and node.op != UnaryType.GATHER):
                # idx-reduce reads len(idx) gathered rows of the child:
                # cost input work, not the (1, n) output
                _cm, cn = _node_shape(node.children[0], idx_lens)
                g = (idx_lens or {}).get(node.op_arg_pos)
                return total + (g if g is not None else _cm) * cn
            m_, n_ = _node_shape(node, idx_lens)
            return total + m_ * n_

        def _gather_positions(node, out):
            if (node.kind == "unary" and _needs_idx(node.op)
                    and node.op_arg_pos >= 0):
                out.add(node.op_arg_pos)
            for c in node.children:
                _gather_positions(c, out)
            return out

        info = KernelInfo(kind="meqn", nflops=max(out_m * out_n,
                                                  _nflops(root)))
        jfn = jax.jit(run)
        gpos = _gather_positions(root, set())
        if gpos:
            # refine nflops from the index-vector lengths, re-checking on
            # every call: the registry caches this Kernel for the tree's
            # lifetime, and a caller may re-invoke it with index vectors of
            # a different length (a one-shot refinement would freeze the
            # first call's cost into all later introspection)
            last_lens = {}

            def fn(*args):
                lens = {p: int(np.prod(np.shape(args[p]))) for p in gpos}
                if lens != last_lens:
                    info.nflops = max(out_m * out_n, _nflops(root, lens))
                    last_lens.clear()
                    last_lens.update(lens)
                return jfn(*args)
        else:
            fn = jfn
        return Kernel(fn=fn, descriptor=desc, info=info,
                      name=f"meqn_{out_m}x{out_n}")

    return get_registry().dispatch(desc, _build)


def dispatch_meqn_desc(descriptor: MeqnDescriptor) -> Kernel:
    """libxsmm_dispatch_meqn_desc analogue (include/libxsmm.h:161): dispatch
    from a pre-built equation descriptor. Row-major contract: ldo is part of
    the descriptor for parity but XLA owns layout (ldo must equal n)."""
    if descriptor.ldo not in (0, descriptor.n):
        raise ValueError("row-major contract: ldo must equal n (or 0)")
    return dispatch_meqn(descriptor.eqn_idx, descriptor.m, descriptor.n,
                         descriptor.datatype)


def meqn_destroy(idx: int) -> None:
    with _eqn_lock:
        _equations.pop(idx, None)
