/* C bridge to the REFERENCE portable kernels for numerical-parity testing.
 *
 * BASELINE.md row 3 demands parity "vs reference generator_*_reference_impl
 * outputs" — this shim links the reference's OWN portable implementations
 * (compiled unmodified from a read-only snapshot copy, see
 * scripts/build_ref_impl.sh) behind a flat ctypes-friendly ABI, so tests can
 * compare libxsmm_tpu kernels against the reference bytes directly instead
 * of against hand-written NumPy oracles (which the r3 review sweep proved
 * fallible: inverted SELECT, swapped matdiff norms, wrong hash convention).
 *
 * This file contains ONLY interface plumbing written for this project; the
 * reference implementation objects are compiled from the snapshot at build
 * time and never copied into this repository.
 *
 * Reference entry points used (read-only snapshot):
 *   src/generator_mateltwise_reference_impl.h: libxsmm_reference_*_elementwise
 *   src/generator_gemm_reference_impl.h:       libxsmm_reference_gemm
 *   src/libxsmm_generator.c: libxsmm_gemm_descriptor_init,
 *                            libxsmm_meltw_descriptor_init2
 */
#include <stddef.h>
#include <string.h>

#include <stdlib.h>

#include <libxsmm_typedefs.h>
#include <libxsmm_generator.h>
#include "libxsmm_main.h"
#include "libxsmm_matrixeqn.h"
#include "generator_mateltwise_reference_impl.h"
#include "generator_gemm_reference_impl.h"
#include "generator_matequation_reference_impl.h"

/* ---- stubs for symbols the linked reference TUs reference only on debug/
 * verbose paths (their real homes, libxsmm_main.c / libxsmm_timer.c, pull
 * the whole runtime; none of the behavior under test touches them) ------ */
LIBXSMM_API void libxsmm_init(void) {}
LIBXSMM_API const char* libxsmm_get_typename(libxsmm_datatype datatype) {
  (void)datatype;
  return "?";
}
LIBXSMM_API_INTERN int libxsmm_print_cmdline(void* buffer, size_t buffer_size,
                                             const char* prefix,
                                             const char* postfix) {
  (void)buffer; (void)buffer_size; (void)prefix; (void)postfix;
  return 0;
}
LIBXSMM_API libxsmm_timer_tickint libxsmm_timer_tick(void) { return 0; }

/* ---- mateltwise ------------------------------------------------------- */

/* operation: 1=unary 2=binary 3=ternary (LIBXSMM_MELTW_OPERATION_*).
 * dtypes are libxsmm_datatype enum values (libxsmm_tpu's Datatype mirrors
 * the numbering — the API-parity contract).
 * Pointer slots map to the reference param structs:
 *   inX[0]=primary inX[1]=secondary inX[2]=tertiary
 *   op[0..2]=op.primary/secondary/tertiary, out[0..1]=out.primary/secondary
 * Returns 0 on success, nonzero when the descriptor could not be built. */
int xsmm_ref_meltw(unsigned int operation, unsigned short type,
                   unsigned short flags,
                   unsigned int m, unsigned int n,
                   unsigned int ldi, unsigned int ldi2, unsigned int ldi3,
                   unsigned int ldo,
                   unsigned int dt_in0, unsigned int dt_in1,
                   unsigned int dt_in2, unsigned int dt_out,
                   unsigned int dt_comp,
                   void* in0_p, void* in0_s, void* in0_t,
                   void* in1_p, void* in1_s,
                   void* in2_p, void* in2_s,
                   void* op_p, void* op_s, void* op_t,
                   void* out_p, void* out_s) {
  libxsmm_descriptor_blob blob;
  /* init2 arg order: in0, in1, in2, COMP, OUT (libxsmm_generator.c:90) */
  const libxsmm_meltw_descriptor* desc = libxsmm_meltw_descriptor_init2(
      &blob, (libxsmm_datatype)dt_in0, (libxsmm_datatype)dt_in1,
      (libxsmm_datatype)dt_in2, (libxsmm_datatype)dt_comp,
      (libxsmm_datatype)dt_out, (libxsmm_blasint)m, (libxsmm_blasint)n,
      (libxsmm_blasint)ldi, (libxsmm_blasint)ldo, (libxsmm_blasint)ldi2,
      (libxsmm_blasint)ldi3, flags, type, (unsigned char)operation);
  if (NULL == desc) return 1;
  if (operation == LIBXSMM_MELTW_OPERATION_UNARY) {
    libxsmm_meltw_unary_param p;
    memset(&p, 0, sizeof(p));
    p.in.primary = in0_p; p.in.secondary = in0_s; p.in.tertiary = in0_t;
    p.op.primary = op_p; p.op.secondary = op_s; p.op.tertiary = op_t;
    p.out.primary = out_p; p.out.secondary = out_s;
    libxsmm_reference_unary_elementwise(&p, desc);
    return 0;
  }
  if (operation == LIBXSMM_MELTW_OPERATION_BINARY) {
    libxsmm_meltw_binary_param p;
    memset(&p, 0, sizeof(p));
    p.in0.primary = in0_p; p.in0.secondary = in0_s;
    p.in1.primary = in1_p; p.in1.secondary = in1_s;
    p.op.primary = op_p; p.op.secondary = op_s;
    p.out.primary = out_p; p.out.secondary = out_s;
    libxsmm_reference_binary_elementwise(&p, desc);
    return 0;
  }
  if (operation == LIBXSMM_MELTW_OPERATION_TERNARY) {
    libxsmm_meltw_ternary_param p;
    memset(&p, 0, sizeof(p));
    p.in0.primary = in0_p; p.in0.secondary = in0_s;
    p.in1.primary = in1_p; p.in1.secondary = in1_s;
    p.in2.primary = in2_p; p.in2.secondary = in2_s;
    p.op.primary = op_p; p.op.secondary = op_s;
    p.out.primary = out_p; p.out.secondary = out_s;
    libxsmm_reference_ternary_elementwise(&p, desc);
    return 0;
  }
  return 2;
}

/* ---- matrix equations --------------------------------------------------
 * Flat wrappers over the reference's PUBLIC equation builder (the struct-
 * by-value signatures are awkward through ctypes) plus an executor that
 * reproduces the x86 reference JIT's setup (generator_x86_reference.c:
 * 115-210): unfold the optimized exec tree per timestamp, patch the last
 * op with the output ld/dtype, allocate the tmp scratchpad, and call
 * libxsmm_reference_matequation. */

int xsmm_ref_meqn_create(void) { return libxsmm_meqn_create(); }

int xsmm_ref_meqn_push_arg(int idx, int m, int n, int ld, int in_pos,
                           unsigned int dtype) {
  libxsmm_meqn_arg_metadata md;
  libxsmm_meqn_arg_shape shp;
  libxsmm_matrix_arg_attributes attr;
  memset(&attr, 0, sizeof(attr));
  md.eqn_idx = idx;
  md.in_arg_pos = in_pos;
  shp.m = m; shp.n = n; shp.ld = ld;
  shp.type = (libxsmm_datatype)dtype;
  attr.type = LIBXSMM_MATRIX_ARG_TYPE_SINGULAR;
  attr.set_type = LIBXSMM_MATRIX_ARG_SET_TYPE_NONE;
  return libxsmm_meqn_push_back_arg(md, shp, attr);
}

int xsmm_ref_meqn_push_op(int idx, unsigned int arity, unsigned int type,
                          unsigned int dtype, unsigned int flags,
                          int op_arg_pos) {
  libxsmm_meqn_op_metadata md;
  md.eqn_idx = idx;
  md.op_arg_pos = op_arg_pos;
  if (arity == 1) {
    return libxsmm_meqn_push_back_unary_op(
        md, (libxsmm_meltw_unary_type)type, (libxsmm_datatype)dtype,
        (libxsmm_bitfield)flags);
  }
  if (arity == 2) {
    return libxsmm_meqn_push_back_binary_op(
        md, (libxsmm_meltw_binary_type)type, (libxsmm_datatype)dtype,
        (libxsmm_bitfield)flags);
  }
  if (arity == 3) {
    return libxsmm_meqn_push_back_ternary_op(
        md, (libxsmm_meltw_ternary_type)type, (libxsmm_datatype)dtype,
        (libxsmm_bitfield)flags);
  }
  return 1;
}

static libxsmm_meqn_elem* xsmm_ref_find_op_at(libxsmm_meqn_elem* node,
                                              libxsmm_blasint t) {
  libxsmm_meqn_elem* r;
  if (node == NULL || node->type == LIBXSMM_MATRIX_EQN_NODE_ARG) return NULL;
  if (node->visit_timestamp == t) return node;
  r = xsmm_ref_find_op_at(node->le, t);
  if (r != NULL) return r;
  r = xsmm_ref_find_op_at(node->ri, t);
  if (r != NULL) return r;
  return xsmm_ref_find_op_at(node->r2, t);
}

/* inputs: array of libxsmm_matrix_arg (6 pointers each) in in_pos order */
int xsmm_ref_meqn_run(int idx, unsigned int ldo, unsigned int out_dt,
                      void* inputs, void* out_ptr) {
  libxsmm_matrix_eqn* eqn = libxsmm_meqn_get_equation(idx);
  libxsmm_meqn_elem* tree;
  unsigned long long padded, tmp_size, scratch_size;
  libxsmm_blasint t, last;
  unsigned char* scratch;
  libxsmm_meqn_param p;
  if (eqn == NULL || eqn->is_constructed == 0) return 1;
  last = eqn->eqn_root->visit_timestamp;
  padded = ((((unsigned long long)(last + 1) * 5
              * sizeof(libxsmm_meqn_elem)) + 63) / 64) * 64;
  tree = (libxsmm_meqn_elem*)malloc(padded);
  if (tree == NULL) return 2;
  memset(tree, 0, padded);
  for (t = 0; t <= last; t++) {
    libxsmm_meqn_elem* cur = xsmm_ref_find_op_at(eqn->eqn_root, t);
    if (cur != NULL) {
      tree[t * 5 + 0] = *cur;
      if (cur->le != NULL) tree[t * 5 + 1] = *(cur->le);
      if (cur->ri != NULL) tree[t * 5 + 2] = *(cur->ri);
      if (cur->r2 != NULL) tree[t * 5 + 3] = *(cur->r2);
      if (cur->up != NULL) tree[t * 5 + 4] = *(cur->up);
    }
    if (t == last) {
      tree[t * 5 + 0].reg_score = -1;
      tree[t * 5 + 0].tmp.ld = (libxsmm_blasint)ldo;
      tree[t * 5 + 0].tmp.dtype = (libxsmm_datatype)out_dt;
    }
  }
  tmp_size = (unsigned long long)eqn->eqn_root->max_tmp_size
             * (unsigned long long)eqn->eqn_root->tree_max_comp_tsize;
  tmp_size = (tmp_size % 64 == 0) ? tmp_size : ((tmp_size + 63) / 64) * 64;
  scratch_size = tmp_size
                 * (unsigned long long)(eqn->eqn_root->reg_score > 0
                                        ? eqn->eqn_root->reg_score : 1);
  scratch = (unsigned char*)malloc((size_t)scratch_size + 64);
  if (scratch == NULL) { free(tree); return 3; }
  memset(&p, 0, sizeof(p));
  p.ops_args = NULL;
  p.inputs = (const libxsmm_matrix_arg*)inputs;
  p.output.primary = out_ptr;
  libxsmm_reference_matequation(&p, tree, scratch, tmp_size);
  free(scratch);
  free(tree);
  return 0;
}


/* ---- gemm / brgemm ----------------------------------------------------
 * flags: LIBXSMM_GEMM_FLAG_* bitfield (libxsmm_tpu GemmFlags mirrors it).
 * brcount: 0 = plain GEMM; >0 with LIBXSMM_GEMM_FLAG_BATCH_REDUCE_* in
 * flags = stride-mode BRGEMM (op.tertiary carries &brcount per the
 * reference ABI; stride hints ride c1/c2 via descriptor_init args).
 * a2/b2: secondary operands (sub-byte/MX scale pointers where relevant). */
/* GEMM-ext: fused unary argops + binary postop through the reference's
 * XGEMM ext ABI (libxsmm_gemm_descriptor_init_brgemm_ext +
 * libxsmm_reference_gemm with a libxsmm_gemm_ext_param). br_type:
 * 0=none 1=address 2=offset 4=stride (libxsmm_gemm_batch_reduce_type). */
int xsmm_ref_gemm_ext(unsigned int m, unsigned int n, unsigned int k,
                      unsigned int lda, unsigned int ldb, unsigned int ldc,
                      unsigned int dt_a, unsigned int dt_b,
                      unsigned int dt_c, unsigned int dt_comp,
                      unsigned int flags, unsigned int br_type,
                      unsigned long long brcount,
                      long long stride_a, long long stride_b,
                      unsigned int ap_op, unsigned int ap_flags,
                      unsigned int bp_op, unsigned int bp_flags,
                      unsigned int cp_op, unsigned int cp_flags,
                      unsigned int store_cp,
                      unsigned int d_type, unsigned int d_flags,
                      unsigned int d_dtype, unsigned int ldd,
                      void* a, void* b, void* c, void* d,
                      void* cp_out, void* op_p) {
  libxsmm_descriptor_blob blob;
  libxsmm_gemm_shape shp;
  libxsmm_gemm_batch_reduce_config brc;
  libxsmm_gemm_ext_unary_argops uops;
  libxsmm_gemm_ext_binary_postops bops;
  libxsmm_gemm_descriptor* desc;
  memset(&shp, 0, sizeof(shp));
  memset(&brc, 0, sizeof(brc));
  memset(&uops, 0, sizeof(uops));
  memset(&bops, 0, sizeof(bops));
  shp.m = (libxsmm_blasint)m; shp.n = (libxsmm_blasint)n;
  shp.k = (libxsmm_blasint)k;
  shp.lda = (libxsmm_blasint)lda; shp.ldb = (libxsmm_blasint)ldb;
  shp.ldc = (libxsmm_blasint)ldc;
  shp.a_in_type = (libxsmm_datatype)dt_a;
  shp.b_in_type = (libxsmm_datatype)dt_b;
  shp.out_type = (libxsmm_datatype)dt_c;
  shp.comp_type = (libxsmm_datatype)dt_comp;
  brc.br_type = (libxsmm_gemm_batch_reduce_type)br_type;
  brc.br_stride_a_hint = (libxsmm_blasint)stride_a;
  brc.br_stride_b_hint = (libxsmm_blasint)stride_b;
  uops.ldap = (libxsmm_blasint)m;
  uops.ap_unary_type = (libxsmm_meltw_unary_type)ap_op;
  uops.ap_unary_flags = (libxsmm_bitfield)ap_flags;
  uops.ldbp = (libxsmm_blasint)k;
  uops.bp_unary_type = (libxsmm_meltw_unary_type)bp_op;
  uops.bp_unary_flags = (libxsmm_bitfield)bp_flags;
  uops.ldcp = (libxsmm_blasint)ldc;
  uops.cp_unary_type = (libxsmm_meltw_unary_type)cp_op;
  uops.cp_unary_flags = (libxsmm_bitfield)cp_flags;
  uops.store_cp = (libxsmm_blasint)store_cp;
  bops.ldd = (libxsmm_blasint)ldd;
  bops.d_in_type = (libxsmm_datatype)d_dtype;
  bops.d_binary_type = (libxsmm_meltw_binary_type)d_type;
  bops.d_binary_flags = (libxsmm_bitfield)d_flags;
  desc = libxsmm_gemm_descriptor_init_brgemm_ext(
      &blob, shp, (libxsmm_bitfield)flags,
      (libxsmm_bitfield)LIBXSMM_GEMM_PREFETCH_NONE, brc, uops, bops);
  if (NULL == desc) return 1;
  if (br_type == LIBXSMM_GEMM_BATCH_REDUCE_STRIDE) {
    desc->c1 = stride_a;
    desc->c2 = stride_b;
  }
  {
    libxsmm_gemm_ext_param p;
    unsigned long long br = brcount;
    memset(&p, 0, sizeof(p));
    p.a.primary = a;
    p.b.primary = b;
    p.c.primary = c;
    p.d.primary = d;
    p.cp.primary = cp_out;
    p.op.primary = op_p;
    p.op.tertiary = &br;
    libxsmm_reference_gemm(&p, desc);
  }
  return 0;
}


int xsmm_ref_gemm(unsigned int m, unsigned int n, unsigned int k,
                  unsigned int lda, unsigned int ldb, unsigned int ldc,
                  unsigned int dt_a, unsigned int dt_b, unsigned int dt_c,
                  unsigned int dt_comp, unsigned int flags,
                  long long stride_a, long long stride_b,
                  unsigned long long brcount,
                  void* a, void* a2, void* b, void* b2, void* c) {
  libxsmm_descriptor_blob blob;
  /* init arg order: a, b, COMP, C (libxsmm_generator.c:36) */
  libxsmm_gemm_descriptor* desc = libxsmm_gemm_descriptor_init(
      &blob, (libxsmm_datatype)dt_a, (libxsmm_datatype)dt_b,
      (libxsmm_datatype)dt_comp, (libxsmm_datatype)dt_c,
      (libxsmm_blasint)m, (libxsmm_blasint)n, (libxsmm_blasint)k,
      (libxsmm_blasint)lda, (libxsmm_blasint)ldb, (libxsmm_blasint)ldc,
      (int)flags, (int)LIBXSMM_GEMM_PREFETCH_NONE);
  if (NULL == desc) return 1;
  desc->c1 = stride_a;
  desc->c2 = stride_b;
  {
    libxsmm_gemm_param p;
    unsigned long long br = brcount;
    memset(&p, 0, sizeof(p));
    p.a.primary = a; p.a.secondary = a2;
    p.b.primary = b; p.b.secondary = b2;
    p.c.primary = c;
    p.op.tertiary = &br;
    libxsmm_reference_gemm(&p, desc);
  }
  return 0;
}
