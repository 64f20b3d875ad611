#!/usr/bin/env bash
# Build the REFERENCE portable kernels + our C shim into
# native/libxsmm_refimpl.so — the oracle for numerical-parity tests
# (BASELINE.md row 3: parity vs reference generator_*_reference_impl).
#
# The reference snapshot is READ-ONLY: everything is compiled from a
# throwaway copy under $BLD; nothing reference-derived enters the repo
# (the .so is a gitignored build artifact, like native/xsmm_native.so).
#
# Usage: bash scripts/build_ref_impl.sh [build-dir]
set -euo pipefail
cd "$(dirname "$0")/.."
REF="${XSMM_REFERENCE_DIR:-/root/reference}"
BLD="${1:-/tmp/xsmm_refimpl_build}"
OUT="native/libxsmm_refimpl.so"

[ -d "$REF/src" ] || { echo "reference snapshot not found at $REF"; exit 1; }
command -v gcc >/dev/null || { echo "gcc not available"; exit 1; }

rm -rf "$BLD"
mkdir -p "$BLD"
cp -r --no-preserve=mode "$REF/src" "$REF/include" "$REF/scripts" \
      "$REF/version.txt" "$REF/VERSION" "$BLD/"

# libxsmm_config.h ships in the snapshot; only the version header is
# build-generated (the reference Makefile's `config` target)
python "$BLD/scripts/libxsmm_config.py" "$BLD/src/template/libxsmm_version.h" \
  > "$BLD/include/libxsmm_version.h"

# Minimal TU closure for the reference impls (found empirically: link and
# add the TU that defines each remaining undefined libxsmm_* symbol; the
# four debug/init-only leftovers are stubbed in the shim):
TUS="generator_mateltwise_reference_impl generator_gemm_reference_impl \
     generator_matequation_reference_impl libxsmm_generator \
     generator_common libxsmm_lpflt_quant libxsmm_cpuid_x86 \
     libxsmm_matrixeqn libxsmm_math libxsmm_utils"
OBJS=""
for f in $TUS; do
  gcc -c -O2 -DNDEBUG -fPIC -I "$BLD/include" -I "$BLD/src" "$BLD/src/$f.c" \
      -o "$BLD/$f.o"
  OBJS="$OBJS $BLD/$f.o"
done
gcc -c -O2 -DNDEBUG -fPIC -I "$BLD/include" -I "$BLD/src" native/xsmm_ref_shim.c \
    -o "$BLD/ref_shim.o"
gcc -shared -o "$OUT" "$BLD/ref_shim.o" $OBJS -lm

# fail loudly on any unresolved libxsmm symbol (a silent one would surface
# as an OSError at ctypes call time instead)
if nm -D "$OUT" | grep " U libxsmm" >/dev/null; then
  echo "ERROR: unresolved libxsmm symbols remain:" >&2
  nm -D "$OUT" | grep " U libxsmm" >&2
  exit 1
fi
echo "built $OUT"
