"""Scalar math helpers.

Parity with the reference's math utilities (include/utils/libxsmm_math.h:
22-57, src/libxsmm_math.c): gcd/lcm, integer cbrt/sqrt bounds, exp2 for
unsigned 8-bit exponents (isqrt/icbrt/sexp2 family), plus the
LIBXSMM_MATDIFF-style epsilon logging hook used to calibrate test margins.
"""

from __future__ import annotations

import math
import os
from typing import Optional


def gcd(a: int, b: int) -> int:
    """Greatest common divisor; GCD(0, 0) == 1 (reference corner case)."""
    if a == 0 and b == 0:
        return 1
    return math.gcd(a, b)


def lcm(a: int, b: int) -> int:
    return abs(a * b) // gcd(a, b) if (a or b) else 0


def isqrt2(x: int) -> int:
    """Largest i with i*i <= x (libxsmm_isqrt2 semantics)."""
    return math.isqrt(max(0, x))


def icbrt2(x: int) -> int:
    """Largest i with i^3 <= x."""
    if x <= 0:
        return 0
    i = round(x ** (1.0 / 3.0))
    while i ** 3 > x:
        i -= 1
    while (i + 1) ** 3 <= x:
        i += 1
    return i


def sexp2(n: int) -> float:
    """2^n for small integer n (libxsmm_sexp2_u8/i8 family)."""
    return float(2.0 ** n)


def matdiff_log(epsilon: float, path: Optional[str] = None,
                note: str = "") -> None:
    """Append a measured epsilon to a calibration log, mirroring the
    LIBXSMM_MATDIFF env-file behavior (src/libxsmm_math.c:331-370):
    test drivers record their achieved tolerance so margins can be tuned.
    Path from arg or XSMM_TPU_MATDIFF env; silently no-op when unset."""
    path = path or os.environ.get("XSMM_TPU_MATDIFF")
    if not path:
        return
    if os.path.isdir(path):
        path = os.path.join(path, "libxsmm_matdiff.log")
    with open(path, "a") as f:
        f.write(f"{epsilon:.17g}{' ' + note if note else ''}\n")
