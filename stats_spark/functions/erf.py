"""Vectorized double-precision error function (numpy).

W. J. Cody's rational-Chebyshev approximation for erf/erfc (Cody,
"Rational Chebyshev approximation for the error function", Math. Comp.
23 (1969); coefficients and evaluation scheme as published in netlib
SPECFUN ``calerf``).  The reference engine relies on the same published
algorithm for its Glicko weighting
(`/root/reference/stats/src/util.ts:421-527`), so weights computed here
match its golden outputs to double precision.

scipy is not in this environment and ``math.erf`` is scalar-only; this
keeps the weighting hot path fully vectorized inside pandas UDFs.
"""

from __future__ import annotations

import numpy as np

# branch 1: |x| <= 0.46875, erf(x) = x * R(x^2)
_A = np.array([3.16112374387056560e0, 1.13864154151050156e2,
               3.77485237685302021e2, 3.20937758913846947e3,
               1.85777706184603153e-1])
_B = np.array([2.36012909523441209e1, 2.44024637934444173e2,
               1.28261652607737228e3, 2.84423683343917062e3])

# branch 2: 0.46875 < |x| <= 4, erfc(x) = exp(-x^2) * R(x)
_C = np.array([5.64188496988670089e-1, 8.88314979438837594e0,
               6.61191906371416295e1, 2.98635138197400131e2,
               8.81952221241769090e2, 1.71204761263407058e3,
               2.05107837782607147e3, 1.23033935479799725e3,
               2.15311535474403846e-8])
_D = np.array([1.57449261107098347e1, 1.17693950891312499e2,
               5.37181101862009858e2, 1.62138957456669019e3,
               3.29079923573345963e3, 4.36261909014324716e3,
               3.43936767414372164e3, 1.23033935480374942e3])

# branch 3: |x| > 4, erfc(x) = exp(-x^2)/x * (1/sqrt(pi) - R(1/x^2)/x^2)
_P = np.array([3.05326634961232344e-1, 3.60344899949804439e-1,
               1.25781726111229246e-1, 1.60837851487422766e-2,
               6.58749161529837803e-4, 1.63153871373020978e-2])
_Q = np.array([2.56852019228982242e0, 1.87295284992346047e0,
               5.27905102951428412e-1, 6.05183413124413191e-2,
               2.33520497626869185e-3])

_SQRPI = 5.6418958354775628695e-1  # 1/sqrt(pi)
_THRESH = 0.46875
_XBIG = 26.543


def erf(x) -> np.ndarray:
    """erf over a float64 array; agrees with C libm to ~1 ulp."""
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x)
    a = np.abs(x)
    out = np.empty_like(x)

    m0 = a <= _THRESH
    if m0.any():
        z = x[m0] * x[m0]
        xnum = _A[4] * z
        xden = z
        for i in range(3):
            xnum = (xnum + _A[i]) * z
            xden = (xden + _B[i]) * z
        out[m0] = x[m0] * (xnum + _A[3]) / (xden + _B[3])

    m1 = (a > _THRESH) & (a <= 4.0)
    if m1.any():
        y = a[m1]
        xnum = _C[8] * y
        xden = y
        for i in range(7):
            xnum = (xnum + _C[i]) * y
            xden = (xden + _D[i]) * y
        r = (xnum + _C[7]) / (xden + _D[7])
        ysq = np.floor(y * 16.0) / 16.0
        del2 = (y - ysq) * (y + ysq)
        erfc = np.exp(-ysq * ysq) * np.exp(-del2) * r
        out[m1] = np.where(x[m1] >= 0, 1.0 - erfc, erfc - 1.0)

    m2 = a > 4.0
    if m2.any():
        y = a[m2]
        z = 1.0 / (y * y)
        xnum = _P[5] * z
        xden = z
        for i in range(4):
            xnum = (xnum + _P[i]) * z
            xden = (xden + _Q[i]) * z
        r = z * (xnum + _P[4]) / (xden + _Q[4])
        ysq = np.floor(y * 16.0) / 16.0
        del2 = (y - ysq) * (y + ysq)
        erfc = np.exp(-ysq * ysq) * np.exp(-del2) * (_SQRPI - r) / y
        erfc = np.where(y >= _XBIG, 0.0, erfc)
        out[m2] = np.where(x[m2] >= 0, 1.0 - erfc, erfc - 1.0)

    return out[0] if scalar else out
