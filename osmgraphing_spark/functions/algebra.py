"""Small dense linear algebra for the route explorator's alpha systems.

Parity: the reference solves the k x k "equalizing alpha" system of its
convex-hull explorator with an in-house pivoted LU
(/root/reference/src/helpers/algebra.rs:19-73, F9 in SURVEY §2.7). k is the
number of edge metrics (2-3 in every reference config), so this is
driver-side math in BOTH engines by design — the distributed work is the
per-alpha shortest-path run, not the k x k solve.
"""

from __future__ import annotations

import numpy as np


class SingularSystemError(ValueError):
    """The facet's cost vectors are affinely dependent — no unique alpha."""


def lu_solve(a, b, tol: float = 1e-12) -> np.ndarray:
    """Solve ``a @ x = b`` by Gaussian elimination with partial pivoting
    (the reference's LU role, algebra.rs:19-73). Raises
    :class:`SingularSystemError` when a pivot falls under ``tol`` — the
    explorator treats that facet as degenerate and skips it, matching the
    reference's explorating.rs behavior on dependent cost vectors."""
    m = np.asarray(a, dtype=np.float64).copy()
    x = np.asarray(b, dtype=np.float64).copy()
    n = m.shape[0]
    if m.shape != (n, n) or x.shape != (n,):
        raise ValueError(f"shape mismatch: {m.shape} vs {x.shape}")
    for col in range(n):
        piv = col + int(np.argmax(np.abs(m[col:, col])))
        if abs(m[piv, col]) < tol:
            raise SingularSystemError(f"pivot ~0 in column {col}")
        if piv != col:
            m[[col, piv]] = m[[piv, col]]
            x[[col, piv]] = x[[piv, col]]
        factors = m[col + 1 :, col] / m[col, col]
        m[col + 1 :, col:] -= np.outer(factors, m[col, col:])
        x[col + 1 :] -= factors * x[col]
    out = np.zeros(n)
    for row in range(n - 1, -1, -1):
        out[row] = (x[row] - m[row, row + 1 :] @ out[row + 1 :]) / m[row, row]
    return out


def equalizing_alpha(cost_vectors, tol: float = 1e-12) -> np.ndarray:
    """Alpha weighting k metric-cost vectors to EQUAL scalar cost.

    Given k route cost vectors c_1..c_k (each length k), solve::

        alpha . c_1 = alpha . c_j   (j = 2..k)
        sum(alpha) = 1

    — the system the reference builds per convex-hull facet
    (explorating.rs:239-284). Result may have negative components; the
    caller decides whether such a facet is explorable (it is not)."""
    c = np.asarray(cost_vectors, dtype=np.float64)
    k = c.shape[0]
    if c.shape != (k, k):
        raise ValueError(f"need k vectors of length k, got {c.shape}")
    a = np.vstack([c[0] - c[1:], np.ones((1, k))])
    b = np.zeros(k)
    b[-1] = 1.0
    return lu_solve(a, b, tol=tol)
