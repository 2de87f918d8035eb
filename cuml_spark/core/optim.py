"""Pure-numpy optimizers for per-series model fitting inside pandas UDFs.

The reference fits Holt-Winters with a Nelder-Mead-style optimizer
(cpp/src/holtwinters/internal/hw_optim.h) and ARIMA with host-side L-BFGS-B
(python/cuml/tsa/batched_lbfgs.py:37).  scipy is not a dependency of this
engine, so we carry a small, deterministic Nelder-Mead here — each *series*
fits independently inside one Spark task, so the optimizer itself never needs
to be distributed.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np


def nelder_mead(
    f: Callable[[np.ndarray], float],
    x0: np.ndarray,
    bounds: list[tuple[float, float]] | None = None,
    max_iter: int = 200,
    tol: float = 1e-7,
    step: float = 0.1,
) -> tuple[np.ndarray, float]:
    """Minimize ``f`` from ``x0``; returns (x_best, f_best).

    Standard simplex reflect/expand/contract/shrink with box-bound clipping
    (matches hw_optim.h's bounded NM semantics: params like alpha/beta/gamma
    live in [0,1]).  Deterministic given x0.
    """
    x0 = np.asarray(x0, dtype=np.float64)
    n = x0.size

    def clip(x: np.ndarray) -> np.ndarray:
        if bounds is None:
            return x
        lo = np.array([b[0] for b in bounds])
        hi = np.array([b[1] for b in bounds])
        return np.clip(x, lo, hi)

    simplex = [clip(x0)]
    for i in range(n):
        p = x0.copy()
        p[i] = p[i] + (step if p[i] == 0 else step * max(abs(p[i]), 1.0))
        simplex.append(clip(p))
    simplex = np.array(simplex)
    fvals = np.array([f(p) for p in simplex])

    for _ in range(max_iter):
        order = np.argsort(fvals, kind="stable")
        simplex, fvals = simplex[order], fvals[order]
        if abs(fvals[-1] - fvals[0]) <= tol * (abs(fvals[0]) + tol):
            break
        centroid = simplex[:-1].mean(axis=0)
        worst = simplex[-1]
        xr = clip(centroid + (centroid - worst))
        fr = f(xr)
        if fr < fvals[0]:
            xe = clip(centroid + 2.0 * (centroid - worst))
            fe = f(xe)
            if fe < fr:
                simplex[-1], fvals[-1] = xe, fe
            else:
                simplex[-1], fvals[-1] = xr, fr
        elif fr < fvals[-2]:
            simplex[-1], fvals[-1] = xr, fr
        else:
            xc = clip(centroid + 0.5 * (worst - centroid))
            fc = f(xc)
            if fc < fvals[-1]:
                simplex[-1], fvals[-1] = xc, fc
            else:  # shrink toward best
                for i in range(1, n + 1):
                    simplex[i] = clip(simplex[0] + 0.5 * (simplex[i] - simplex[0]))
                    fvals[i] = f(simplex[i])
    best = int(np.argmin(fvals))
    return simplex[best], float(fvals[best])


def multi_start_nelder_mead(
    f: Callable[[np.ndarray], float],
    starts: list[np.ndarray],
    bounds: list[tuple[float, float]] | None = None,
    max_iter: int = 200,
) -> tuple[np.ndarray, float]:
    """Run NM from several deterministic starts, keep the best optimum."""
    best_x, best_f = None, np.inf
    for s in starts:
        x, fx = nelder_mead(f, np.asarray(s, dtype=np.float64), bounds, max_iter)
        if fx < best_f:
            best_x, best_f = x, fx
    return best_x, best_f
