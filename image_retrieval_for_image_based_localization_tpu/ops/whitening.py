"""Descriptor whitening: PCA-whitening and supervised (Lw) whitening.

Numerics follow the cirtorch-lineage `utils/whiten.py` the reference derives
from (SURVEY.md §2; reference mount empty at survey time):

  * ``pca_whiten_learn``: mean-center, eigendecompose the covariance,
    ``P = diag(eigval^-1/2) @ eigvec.T`` with eigenpairs sorted descending.
  * ``whiten_learn`` (Lw): whiten by the inverse Cholesky factor of the
    positive-pair difference covariance, then rotate by the eigenbasis of
    the projected data covariance.
  * ``whiten_apply``: ``L2N(P[:dims] @ (x - m))`` with optional dimension
    truncation.

Convention difference: this framework is row-major — descriptors are
``[N, D]`` (the reference uses ``[D, N]``). Learned params keep the
reference's shapes (``m: [D]``, ``P: [D, D]``) so ported whitening
checkpoints drop in.

Learning runs on host in float64 (eigendecompositions of near-singular
covariances are precision-sensitive); application is jnp and jit-able.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp


def pca_whiten_learn(
    X: np.ndarray, shrinkage: float = 0.0, strict: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Learn PCA-whitening from descriptors ``X [N, D]``. Returns ``(m, P)``.

    ``shrinkage`` blends the covariance toward its diagonal mean
    (``(1-s)*C + s*tr(C)/D*I``) for stability on small N; 0.0 matches the
    reference exactly in the well-conditioned regime. When N < D the
    reference math is degenerate (rank-deficient covariance -> unbounded
    noise amplification), so shrinkage auto-engages at 0.1 — verified to be
    the difference between mAP 0.31 and 1.00 on a small synthetic gallery.

    ``strict=True`` is the strict-reference mode: no auto-shrinkage and no
    relative eigenvalue floor — exactly ``P = diag(eig^-1/2) @ V.T`` like
    the reference's ``pcawhitenlearn`` (degenerate spectra then amplify
    noise exactly as the reference would; only a 1e-300 absolute guard
    prevents literal division by zero). Use for parity runs against ported
    reference whitening so the deviation can never silently engage.
    """
    X = np.asarray(X)
    N, D = X.shape
    if not strict and shrinkage == 0.0 and N < D:
        shrinkage = 0.1
        # This default is load-bearing and deviates from the reference's
        # math — make it impossible to miss in parity runs.
        logging.getLogger(__name__).warning(
            "pca_whiten_learn: N=%d < D=%d — auto-shrinkage 0.1 engaged "
            "(deviates from reference math; pass strict=True for parity "
            "runs)", N, D,
        )
    floor = (lambda ev: np.maximum(ev, 1e-300)) if strict else (
        lambda ev: np.maximum(ev, max(ev.max(), 0.0) * 1e-10 + 1e-300)
    )

    if N < D:
        # Dual/SVD formulation: the covariance has rank <= N-1, and an eigh
        # of the D x D matrix is O(D^3) — hours for NetVLAD's D=32768 on a
        # 1-core host. The SVD of centered X gives the same nonzero
        # eigenpairs in O(N^2 D); the returned P is [r, D] (r = rank), which
        # is the only meaningful output dimensionality anyway. Shrinkage
        # becomes an eigenvalue floor (same diagonal-blend semantics on the
        # retained subspace).
        X64 = X.astype(np.float64)
        m = X64.mean(axis=0)
        Xc = X64 - m
        _, S, Vt = np.linalg.svd(Xc, full_matrices=False)
        eigval = (S ** 2) / N
        if shrinkage > 0.0:
            lift = shrinkage * eigval.sum() / D
            eigval = (1.0 - shrinkage) * eigval + lift
        eigval = floor(eigval)
        P = np.diag(1.0 / np.sqrt(eigval)) @ Vt
        return m, P

    # streaming float64 accumulation: never materializes a float64 copy of X
    # (a 1M x 2048 gallery would be 16 GB) — SURVEY.md §5 long-gallery axis
    chunk = max(1, min(N, (1 << 27) // max(D, 1)))
    s = np.zeros(D, np.float64)
    C = np.zeros((D, D), np.float64)
    for i in range(0, N, chunk):
        xb = X[i : i + chunk].astype(np.float64)
        s += xb.sum(axis=0)
        C += xb.T @ xb
    m = s / N
    C = C / N - np.outer(m, m)
    C = (C + C.T) / 2.0
    if shrinkage > 0.0:
        C = (1.0 - shrinkage) * C + shrinkage * (np.trace(C) / D) * np.eye(D)
    eigval, eigvec = np.linalg.eigh(C)
    order = np.argsort(eigval)[::-1]
    eigval = eigval[order]
    eigvec = eigvec[:, order]
    # relative floor bounds whitening amplification at 1e5x even if the
    # spectrum underflows; a no-op for healthy spectra (disabled in strict)
    eigval = floor(eigval)
    P = np.diag(1.0 / np.sqrt(eigval)) @ eigvec.T
    return m, P


def whiten_learn(
    X: np.ndarray, qidxs: np.ndarray, pidxs: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Supervised (Lw) whitening from matching pairs.

    ``X [N, D]`` descriptors; ``qidxs``/``pidxs`` index matching rows.
    Returns ``(m [D], P [D, D])`` — or ``P [r, D]`` in the dual regime
    below.

    When ``N < D`` the reference math is degenerate AND intractable: the
    pair-difference covariance has rank <= npairs but is regularized to
    full rank, so ``cholesky``/``eigh`` run O(D^3) on a [D, D] matrix —
    for NetVLAD's D = 32768 that is ~hours and an 8.6 GB buffer on this
    host (a netvlad training run wedged here for 25+ minutes in round 5).
    In that regime the computation drops to the rank-r row space of the
    centered data (SVD, O(N^2 D)): identical cirtorch Lw algebra on the
    span coordinates, returning ``P [r, D]``. Out-of-span directions carry
    no training data — the primal would amplify them by eps^-1/2 = 1e6
    into pure noise — so the span-reduced transform is the only meaningful
    part of the primal answer, as with ``pca_whiten_learn``'s dual path.
    """
    X = np.asarray(X, dtype=np.float64)
    N, D = X.shape
    m = X[qidxs].mean(axis=0)
    if N < D:
        logging.getLogger(__name__).warning(
            "whiten_learn: N=%d < D=%d — span-reduced (dual) Lw engaged; "
            "P is [%d, D] (deviates from the reference's [D, D] with its "
            "1e6x out-of-span noise amplification)", N, D, min(N, D),
        )
        Xc = X - m
        _, sv, Vt = np.linalg.svd(Xc, full_matrices=False)
        r = max(int((sv > max(sv[0], 0.0) * 1e-12).sum()), 1)
        Vt = Vt[:r]                     # [r, D] orthonormal span basis
        Z = Xc @ Vt.T                   # [N, r] span coordinates
        df = (Z[qidxs] - Z[pidxs]).T    # [r, npairs]
        S = df @ df.T / df.shape[1]
        S = S + 1e-12 * np.eye(r)
        P1 = np.linalg.inv(np.linalg.cholesky(S))
        dfp = P1 @ Z.T                  # [r, N]
        eigval, eigvec = np.linalg.eigh(dfp @ dfp.T)
        order = np.argsort(eigval)[::-1]
        return m, (eigvec[:, order].T @ P1) @ Vt
    df = (X[qidxs] - X[pidxs]).T  # [D, npairs]
    S = df @ df.T / df.shape[1]
    S = S + 1e-12 * np.eye(S.shape[0])
    P = np.linalg.inv(np.linalg.cholesky(S))
    dfp = P @ (X - m).T  # [D, N]
    Dcov = dfp @ dfp.T
    eigval, eigvec = np.linalg.eigh(Dcov)
    order = np.argsort(eigval)[::-1]
    eigvec = eigvec[:, order]
    P = eigvec.T @ P
    return m, P


def whiten_apply(
    X: jnp.ndarray,
    m: jnp.ndarray,
    P: jnp.ndarray,
    dims: Optional[int] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Apply whitening to ``X [N, D]``: ``L2N((X - m) @ P[:dims].T)``.

    jit-able; equivalent to the reference's column-major
    ``l2n(P[:dims] @ (x - m))``.
    """
    if dims is None:
        dims = P.shape[0]
    # HIGHEST precision: TPU matmuls default to bf16-ish passes, which put
    # ~5e-4 absolute error on whitened unit-norm descriptors (measured on
    # hardware round 5) — enough to flip near-tie ranks vs the reference's
    # f32 math. This matmul is small (queries) or one-time (gallery build),
    # so full precision costs nothing that matters.
    import jax

    Xw = jnp.matmul(X - m[None, :], P[:dims].T,
                    precision=jax.lax.Precision.HIGHEST)
    norm = jnp.sqrt(jnp.sum(jnp.square(Xw), axis=1, keepdims=True))
    return Xw / (norm + eps)
