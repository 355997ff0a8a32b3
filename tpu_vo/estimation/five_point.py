"""Nister 5-point minimal essential-matrix solver, fully jittable on TPU.

This replaces the solver inside cv::findEssentialMat (the reference invokes
it at visual_odometry.cpp:213-216). The algorithm follows Nister's 2004
formulation, re-engineered for XLA/TPU constraints:

  1. Nullspace of the 5x9 epipolar constraint matrix via symmetric `eigh`
     of A^T A (batched 9x9 eigh is TPU-friendly; no ragged SVD).
  2. E(x,y,z) = x*B0 + y*B1 + z*B2 + B3. The ten cubic constraints
     (det E = 0 and 2*E*E^T*E - tr(E*E^T)*E = 0) are expanded numerically
     over the 20-monomial degree-3 basis using static multiplication
     tables (no symbolic codegen, no hand-copied coefficient formulas).
  3. Gauss-Jordan elimination with partial pivoting (fori_loop +
     dynamic_update — fixed trip count, jittable) reduces the 10x20 system;
     the hidden-variable 3x3 polynomial matrix B(z) is formed and
     det B(z) gives the degree-10 polynomial in z.
  4. Roots via Durand-Kerner simultaneous iteration in complex arithmetic
     (fixed iteration count) + Newton polish on the real axis. TPU has no
     nonsymmetric eigendecomposition, so the classic companion-matrix
     route is out; Durand-Kerner is branch-free and batches perfectly.
  5. Each real root back-substitutes to (x, y) through the null vector of
     B(z), yielding up to 10 essential-matrix candidates with a validity
     mask (fixed output shape (10, 3, 3) — RANSAC scores all slots).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Static monomial bases and multiplication tables (built once with numpy).
# Degree-3 ordering is the Nister ordering: the first ten monomials carry
# x/y degree >= 2 so that after Gauss-Jordan the last ten columns are exactly
# {x,y,1} x {z^k} and the 3x3 polynomial matrix B(z) drops out of rows 4..9.
# ---------------------------------------------------------------------------

_DEG1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]  # x, y, z, 1
_DEG2 = [
    (2, 0, 0), (1, 1, 0), (0, 2, 0), (1, 0, 1), (0, 1, 1),
    (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
]
_DEG3 = [
    # first 10: eliminated by Gauss-Jordan
    (3, 0, 0), (2, 1, 0), (1, 2, 0), (0, 3, 0), (2, 0, 1),
    (1, 1, 1), (0, 2, 1), (2, 0, 0), (1, 1, 0), (0, 2, 0),
    # last 10: x*z^2, x*z, x, y*z^2, y*z, y, z^3, z^2, z, 1
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]


def _mul_table(basis_a, basis_b, basis_out):
    idx = {m: i for i, m in enumerate(basis_out)}
    T = np.zeros((len(basis_a), len(basis_b), len(basis_out)), dtype=np.float32)
    for i, a in enumerate(basis_a):
        for j, b in enumerate(basis_b):
            m = (a[0] + b[0], a[1] + b[1], a[2] + b[2])
            T[i, j, idx[m]] = 1.0
    return T


_T11 = _mul_table(_DEG1, _DEG1, _DEG2)  # (4, 4, 10)
_T21 = _mul_table(_DEG2, _DEG1, _DEG3)  # (10, 4, 20)


def _mul11(p: jax.Array, q: jax.Array) -> jax.Array:
    """(.., 4) x (.., 4) -> (.., 10) polynomial product."""
    return jnp.einsum("...a,...b,abt->...t", p, q,
                      jnp.asarray(_T11, dtype=p.dtype))


def _mul21(p: jax.Array, q: jax.Array) -> jax.Array:
    """(.., 10) x (.., 4) -> (.., 20) polynomial product."""
    return jnp.einsum("...a,...b,abt->...t", p, q,
                      jnp.asarray(_T21, dtype=p.dtype))


# ---------------------------------------------------------------------------
# Steps 1-2: nullspace basis and the 10x20 constraint matrix
# ---------------------------------------------------------------------------

def _nullspace_basis(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """4-dim nullspace of the 5x9 epipolar system, as (4, 3, 3) matrices.

    Computed by 5 unrolled Householder reflections on A^T (9x5) — the
    orthogonal complement of A's row space is spanned by Q e_5..e_8, i.e.
    the last 4 identity columns pushed back through the reflectors. All
    branch-free vector math: profiling showed the previous batched 9x9
    `eigh` (iterative, LAPACK-style) alone cost 3.2 ms/pair on v5e — 75%
    of the whole RANSAC stage. Any orthonormal basis of the same subspace
    is equivalent downstream (the solver re-parameterizes over the basis).
    """
    dtype = x1.dtype
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )  # (5, 9)
    M = A.T                                   # (9, 5)
    rows = jnp.arange(9)

    vs = []
    for k in range(5):
        x = jnp.where(rows >= k, M[:, k], 0.0)          # active part
        xk = x[k]
        nrm = jnp.sqrt(jnp.sum(x * x))
        sign = jnp.where(xk >= 0, 1.0, -1.0).astype(dtype)
        v = x + sign * nrm * (rows == k).astype(dtype)
        vnorm2 = jnp.maximum(jnp.sum(v * v), jnp.asarray(1e-30, dtype))
        M = M - (2.0 / vnorm2) * jnp.outer(v, v @ M)
        vs.append((v, vnorm2))

    # basis_j = H1 ... H5 e_{5+j}  (apply reflectors in reverse order)
    B = (rows[:, None] == jnp.arange(5, 9)[None, :]).astype(dtype)  # (9, 4)
    for v, vnorm2 in reversed(vs):
        B = B - (2.0 / vnorm2) * jnp.outer(v, v @ B)
    return B.T.reshape(4, 3, 3)


def _constraint_matrix(basis: jax.Array) -> jax.Array:
    """The 10 cubic constraints on E(x,y,z) as a (10, 20) coefficient matrix."""
    # E entries as degree-1 polynomials over [x, y, z, 1]: (3, 3, 4)
    Ep = jnp.moveaxis(basis, 0, -1)

    # EE^T (degree 2): (3, 3, 10)
    EEt = jnp.einsum("ika,jkb,abt->ijt", Ep, Ep, jnp.asarray(_T11, Ep.dtype))
    tr = EEt[0, 0] + EEt[1, 1] + EEt[2, 2]  # (10,)

    # 2*EE^T*E - tr(EE^T)*E (degree 3): (3, 3, 20)
    T21 = jnp.asarray(_T21, Ep.dtype)
    EEtE = jnp.einsum("ikt,kja,tab->ijb", EEt, Ep, T21)
    trE = jnp.einsum("t,ija,tab->ijb", tr, Ep, T21)
    C = 2.0 * EEtE - trE  # (3, 3, 20)

    # det(E) (degree 3): cofactor expansion along row 0
    m00 = _mul11(Ep[1, 1], Ep[2, 2]) - _mul11(Ep[1, 2], Ep[2, 1])
    m01 = _mul11(Ep[1, 0], Ep[2, 2]) - _mul11(Ep[1, 2], Ep[2, 0])
    m02 = _mul11(Ep[1, 0], Ep[2, 1]) - _mul11(Ep[1, 1], Ep[2, 0])
    det = _mul21(m00, Ep[0, 0]) - _mul21(m01, Ep[0, 1]) + _mul21(m02, Ep[0, 2])

    return jnp.concatenate([det[None, :], C.reshape(9, 20)], axis=0)


# ---------------------------------------------------------------------------
# Step 3: Gauss-Jordan + hidden-variable polynomial determinant
# ---------------------------------------------------------------------------

def _gauss_jordan(A: jax.Array) -> jax.Array:
    """Reduce (10, 20) to [I | M] with partial pivoting; jittable.

    Unrolled (n=10 is static) and scatter-free: row swap / pivot divide /
    elimination are expressed as masked broadcasts. The previous fori_loop
    with .at[].set() row scatters cost ~1 ms/pair batched on v5e; this
    form fuses to a short chain of elementwise ops.
    """
    n = A.shape[0]
    rows = jnp.arange(n)
    for i in range(n):
        col = A[:, i]
        cand = jnp.where(rows >= i, jnp.abs(col), -1.0)
        p = jnp.argmax(cand)
        ei = (rows == i).astype(A.dtype)[:, None]
        ep = (rows == p).astype(A.dtype)[:, None]
        Ai = A[i]
        Ap = (ep * A).sum(axis=0)
        # swap rows i and p
        A = A + ei * (Ap - Ai)[None, :] + ep * (Ai - Ap)[None, :]
        piv = Ap[i]
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        Anew_i = Ap / safe
        A = A * (1.0 - ei) + ei * Anew_i[None, :]
        factors = jnp.where(rows == i, 0.0, A[:, i])
        A = A - factors[:, None] * Anew_i[None, :]
    return A


def _action_polynomials(M: jax.Array):
    """Build B(z) from the reduced tail M = A_reduced[:, 10:] (10, 10).

    Rows (4,5,6) have pivots (x^2 z, x y z, y^2 z); rows (7,8,9) have pivots
    (x^2, x y, y^2). k_r = row(r) - z*row(r+3) eliminates the quadratic
    monomials, leaving 3 equations linear in (x, y, 1) with z-polynomial
    coefficients: Bx (deg 3), By (deg 3), B1 (deg 4), all descending.
    """
    def row_pair(ra, rb):
        a = M[ra]
        b = M[rb]
        Bx = jnp.stack([-b[0], a[0] - b[1], a[1] - b[2], a[2]])
        By = jnp.stack([-b[3], a[3] - b[4], a[4] - b[5], a[5]])
        B1 = jnp.stack([-b[6], a[6] - b[7], a[7] - b[8], a[8] - b[9], a[9]])
        return Bx, By, B1

    return [row_pair(4, 7), row_pair(5, 8), row_pair(6, 9)]


def _conv(p: jax.Array, q: jax.Array) -> jax.Array:
    return jnp.convolve(p, q)


def _det_poly(B) -> jax.Array:
    """det of the 3x3 polynomial matrix -> degree-10 poly (11 coeffs, desc)."""
    (x0, y0, c0), (x1, y1, c1), (x2, y2, c2) = B
    # Expansion along the constant column (degree-4 entries).
    d0 = _conv(c0, _conv(x1, y2) - _conv(y1, x2))
    d1 = _conv(c1, _conv(x0, y2) - _conv(y0, x2))
    d2 = _conv(c2, _conv(x0, y1) - _conv(y0, x1))
    return d0 - d1 + d2  # (11,)


# ---------------------------------------------------------------------------
# Step 4: branch-free root finding
# ---------------------------------------------------------------------------

def _poly_roots(coeffs: jax.Array, iters: int = 100):
    """All 10 roots of a degree-10 polynomial via Durand-Kerner.

    Returns (roots_complex (10,), lead_ok ()). The polynomial is balanced by
    the variable substitution z = s*u with s chosen to equalize the leading
    and trailing coefficient magnitudes — critical for float32, where the
    raw coefficients span many orders of magnitude. Fixed iteration count;
    convergence is validated downstream by a backward-error filter and
    ultimately by RANSAC hypothesis scoring.
    """
    n = coeffs.shape[0] - 1
    lead = coeffs[0]
    lead_ok = jnp.abs(lead) > 1e-25
    c = coeffs / jnp.where(lead_ok, lead, 1.0)

    # Balance: scale roots so the constant term has unit magnitude.
    tail = jnp.abs(c[-1])
    s = jnp.where(tail > 1e-30, tail ** (1.0 / n), 1.0)
    powers = s ** jnp.arange(n, -1, -1, dtype=c.dtype)
    cb = c * powers / jnp.where(tail > 1e-30, tail, 1.0)

    cdtype = jnp.complex128 if c.dtype == jnp.float64 else jnp.complex64
    radius = 1.0 + jnp.max(jnp.abs(cb[1:])) ** (1.0 / n)
    angles = 2.0 * np.pi * np.arange(n) / n + 0.7
    u0 = radius.astype(cdtype) * jnp.exp(
        1j * jnp.asarray(angles, dtype=cdtype)
    )
    cc = cb.astype(cdtype)

    eye = jnp.eye(n, dtype=cdtype)

    def body(_, u):
        pu = jnp.polyval(cc, u)
        # diagonal forced to 1 via masked add (no per-iteration scatter)
        diff = (u[:, None] - u[None, :]) * (1.0 - eye) + eye
        denom = jnp.prod(diff, axis=1)
        denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        step = pu / denom
        # Damp absurd steps so one bad iterate can't fling the whole set.
        mag = jnp.abs(step)
        step = jnp.where(mag > 10.0, step * (10.0 / mag), step)
        return u - step

    u = jax.lax.fori_loop(0, iters, body, u0)
    return u * s.astype(cdtype), lead_ok


def _poly_backward_error(coeffs: jax.Array, z: jax.Array) -> jax.Array:
    """|p(z)| / sum_i |c_i| |z|^(n-i): scale-invariant root residual."""
    n = coeffs.shape[0] - 1
    zmag = jnp.abs(z)
    scale = jnp.polyval(jnp.abs(coeffs), zmag)
    return jnp.abs(jnp.polyval(coeffs, z)) / jnp.maximum(scale, 1e-30)


def _newton_real(coeffs: jax.Array, x0: jax.Array, iters: int = 8):
    """Polish real roots with Newton iterations on the real axis."""
    dcoeffs = coeffs[:-1] * jnp.arange(coeffs.shape[0] - 1, 0, -1,
                                       dtype=coeffs.dtype)

    def body(_, x):
        p = jnp.polyval(coeffs, x)
        d = jnp.polyval(dcoeffs, x)
        d = jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
        return x - p / d

    return jax.lax.fori_loop(0, iters, body, x0)


# ---------------------------------------------------------------------------
# Step 5: assemble candidates
# ---------------------------------------------------------------------------

def five_point_candidates(x1: jax.Array, x2: jax.Array):
    """Essential-matrix candidates from 5 normalized correspondences.

    Args:
      x1, x2: (5, 2) normalized camera coordinates.
    Returns:
      Es: (10, 3, 3) candidate essential matrices (Frobenius-normalized).
      valid: (10,) bool — which slots hold a genuine real-root solution.
    """
    dtype = x1.dtype
    basis = _nullspace_basis(x1, x2)          # (4, 3, 3)
    A = _constraint_matrix(basis)             # (10, 20)
    # Row-scale for conditioning before elimination.
    scale = jnp.max(jnp.abs(A), axis=1, keepdims=True)
    A = A / jnp.maximum(scale, 1e-30)
    Ared = _gauss_jordan(A)
    B = _action_polynomials(Ared[:, 10:])
    p = _det_poly(B)                          # (11,) descending

    roots_c, lead_ok = _poly_roots(p)
    z_real = jnp.real(roots_c).astype(dtype)
    z = _newton_real(p, z_real)

    # A slot is valid if the polished real value is actually a root
    # (scale-invariant backward error) and the complex root was near-real.
    resid = _poly_backward_error(p, z)
    near_real = jnp.abs(jnp.imag(roots_c)) < 0.1 * (1.0 + jnp.abs(z_real))
    tol = 1e-10 if dtype == jnp.float64 else 1e-4
    valid = lead_ok & near_real & (resid < tol) & jnp.isfinite(z)

    # Back-substitute (x, y) from the null vector of B(z) per root.
    def eval_row(Br, z):
        Bx, By, B1 = Br
        return jnp.stack([
            jnp.polyval(Bx.astype(dtype), z),
            jnp.polyval(By.astype(dtype), z),
            jnp.polyval(B1.astype(dtype), z),
        ], axis=-1)  # (..., 3)

    rows = [eval_row(Br, z) for Br in B]      # 3 x (10, 3)
    v01 = jnp.cross(rows[0], rows[1])
    v02 = jnp.cross(rows[0], rows[2])
    v12 = jnp.cross(rows[1], rows[2])
    cands = jnp.stack([v01, v02, v12], axis=0)            # (3, 10, 3)
    norms = jnp.linalg.norm(cands, axis=-1)               # (3, 10)
    pick = jnp.argmax(norms, axis=0)                      # (10,)
    v = jnp.take_along_axis(cands, pick[None, :, None], axis=0)[0]  # (10, 3)

    w = v[:, 2]
    w_ok = jnp.abs(w) > 1e-12 * (jnp.linalg.norm(v, axis=1) + 1e-30)
    w_safe = jnp.where(jnp.abs(w) > 1e-30, w, 1e-30)
    xs = v[:, 0] / w_safe
    ys = v[:, 1] / w_safe

    Es = (
        xs[:, None, None] * basis[0]
        + ys[:, None, None] * basis[1]
        + z[:, None, None] * basis[2]
        + basis[3]
    )
    fro = jnp.linalg.norm(Es, axis=(-2, -1), keepdims=True)
    Es = Es / jnp.maximum(fro, 1e-30)
    valid = valid & w_ok & jnp.all(jnp.isfinite(Es), axis=(-2, -1))
    Es = jnp.where(jnp.isfinite(Es), Es, 0.0)
    return Es, valid
