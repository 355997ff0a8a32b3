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

Layout: the production entry point is `five_point_candidates_batched`,
which runs the whole pipeline in structure-of-arrays form with the
SAMPLE axis minor-most. TPU tiles the two minor dims of every buffer as
(8 sublanes, 128 lanes); per-sample matrices like the (10, 20) constraint
system or the (10,) root vector pad those tiles to ~10% (or 8%)
occupancy when the sample axis leads, and every buffer XLA materializes
between fusions pays that waste in HBM traffic. With samples on the lane
axis the same buffers are ~full tiles. Measured on v5e at the production
batch (2304 samples): the polynomial pipeline drops ~4x
(tools/profile_5pt_micro.py). The per-sample `five_point_candidates` is
a thin wrapper over the batched form.
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
# Structure-of-arrays pipeline: sample axis minor-most (see module docstring)
# ---------------------------------------------------------------------------

def _soa_nullspace(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """SoA nullspace: x1/x2 (..., n, 5, 2) -> basis (..., 4, 9, n).

    Same 5 unrolled Householder reflections as `_nullspace_basis`, with
    every intermediate carrying the sample axis last so buffers tile as
    (small, n) instead of (n, small).
    """
    dtype = x1.dtype
    u1 = jnp.swapaxes(x1[..., 0], -1, -2)     # (..., 5, n)
    v1 = jnp.swapaxes(x1[..., 1], -1, -2)
    u2 = jnp.swapaxes(x2[..., 0], -1, -2)
    v2 = jnp.swapaxes(x2[..., 1], -1, -2)
    one = jnp.ones_like(u1)
    # M[m, c, n] = monomial m of correspondence c (the 9x5 system A^T)
    M = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-3
    )                                          # (..., 9, 5, n)
    rows9 = jnp.arange(9)[:, None]             # (9, 1) broadcasts over n

    vs = []
    for k in range(5):
        x = jnp.where(rows9 >= k, M[..., :, k, :], 0.0)      # (..., 9, n)
        xk = x[..., k, :]                                     # (..., n)
        nrm = jnp.sqrt(jnp.sum(x * x, axis=-2))               # (..., n)
        sign = jnp.where(xk >= 0, 1.0, -1.0).astype(dtype)
        v = x + (sign * nrm)[..., None, :] * (rows9 == k).astype(dtype)
        vnorm2 = jnp.maximum(jnp.sum(v * v, axis=-2),
                             jnp.asarray(1e-30, dtype))       # (..., n)
        vM = jnp.sum(v[..., :, None, :] * M, axis=-3)         # (..., 5, n)
        M = M - (2.0 / vnorm2)[..., None, None, :] \
            * v[..., :, None, :] * vM[..., None, :, :]
        vs.append((v, vnorm2))

    # basis_j = H1 ... H5 e_{5+j}; (9, 4, 1) seed broadcasts up to (..., 9, 4, n)
    B = (rows9[:, :, None] == jnp.arange(5, 9)[None, :, None]).astype(dtype)
    for v, vnorm2 in reversed(vs):
        vB = jnp.sum(v[..., :, None, :] * B, axis=-3)         # (..., 4, n)
        B = B - (2.0 / vnorm2)[..., None, None, :] \
            * v[..., :, None, :] * vB[..., None, :, :]
    return jnp.swapaxes(B, -3, -2)             # (..., 4, 9, n)


def _soa_mul(p: jax.Array, q: jax.Array, table: np.ndarray) -> jax.Array:
    """SoA polynomial product: (..., a, n) x (..., b, n) -[table]-> (..., t, n)."""
    P = p[..., :, None, :] * q[..., None, :, :]          # (..., a, b, n)
    a, b, t = table.shape
    Pr = P.reshape(*P.shape[:-3], a * b, P.shape[-1])
    Tr = jnp.asarray(table.reshape(a * b, t), dtype=p.dtype)
    return jnp.einsum("st,...sn->...tn", Tr, Pr)


def _soa_constraint_matrix(basis: jax.Array) -> jax.Array:
    """SoA constraint system: basis (..., 4, 9, n) -> A (..., 10, 20, n)."""
    dtype = basis.dtype
    n = basis.shape[-1]
    # Ep[i, j, a, n] = coefficient of w_a in E_ij
    Ep = jnp.moveaxis(
        basis.reshape(*basis.shape[:-2], 3, 3, n), -4, -2
    )                                          # (..., 3, 3, 4, n)

    # P[i, j, a, b, n] = sum_k Ep[i,k,a] Ep[j,k,b]
    P = jnp.sum(
        Ep[..., :, None, :, :, None, :] * Ep[..., None, :, :, None, :, :],
        axis=-4,
    )                                          # (..., 3, 3, 4, 4, n)
    T11 = jnp.asarray(_T11.reshape(16, 10), dtype)
    EEt = jnp.einsum(
        "st,...sn->...tn", T11,
        P.reshape(*P.shape[:-3], 16, n),
    )                                          # (..., 3, 3, 10, n)
    tr = EEt[..., 0, 0, :, :] + EEt[..., 1, 1, :, :] + EEt[..., 2, 2, :, :]

    # Q[i, j, t, a, n] = sum_k EEt[i,k,t] Ep[k,j,a]
    Q = jnp.sum(
        EEt[..., :, :, None, :, None, :] * Ep[..., None, :, :, None, :, :],
        axis=-5,
    )                                          # (..., 3, 3, 10, 4, n)
    T21 = jnp.asarray(_T21.reshape(40, 20), dtype)
    EEtE = jnp.einsum(
        "st,...sn->...tn", T21, Q.reshape(*Q.shape[:-3], 40, n)
    )                                          # (..., 3, 3, 20, n)
    # trE[i, j, t, n] = sum over (deg2 s, deg1 a) tr[s] Ep[i,j,a] T21[s,a,t]
    trE = _soa_mul(
        jnp.broadcast_to(tr[..., None, None, :, :],
                         (*tr.shape[:-2], 3, 3, 10, tr.shape[-1])
                         ).reshape(*tr.shape[:-2], 9, 10, tr.shape[-1]),
        Ep.reshape(*Ep.shape[:-4], 9, 4, n),
        _T21,
    ).reshape(*tr.shape[:-2], 3, 3, 20, n)
    C = 2.0 * EEtE - trE                       # (..., 3, 3, 20, n)

    # det(E): cofactor expansion along row 0 (all SoA products)
    def e(i, j):
        return Ep[..., i, j, :, :]             # (..., 4, n)

    m00 = _soa_mul(e(1, 1), e(2, 2), _T11) - _soa_mul(e(1, 2), e(2, 1), _T11)
    m01 = _soa_mul(e(1, 0), e(2, 2), _T11) - _soa_mul(e(1, 2), e(2, 0), _T11)
    m02 = _soa_mul(e(1, 0), e(2, 1), _T11) - _soa_mul(e(1, 1), e(2, 0), _T11)
    det = (
        _soa_mul(m00, e(0, 0), _T21)
        - _soa_mul(m01, e(0, 1), _T21)
        + _soa_mul(m02, e(0, 2), _T21)
    )                                          # (..., 20, n)

    return jnp.concatenate(
        [det[..., None, :, :], C.reshape(*C.shape[:-4], 9, 20, n)], axis=-3
    )                                          # (..., 10, 20, n)


def _soa_gauss_jordan(A: jax.Array) -> jax.Array:
    """SoA Gauss-Jordan with partial pivoting: (..., 10, 20, n) -> [I | M]."""
    m = A.shape[-3]
    rows = jnp.arange(m)[:, None]              # (m, 1)
    for i in range(m):
        col = A[..., :, i, :]                                  # (..., m, n)
        cand = jnp.where(rows >= i, jnp.abs(col), -1.0)
        p = jnp.argmax(cand, axis=-2)                          # (..., n)
        ei = (rows == i).astype(A.dtype)                       # (m, 1)
        ep = (rows == p[..., None, :]).astype(A.dtype)         # (..., m, n)
        Ai = A[..., i, :, :]                                   # (..., 20, n)
        Ap = jnp.sum(ep[..., :, None, :] * A, axis=-3)         # (..., 20, n)
        # swap rows i and p
        A = (A + ei[..., :, None] * (Ap - Ai)[..., None, :, :]
             + ep[..., :, None, :] * (Ai - Ap)[..., None, :, :])
        piv = Ap[..., i, :]                                    # (..., n)
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        Anew_i = Ap / safe[..., None, :]                       # (..., 20, n)
        A = (A * (1.0 - ei[..., :, None])
             + ei[..., :, None] * Anew_i[..., None, :, :])
        factors = jnp.where(rows == i, 0.0, A[..., :, i, :])   # (..., m, n)
        A = A - factors[..., :, None, :] * Anew_i[..., None, :, :]
    return A


def _soa_conv(p: jax.Array, q: jax.Array) -> jax.Array:
    """SoA full convolution over axis -2: (.., lp, n) x (.., lq, n) -> (.., lp+lq-1, n)."""
    lp, lq = p.shape[-2], q.shape[-2]
    P = p[..., :, None, :] * q[..., None, :, :]          # (..., lp, lq, n)
    S = np.zeros((lp * lq, lp + lq - 1), dtype=np.float32)
    for i in range(lp):
        for j in range(lq):
            S[i * lq + j, i + j] = 1.0
    Pr = P.reshape(*P.shape[:-3], lp * lq, P.shape[-1])
    return jnp.einsum("st,...sn->...tn", jnp.asarray(S, p.dtype), Pr)


def _soa_action_det(M: jax.Array):
    """SoA steps 3b-3c: M (..., 10, 10, n) tail -> (Bx, By, B1, detpoly).

    Bx/By: (..., 3, 4, n); B1: (..., 3, 5, n); det: (..., 11, n) descending.
    """
    def row(r):
        return M[..., r, :, :]                 # (..., 10, n)

    Bx, By, B1 = [], [], []
    for ra, rb in ((4, 7), (5, 8), (6, 9)):
        a, b = row(ra), row(rb)
        Bx.append(jnp.stack(
            [-b[..., 0, :], a[..., 0, :] - b[..., 1, :],
             a[..., 1, :] - b[..., 2, :], a[..., 2, :]], axis=-2))
        By.append(jnp.stack(
            [-b[..., 3, :], a[..., 3, :] - b[..., 4, :],
             a[..., 4, :] - b[..., 5, :], a[..., 5, :]], axis=-2))
        B1.append(jnp.stack(
            [-b[..., 6, :], a[..., 6, :] - b[..., 7, :],
             a[..., 7, :] - b[..., 8, :], a[..., 8, :] - b[..., 9, :],
             a[..., 9, :]], axis=-2))
    Bx = jnp.stack(Bx, axis=-3)                # (..., 3, 4, n)
    By = jnp.stack(By, axis=-3)
    B1 = jnp.stack(B1, axis=-3)                # (..., 3, 5, n)

    # det expansion along the constant column, batched over the 3 cofactors:
    # minors_k = conv(x_i, y_j) - conv(y_i, x_j) for (i,j) = (1,2),(0,2),(0,1)
    xi = Bx[..., (1, 0, 0), :, :]
    yj = By[..., (2, 2, 1), :, :]
    yi = By[..., (1, 0, 0), :, :]
    xj = Bx[..., (2, 2, 1), :, :]
    minors = _soa_conv(xi, yj) - _soa_conv(yi, xj)       # (..., 3, 7, n)
    d = _soa_conv(B1, minors)                            # (..., 3, 11, n)
    det = d[..., 0, :, :] - d[..., 1, :, :] + d[..., 2, :, :]
    return Bx, By, B1, det


def _soa_poly_roots(coeffs: jax.Array, iters: int = 100,
                    method: str = "aberth"):
    """SoA simultaneous root iteration: coeffs (..., 11, n) descending ->
    (roots (..., 10, n) complex, lead_ok (..., n)). Sample axis minor-most.

    method="aberth" (default): Aberth-Ehrlich — Newton steps coupled by
    the pairwise repulsion term, cubically convergent for simple roots.
    At the production budget it reaches the 100-iteration Durand-Kerner
    fixed point in ~24 iterations (tools/dk_iters_diag.py: candidate-set
    agreement >=99.9% at 24 vs DK-100, vs 94% for DK-40 itself) — the
    root solve was ~half the hypothesize stage at DK-100.
    method="dk": classic Durand-Kerner (Weierstrass), linear-ish
    convergence, kept as the reference iteration."""
    deg = coeffs.shape[-2] - 1
    lead = coeffs[..., 0, :]
    lead_ok = jnp.abs(lead) > 1e-25
    c = coeffs / jnp.where(lead_ok, lead, 1.0)[..., None, :]

    tail = jnp.abs(c[..., -1, :])                         # (..., n)
    s = jnp.where(tail > 1e-30, tail ** (1.0 / deg), 1.0)
    powers = s[..., None, :] ** jnp.arange(deg, -1, -1,
                                           dtype=c.dtype)[:, None]
    cb = c * powers / jnp.where(tail > 1e-30, tail, 1.0)[..., None, :]

    cdtype = jnp.complex128 if c.dtype == jnp.float64 else jnp.complex64
    radius = 1.0 + jnp.max(jnp.abs(cb[..., 1:, :]), axis=-2) ** (1.0 / deg)
    angles = 2.0 * np.pi * np.arange(deg) / deg + 0.7
    ring = jnp.asarray(np.exp(1j * angles), dtype=cdtype)[:, None]
    u0 = radius[..., None, :].astype(cdtype) * ring      # (..., 10, n)
    cc = cb.astype(cdtype)

    eye = jnp.eye(deg, dtype=cdtype)[:, :, None]          # (10, 10, 1)

    def horner(u):
        acc = jnp.broadcast_to(cc[..., 0, None, :], u.shape).astype(cdtype)
        for k in range(1, deg + 1):
            acc = acc * u + cc[..., k, None, :]
        return acc

    def horner_d(u):
        dcc = cc[..., :-1, :] * jnp.arange(
            deg, 0, -1, dtype=cb.dtype)[:, None].astype(cdtype)
        acc = jnp.broadcast_to(dcc[..., 0, None, :], u.shape).astype(cdtype)
        for k in range(1, deg):
            acc = acc * u + dcc[..., k, None, :]
        return acc

    def body_dk(_, u):
        pu = horner(u)
        diff = (u[..., :, None, :] - u[..., None, :, :]) * (1.0 - eye) + eye
        denom = jnp.prod(diff, axis=-2)
        denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        step = pu / denom
        mag = jnp.abs(step)
        step = jnp.where(mag > 10.0, step * (10.0 / mag), step)
        return u - step

    def body_aberth(_, u):
        pu = horner(u)
        dpu = horner_d(u)
        dpu = jnp.where(jnp.abs(dpu) > 1e-30, dpu, 1e-30)
        newton = pu / dpu
        diff = (u[..., :, None, :] - u[..., None, :, :]) * (1.0 - eye) + eye
        inv = jnp.where(jnp.abs(diff) > 1e-30, 1.0 / diff, 0.0) * (1.0 - eye)
        rep = jnp.sum(inv, axis=-2)
        denom = 1.0 - newton * rep
        denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        step = newton / denom
        mag = jnp.abs(step)
        step = jnp.where(mag > 10.0, step * (10.0 / mag), step)
        return u - step

    body = body_aberth if method == "aberth" else body_dk
    u = jax.lax.fori_loop(0, iters, body, u0)
    return u * s[..., None, :].astype(cdtype), lead_ok


def _soa_polyval(coeffs: jax.Array, x: jax.Array) -> jax.Array:
    """Horner over axis -2 of coeffs (..., d+1, n) at x (..., 10, n)."""
    acc = jnp.broadcast_to(coeffs[..., 0, None, :], x.shape).astype(x.dtype)
    for k in range(1, coeffs.shape[-2]):
        acc = acc * x + coeffs[..., k, None, :]
    return acc


def five_point_candidates_batched(x1: jax.Array, x2: jax.Array,
                                  dk_iters: int = 24,
                                  root_method: str = "aberth"):
    """Batched essential-matrix candidates (the production SoA path).

    Args:
      x1, x2: (..., n, 5, 2) normalized camera coordinates, n samples.
      dk_iters: simultaneous-iteration budget (static). Non-converged
        roots fail the backward-error filter and surface as invalid
        slots. The default pairs with Aberth-Ehrlich's cubic
        convergence; use >=100 for method="dk".
      root_method: "aberth" (default) or "dk" — see _soa_poly_roots.
    Returns:
      Es: (..., n, 10, 3, 3) candidates (Frobenius-normalized).
      valid: (..., n, 10) bool — slots holding a genuine real-root solution.
    """
    dtype = x1.dtype
    basis = _soa_nullspace(x1, x2)             # (..., 4, 9, n)
    A = _soa_constraint_matrix(basis)          # (..., 10, 20, n)
    scale = jnp.max(jnp.abs(A), axis=-2, keepdims=True)
    A = A / jnp.maximum(scale, 1e-30)
    Ared = _soa_gauss_jordan(A)
    Bx, By, B1, p = _soa_action_det(Ared[..., :, 10:, :])   # p (..., 11, n)

    roots_c, lead_ok = _soa_poly_roots(p, iters=dk_iters,
                                       method=root_method)
    z_real = jnp.real(roots_c).astype(dtype)

    dcoeffs = p[..., :-1, :] * jnp.arange(10, 0, -1, dtype=dtype)[:, None]
    z = z_real
    for _ in range(8):                          # Newton polish, real axis
        pv = _soa_polyval(p, z)
        dv = _soa_polyval(dcoeffs, z)
        dv = jnp.where(jnp.abs(dv) > 1e-30, dv, 1e-30)
        z = z - pv / dv

    # scale-invariant backward error |p(z)| / sum |c_i||z|^(deg-i)
    bscale = _soa_polyval(jnp.abs(p), jnp.abs(z))
    resid = jnp.abs(_soa_polyval(p, z)) / jnp.maximum(bscale, 1e-30)
    near_real = jnp.abs(jnp.imag(roots_c)) < 0.1 * (1.0 + jnp.abs(z_real))
    tol = 1e-10 if dtype == jnp.float64 else 1e-4
    valid = (lead_ok[..., None, :] & near_real & (resid < tol)
             & jnp.isfinite(z))                 # (..., 10, n)

    # Back-substitute (x, y): null vector of B(z) from pairwise row crosses.
    # Bx/By (..., 3row, 4, n); B1 (..., 3row, 5, n); evaluate each row's
    # z-polynomials at all 10 roots: zb (..., 3row, 10, n).
    zb = jnp.broadcast_to(z[..., None, :, :],
                          (*z.shape[:-2], 3, 10, z.shape[-1]))
    rx = _soa_polyval(Bx, zb)                   # (..., 3row, 10, n)
    ry = _soa_polyval(By, zb)
    r1p = _soa_polyval(B1, zb)
    rows = jnp.stack([rx, ry, r1p], axis=-4)    # (..., 3comp, 3row, 10, n)

    def cross(a, b):
        return jnp.stack([
            a[..., 1, :, :] * b[..., 2, :, :] - a[..., 2, :, :] * b[..., 1, :, :],
            a[..., 2, :, :] * b[..., 0, :, :] - a[..., 0, :, :] * b[..., 2, :, :],
            a[..., 0, :, :] * b[..., 1, :, :] - a[..., 1, :, :] * b[..., 0, :, :],
        ], axis=-3)                             # (..., 3comp, 10, n)

    r0 = rows[..., :, 0, :, :]
    r1_ = rows[..., :, 1, :, :]
    r2 = rows[..., :, 2, :, :]
    cands = jnp.stack([cross(r0, r1_), cross(r0, r2), cross(r1_, r2)],
                      axis=-4)                  # (..., 3cand, 3comp, 10, n)
    norms = jnp.sqrt(jnp.sum(cands * cands, axis=-3))     # (..., 3cand, 10, n)
    pick = jnp.argmax(norms, axis=-3)                     # (..., 10, n)
    v = jnp.take_along_axis(
        cands, pick[..., None, None, :, :], axis=-4
    )[..., 0, :, :, :]                          # (..., 3comp, 10, n)

    w = v[..., 2, :, :]
    vnorm = jnp.sqrt(jnp.sum(v * v, axis=-3))
    w_ok = jnp.abs(w) > 1e-12 * (vnorm + 1e-30)
    w_safe = jnp.where(jnp.abs(w) > 1e-30, w, 1e-30)
    xs = v[..., 0, :, :] / w_safe               # (..., 10, n)
    ys = v[..., 1, :, :] / w_safe

    # E = x*B0 + y*B1 + z*B2 + B3 over the 9 entries: (..., 9, 10, n)
    b9 = basis[..., :, :, None, :]              # (..., 4, 9, 1, n)
    Es = (xs[..., None, :, :] * b9[..., 0, :, :, :]
          + ys[..., None, :, :] * b9[..., 1, :, :, :]
          + z[..., None, :, :] * b9[..., 2, :, :, :]
          + b9[..., 3, :, :, :])                # (..., 9, 10, n)
    fro = jnp.sqrt(jnp.sum(Es * Es, axis=-3, keepdims=True))
    Es = Es / jnp.maximum(fro, 1e-30)
    finite = jnp.all(jnp.isfinite(Es), axis=-3)           # (..., 10, n)
    valid = valid & w_ok & finite
    Es = jnp.where(jnp.isfinite(Es), Es, 0.0)

    # Back to AoS for the caller: (..., n, 10, 3, 3) / (..., n, 10)
    Es = jnp.moveaxis(jnp.moveaxis(Es, -1, -3), -1, -2)   # (..., n, 10, 9)
    Es = Es.reshape(*Es.shape[:-1], 3, 3)
    valid = jnp.moveaxis(valid, -1, -2)                   # (..., n, 10)
    return Es, valid


# ---------------------------------------------------------------------------
# Step 5: assemble candidates (per-sample wrapper over the SoA pipeline)
# ---------------------------------------------------------------------------

def five_point_candidates(x1: jax.Array, x2: jax.Array):
    """Essential-matrix candidates from 5 normalized correspondences.

    Args:
      x1, x2: (5, 2) normalized camera coordinates.
    Returns:
      Es: (10, 3, 3) candidate essential matrices (Frobenius-normalized).
      valid: (10,) bool — which slots hold a genuine real-root solution.
    """
    Es, valid = five_point_candidates_batched(x1[None], x2[None])
    return Es[0], valid[0]
