"""Matrix-free operator application and Dirichlet constraint handling.

The global system is applied as gather -> batched element matvec ->
scatter-add; this replaces the reference's distributed Trilinos
BlockSparseMatrix SpMV + ghost exchange (reference: NavierStokes.cpp:255-273
and the Epetra compress at 527-528).  On a device mesh the element arrays are
sharded along the element axis and the scatter-add produces partial sums that
XLA combines with a psum over ICI — the SPMD analog of
``compress(VectorOperation::add)``.

Dirichlet conditions are imposed by algebraic elimination at the operator
level (the matrix-free equivalent of deal.II AffineConstraints'
``distribute_local_to_global``, reference: NavierStokes.cpp:514-523):

    A_hat x = P A P x + (I - P) x           (P zeroes constrained dofs)
    b_hat   = P (b - A g) + g               (g holds boundary values)

so the solution of ``A_hat x = b_hat`` carries the exact boundary values.
"""

from __future__ import annotations

import jax.numpy as jnp

from .fe_arrays import FEArrays


def scatter_add(fe: FEArrays, y_e, n_dofs=None):
    """(n_el, nd) element contributions -> global vector.

    Single-chip path: transpose-map gather + sum (XLA scatters with
    duplicate indices serialize on TPU — ~100x slower than this).  Sharded
    path: scatter-add of the local shard, combined by an XLA all-reduce
    (the SPMD ``compress(add)``).
    """
    n = fe.n_dofs if n_dofs is None else n_dofs
    if n_dofs is None:
        return fe.accumulate(y_e)
    return jnp.zeros((n,), y_e.dtype).at[fe.elem_dofs].add(y_e)


def apply_element_matrices(fe: FEArrays, A_e, x):
    """y = A x, matrix-free through per-element dense blocks."""
    x_e = x[fe.elem_dofs]  # (n_el, nd)
    y_e = jnp.einsum("eij,ej->ei", A_e, x_e)
    return scatter_add(fe, y_e)


def make_constrained_operator(fe: FEArrays, A_e, mask):
    """Return apply(x) for A_hat (identity on constrained dofs).

    mask: (n_dofs,) bool, True on Dirichlet-constrained dofs.
    """
    return constrain_operator(lambda v: apply_element_matrices(fe, A_e, v), mask)


def constrain_operator(apply_raw, mask):
    """Wrap any raw operator as A_hat = P A P + (I - P)."""

    def apply(x):
        x_free = jnp.where(mask, 0.0, x)
        y = apply_raw(x_free)
        return jnp.where(mask, x, y)

    return apply


def row_constrain_operator(apply_raw, mask):
    """Row-only constrained operator A_row = P A + (I - P).

    With a warm start carrying the boundary values g on the constrained
    rows, the initial FGMRES residual r0 = P(b - A x0) already contains the
    constraint correction -A g — so the separate ``constrained_rhs``
    operator application is not needed.  All later Krylov vectors have zero
    constrained rows (P A v does), on which A_row coincides with A_hat.
    """

    def apply(x):
        return jnp.where(mask, x, apply_raw(x))

    return apply


def constrained_rhs(fe: FEArrays, A_e, b, mask, g, apply_raw=None):
    """b_hat = P (b - A g) + g with g the boundary-value vector."""
    if apply_raw is None:
        apply_raw = lambda v: apply_element_matrices(fe, A_e, v)
    g_only = jnp.where(mask, g, 0.0)
    correction = apply_raw(g_only)
    return jnp.where(mask, g, b - correction)


def extract_diagonal(fe: FEArrays, A_e, mask=None):
    """Global diagonal of A (used by Jacobi/Chebyshev preconditioning)."""
    diag_e = jnp.diagonal(A_e, axis1=1, axis2=2)  # (n_el, nd)
    d = scatter_add(fe, diag_e)
    if mask is not None:
        d = jnp.where(mask, 1.0, d)
    # Guard padded/never-touched dofs.
    return jnp.where(jnp.abs(d) > 1e-30, d, 1.0)


def velocity_block_apply(fe: FEArrays, A_e, mask, x_u):
    """Apply only the velocity-velocity block A (identity on constrained).

    x_u is a full-length vector whose pressure part is ignored/zeroed.
    """
    x = x_u.at[fe.n_udofs :].set(0.0)
    x_free = jnp.where(mask, 0.0, x)
    y = apply_element_matrices(fe, A_e, x_free)
    y = y.at[fe.n_udofs :].set(0.0)
    return jnp.where(mask, x_u, y)


def divergence_block_apply(fe: FEArrays, A_e, mask, x_u):
    """tmp = B x_u: the pressure rows of A applied to a velocity field.

    The element matrices' pressure rows contain exactly the divergence block
    (plus nothing else: A_pp = 0), matching the reference's use of
    system_matrix.block(1,0) in the preconditioner (NavierStokes.hpp:334).
    Only the velocity slots are gathered and only the pressure-row block of
    the element matrices participates.
    """
    ndv = fe.dim * fe.n2
    x = jnp.where(mask, 0.0, x_u)
    x_e = x[fe.elem_dofs[:, :ndv]]  # (n_el, ndv)
    y_e = jnp.einsum("ecj,ej->ec", A_e[:, ndv:, :ndv], x_e)  # (n_el, n1)
    return fe.accumulate_p(y_e)
