"""Quadrature-path operator == element-matrix operator, to roundoff."""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import generators, taylor_hood
from navier_stokes_equations_tpu.ops import assembly, fe_arrays, matfree, operators


@pytest.fixture(scope="module", params=["2d", "3d"])
def fixture_fe(request, mesh2d):
    if request.param == "2d":
        mesh = mesh2d
    else:
        mesh = taylor_hood.build(
            generators.channel_cylinder_3d(h_far=0.18, h_cyl=0.08, n_layers=2)
        )
    fe = fe_arrays.build_fe_arrays(mesh, dtype=jnp.float64)
    return fe


@pytest.mark.parametrize("supg", [False, True])
@pytest.mark.parametrize("newton", [False, True])
def test_operator_paths_agree(fixture_fe, supg, newton):
    fe = fixture_fe
    rng = np.random.default_rng(11)
    params = assembly.StepParams(dt=0.05, theta=0.6, nu=0.01, rho=1.0, gamma=0.1, use_supg=supg)
    u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3)
    x = jnp.asarray(rng.normal(size=fe.n_dofs))

    if newton:
        u0, p0 = fe.split(jnp.zeros(fe.n_dofs))
        A_e, _ = assembly.newton_system(fe, params, u_adv, p0, u_adv * 0.5)
        # newton_system linearizes around (u_adv as current, 0.5 u_adv old);
        # the matfree operator takes the same current field.
        op = matfree.make_system_operator(fe, params, u_adv, newton_reaction=True)
    else:
        A_e, _ = assembly.oseen_system(fe, params, u_adv, u_adv * 0.5)
        op = matfree.make_system_operator(fe, params, u_adv)

    y_ref = operators.apply_element_matrices(fe, A_e, x)
    y_q = op(x)
    scale = np.abs(np.asarray(y_ref)).max()
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref), atol=1e-12 * scale, rtol=1e-11)


def test_block_applies_agree(fixture_fe):
    fe = fixture_fe
    rng = np.random.default_rng(12)
    params = assembly.StepParams(dt=0.05, theta=0.6, nu=0.01, rho=1.0, gamma=0.1, use_supg=True)
    u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3)
    x = jnp.asarray(rng.normal(size=fe.n_dofs))
    mask = jnp.zeros(fe.n_dofs, bool)  # unconstrained comparison

    A_e, _ = assembly.oseen_system(fe, params, u_adv, u_adv)
    op = matfree.make_system_operator(fe, params, u_adv)

    y_ref = operators.velocity_block_apply(fe, A_e, mask, x.at[fe.n_udofs :].set(0.0))
    y_q = op.velocity_block(x).at[fe.n_udofs :].set(0.0)
    scale = np.abs(np.asarray(y_ref)).max()
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref), atol=1e-12 * scale)

    d_ref = operators.divergence_block_apply(fe, A_e, mask, x.at[fe.n_udofs :].set(0.0))
    d_q = op.divergence(x)
    scale = np.abs(np.asarray(d_ref)).max()
    np.testing.assert_allclose(np.asarray(d_q), np.asarray(d_ref), atol=1e-12 * scale)
