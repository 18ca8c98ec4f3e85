"""Distributed Schur K_p solve == replicated solve (parallel/halo_schur.py).

The halo preconditioner's K_p solve runs strip-local (two-grid or CG) with
O(interface) pressure exchanges and one O(n_c) psum — replacing the
replicated O(n_p) gather.  The arithmetic mirrors
preconditioners.make_kp_solve up to float reassociation, so (a) the solve
itself matches to roundoff and (b) outer FGMRES iteration counts are
unchanged.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.parallel import halo_fe, halo_schur, halo_solver, sharding
from navier_stokes_equations_tpu.solvers import preconditioners as pc

N_DEV = 8


@pytest.fixture(scope="module")
def solvers(mesh2d_path):
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    # dense_max=0 forces the two-grid strategy (mesh-2D's pressure space
    # would otherwise take the dense inverse, which stays replicated).
    cfg = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01), dtype="float64",
        precond_schur_dense_max=0,
    )
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    ref = solver.NavierStokesSolver(cfg, mesh)
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)
    return ref, hs


def _owned_residual(hs, rng):
    """Random pressure residual, zero at pins, as (global, owned-block)."""
    fe, hfe = hs.fe, hs.hfe
    t_glob = jnp.asarray(rng.standard_normal(fe.n_p))
    t_glob = jnp.where(hs.pressure_ops.pin_mask, 0.0, t_glob)
    x_glob = jnp.concatenate([jnp.zeros((fe.n_udofs,), t_glob.dtype), t_glob])
    t2 = halo_fe.scatter_local(hfe, x_glob)[:, hfe.dim * hfe.n_ln:]
    return t_glob, t2


def _gather_p(hs, z2):
    """(P, n_lp) owned-valued pressure blocks -> (n_p,) global."""
    hfe = hs.hfe
    z_own = z2[:, : hfe.n_op_max]
    return (
        jnp.zeros((hfe.n_p_glob + 1,), z2.dtype)
        .at[hfe.owned_verts.reshape(-1)]
        .set(z_own.reshape(-1))[:-1]
    )


def test_two_grid_statics_cover_every_owned_vertex(solvers):
    _, hs = solvers
    assert hs.pressure_ops.two_level
    agg_own = np.asarray(hs.statics.agg_own)
    n_c = int(hs.pressure_ops.kc_inv.shape[0])
    ov = np.asarray(hs.hfe.owned_verts)
    valid = ov < hs.hfe.n_p_glob
    agg_global = np.asarray(hs.pressure_ops.agg_ids)
    np.testing.assert_array_equal(
        agg_own[:, : hs.hfe.n_op_max][valid], agg_global[ov[valid]]
    )
    # Halo region never touches a real aggregate.
    assert (agg_own[:, hs.hfe.n_op_max:] == n_c).all()


def test_kp_two_grid_distributed_matches_replicated(solvers):
    _, hs = solvers
    fe, pops, hfe = hs.fe, hs.pressure_ops, hs.hfe
    assert pops.two_level and not pops.dense
    cfg = hs.cfg
    kp_ref = pc.make_kp_solve(
        fe, pops, kp_iters=cfg.precond_kp_iters,
        twolevel_cycles=cfg.precond_twolevel_cycles,
    )
    kp_dist = hs._make_kp_dist(hfe, hs.statics, pops)
    rng = np.random.default_rng(7)
    for trial in range(2):
        t_glob, t2 = _owned_residual(hs, rng)
        z_ref = np.asarray(kp_ref(t_glob))
        z_dist = np.asarray(_gather_p(hs, kp_dist(t2)))
        np.testing.assert_allclose(z_dist, z_ref, rtol=1e-11, atol=1e-11)


def test_kp_cg_fallback_distributed_matches_replicated(solvers, mesh2d_path):
    """The Jacobi-CG strategy (no coords -> no two-grid) distributes with
    psum-reduced dots; iterates match the replicated cg.pcg to roundoff."""
    _, hs = solvers
    mesh = taylor_hood.load(mesh2d_path)
    fe, hfe = hs.fe, hs.hfe
    pops_cg = pc.build_pressure_operators(
        fe, hs.pressure_ops.pin_mask, dense_max=0
    )
    assert not pops_cg.two_level and not pops_cg.dense
    statics_cg = dataclasses.replace(
        hs.statics,
        **{
            k: jax.tree.map(
                lambda a: jax.device_put(
                    a, jax.sharding.NamedSharding(
                        hs.device_mesh,
                        jax.sharding.PartitionSpec(hfe.axis),
                    )
                ),
                v,
            )
            for k, v in halo_schur.build_schur_statics(hfe, pops_cg).items()
        },
        agg_own=(), agg_gather=(),
    )
    kp_ref = pc.make_kp_solve(fe, pops_cg, kp_iters=hs.cfg.precond_kp_iters)
    kp_dist = hs._make_kp_dist(hfe, statics_cg, pops_cg)
    rng = np.random.default_rng(3)
    t_glob, t2 = _owned_residual(hs, rng)
    z_ref = np.asarray(kp_ref(t_glob))
    z_dist = np.asarray(_gather_p(hs, kp_dist(t2)))
    np.testing.assert_allclose(z_dist, z_ref, rtol=1e-10, atol=1e-10)


def test_full_steps_match_single_device_two_grid(solvers):
    """End-to-end: the distributed two-grid Schur leaves the FGMRES
    iteration counts and the trajectory unchanged vs the single-chip
    solver with the SAME (two-grid) strategy."""
    ref, hs = solvers
    s_ref = ref.initial_state()
    s_h = hs.initial_state()
    for _ in range(3):
        s_ref, m_ref = ref.step(s_ref)
        s_h, m_h = hs.step(s_h)
        assert abs(int(m_h.gmres_iters) - int(m_ref.gmres_iters)) <= 2
        assert bool(m_h.converged)
        x_h = np.asarray(hs.global_solution(s_h))
        x_r = np.asarray(s_ref.x_old)
        scale = np.max(np.abs(x_r))
        assert np.max(np.abs(x_h - x_r)) < 5e-3 * scale
        assert abs(float(m_h.drag) - float(m_ref.drag)) < 1e-3
        assert abs(float(m_h.delta_p) - float(m_ref.delta_p)) < 1e-3
