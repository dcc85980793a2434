"""Dissect SNMPC's _build_qp on-device: which sub-stage dominates.

Times (scan-chained, dispatch-free): lin_condense | con_jac | y_jac+GN |
full _build_qp, at a given batch.

    python tools/snmpc_dissect.py [batch] [repeats]
"""
import os
import sys
import time

if os.environ.get("STAGE_BENCH_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig
from tum_control_tpu.track.planner import planner_emulator


def scan_time(step, carry, R, name):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None, length=R)[0]

    out = run(carry)
    jax.block_until_ready(out)
    t0 = time.time()
    out = run(carry)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / R
    print(f"{name:16s}: {dt*1e6:9.1f} us/iter", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    sim_cfg = SimConfig(sim_mode=0, T=2.0)
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig(controller="snmpc"))
    ctrl = sim.controller
    eng = ctrl.engine
    N, nx, nu, nz = eng.N, eng.nx, eng.nu, eng.nz

    M = traj.n_points
    starts = np.linspace(0, M - 1, batch).astype(np.int32)
    pos = np.asarray(traj.pos)[starts]
    yaw = np.mod(np.asarray(traj.yaw)[starts], 2 * np.pi)
    v = np.asarray(traj.v)[starts]
    x0m_b = jnp.asarray(
        np.stack([pos[:, 0], pos[:, 1], yaw, v, 0 * v, 0 * v, 0 * v, 0 * v], axis=1),
        dtype=jnp.float32,
    )
    init_b = jax.vmap(ctrl.init_state)(x0m_b)
    x0e_b = jax.vmap(ctrl._fan)(x0m_b)
    win_b = jax.vmap(lambda p: planner_emulator(traj, p, sim.Tp, sim.N + 1)[1])(
        x0m_b[:, :2]
    )
    yref_b, yref_e_b = jax.vmap(ctrl.make_yref)(win_b)
    print(f"batch={batch} repeats={R} nx={nx} nz={nz}", flush=True)

    # --- 1. lin_condense alone (chained through U via e feedback)
    def lc_step(st):
        d0 = x0e_b - st.X[:, 0]
        e, Gam = jax.vmap(eng.funcs.lin_condense)(st.X, st.U, d0)
        return st._replace(U=st.U + 1e-9 * e[:, :N, :nu])

    scan_time(lc_step, init_b, R, "lin_condense")

    # --- 2. constraint rows (con_jac + row einsums) given fixed e/Gam
    d0_b = x0e_b - init_b.X[:, 0]
    e_b, Gam_b = jax.jit(jax.vmap(eng.funcs.lin_condense))(init_b.X, init_b.U, d0_b)
    kall = jnp.arange(N + 1)

    def con_step(eG):
        e, Gam = eG
        C, Jc = jax.vmap(jax.vmap(eng.funcs.con_jac))(
            jnp.broadcast_to(kall, (batch, N + 1)), init_b.X
        )
        c0_c = C + jnp.einsum("bkij,bkj->bki", Jc, e)
        G_c = jnp.einsum("bkij,bkjz->bkiz", Jc, Gam)
        return (e + 1e-12 * c0_c[:, :, :1], Gam + 1e-12 * G_c[:, :, :1, :])

    scan_time(con_step, (e_b, Gam_b), R, "con rows")

    # --- 3. cost blocks (y_jac + GN assembly) given fixed e/Gam
    ks = jnp.arange(N)

    def cost_step(eG):
        e, Gam = eG

        def one(Xb, Ub, yr, ye, e1, Gam1):
            Y, Jyx, Jyu = jax.vmap(eng.funcs.y_jac)(ks, Xb[:-1], Ub)
            r0 = Y - yr + jnp.einsum("kij,kj->ki", Jyx, e1[:N])
            Mm = jnp.einsum("kij,kjz->kiz", Jyx, Gam1[:N]) + jnp.einsum(
                "kij,kjz->kiz", Jyu, eng.E
            )
            yt = eng.funcs.y_term(Xb[N])
            Jye = jax.jacfwd(eng.funcs.y_term)(Xb[N])
            re0 = yt - ye + Jye @ e1[N]
            Me = Jye @ Gam1[N]
            return eng._gn_assemble(r0, Mm, re0, Me, eng.W, eng.We)

        H0, g0 = jax.vmap(one)(init_b.X, init_b.U, yref_b, yref_e_b, e, Gam)
        s1 = jnp.sum(g0, axis=-1)[:, None, None]
        s2 = jnp.sum(H0, axis=(-2, -1))[:, None, None, None]
        return (e + 1e-12 * s1, Gam + 1e-12 * s2)

    scan_time(cost_step, (e_b, Gam_b), R, "cost blocks")

    # --- 4. full build_qp
    def build_step(st):
        qp = jax.vmap(lambda s, x, yr, ye: eng._build_qp(s, x, yr, ye)[0])(
            st, x0e_b, yref_b, yref_e_b
        )
        return st._replace(U=st.U + 1e-9 * qp.g0.reshape(batch, N, nu))

    scan_time(build_step, init_b, R, "full build_qp")


if __name__ == "__main__":
    main()
