"""Dump real per-step condensed QPs from a Monteblanco lap and cross-validate
the in-graph IPM against an independent scipy solve at production scale
(nz = 76, the reference's N=38 x nu=2 condensed dimension).

This replaces the lost golden-log anchor (docs/PARITY.md) with a falsifiable
one: the exact QPs the RTI engine solves in a real closed loop, re-solved by
scipy.optimize (SLSQP on the explicit-slack NLP formulation — the same
program HPIPM solves, NMPC_STM_acados_settings.py:164-224 slack layout).

Writes tests/data/qp_anchor.npz with the QP data, the scipy solutions, and
metadata. tests/test_qp_anchor.py consumes it in CI.

Usage: PYTHONPATH=/root/repo python tools/dump_qps.py [n_qps]
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tum_control_tpu.api import build_simulation  # noqa: E402
from tum_control_tpu.config import MPCConfig, SimConfig  # noqa: E402
from tum_control_tpu.track.planner import planner_emulator  # noqa: E402

BIG_THRESH = 1e10


def solve_qp_scipy(H0, g0, G, c0, lb, ub, z1, z2, n_id):
    """Independent solve of the soft QP via scipy trust-constr with explicit
    slack variables (SLSQP terminates ~1e-3 short on the active-set QPs).

    min_{w,su,sl} 0.5 w'H0 w + g0'w + z1'(su+sl) + 0.5 z2'(su^2+sl^2)
    s.t. (soft rows)  v - ub <= su,  lb - v <= sl,  su, sl >= 0
         (hard rows)  lb <= v <= ub,          v = [G; I] w + c0
    """
    import scipy.sparse as sp
    from scipy.optimize import LinearConstraint, minimize

    nz = H0.shape[0]
    Gfull = np.vstack([G, np.eye(nz)]) if n_id else G
    assert Gfull.shape[0] == c0.shape[0]

    act_u = ub < BIG_THRESH
    act_l = lb > -BIG_THRESH
    soft = z2 < 1e6
    iu = np.where(act_u & soft)[0]
    il = np.where(act_l & soft)[0]
    ihu = np.where(act_u & ~soft)[0]
    ihl = np.where(act_l & ~soft)[0]
    nu_, nl_ = len(iu), len(il)
    n = nz + nu_ + nl_

    def split(x):
        return x[:nz], x[nz : nz + nu_], x[nz + nu_ :]

    def fun(x):
        w, su, sl = split(x)
        return (
            0.5 * w @ H0 @ w
            + g0 @ w
            + z1[iu] @ su
            + 0.5 * su @ (z2[iu] * su)
            + z1[il] @ sl
            + 0.5 * sl @ (z2[il] * sl)
        )

    def jac(x):
        w, su, sl = split(x)
        return np.concatenate(
            [H0 @ w + g0, z1[iu] + z2[iu] * su, z1[il] + z2[il] * sl]
        )

    def hess(x):
        return sp.block_diag([H0, sp.diags(z2[iu]), sp.diags(z2[il])]).tocsr()

    rows, lo, hi = [], [], []
    Zu = np.zeros((nu_, nl_))
    # soft upper: su + ub - v >= 0
    rows.append(np.hstack([-Gfull[iu], np.eye(nu_), Zu]))
    lo.append(c0[iu] - ub[iu])
    hi.append(np.full(nu_, np.inf))
    # soft lower: sl - lb + v >= 0
    rows.append(np.hstack([Gfull[il], Zu.T, np.eye(nl_)]))
    lo.append(lb[il] - c0[il])
    hi.append(np.full(nl_, np.inf))
    if len(ihu):
        rows.append(np.hstack([-Gfull[ihu], np.zeros((len(ihu), nu_ + nl_))]))
        lo.append(c0[ihu] - ub[ihu])
        hi.append(np.full(len(ihu), np.inf))
    if len(ihl):
        rows.append(np.hstack([Gfull[ihl], np.zeros((len(ihl), nu_ + nl_))]))
        lo.append(lb[ihl] - c0[ihl])
        hi.append(np.full(len(ihl), np.inf))
    # slack nonnegativity
    rows.append(np.hstack([np.zeros((nu_ + nl_, nz)), np.eye(nu_ + nl_)]))
    lo.append(np.zeros(nu_ + nl_))
    hi.append(np.full(nu_ + nl_, np.inf))
    A = np.vstack(rows)

    res = minimize(
        fun,
        np.zeros(n),
        jac=jac,
        hess=hess,
        method="trust-constr",
        constraints=[LinearConstraint(A, np.concatenate(lo), np.concatenate(hi))],
        options={"gtol": 1e-12, "xtol": 1e-14, "maxiter": 3000},
    )
    return res.x[:nz], res


def main():
    n_qps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    every = 10
    n_steps = n_qps * every

    sim_cfg = SimConfig(sim_mode=0, T=n_steps * 0.02)
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig())
    ctrl = sim.controller
    eng = ctrl.engine

    step_j = jax.jit(sim.step)
    build_j = jax.jit(
        lambda st, x0, yref, yref_e: eng._build_qp(st, x0, yref, yref_e)[0]
    )
    win_j = jax.jit(lambda pose: planner_emulator(traj, pose, sim.Tp, sim.N + 1)[1])

    carry = sim.init_carry(x0m, x0s, jax.random.PRNGKey(0))
    z7 = jnp.zeros(7)
    qps, ours = [], []
    for i in range(n_steps):
        if i % every == 0:
            window = win_j(carry.pose)
            yref, yref_e = ctrl.make_yref(window)
            qp = build_j(carry.ctrl_state, carry.x_est, yref, yref_e)
            from tum_control_tpu.ops.ipm import solve_soft_qp_ipm

            w_ipm, kkt = solve_soft_qp_ipm(
                qp, n_iters=ctrl.engine.newton_iters, n_polish=1, n_id=eng.nz
            )
            qps.append(tuple(np.asarray(f) for f in qp))
            ours.append(np.asarray(w_ipm))
        carry, _ = step_j(carry, (jnp.asarray(i), z7, z7))
    print(f"captured {len(qps)} QPs from {n_steps} steps")

    sols, fails = [], 0
    for j, q in enumerate(qps):
        w_sp, res = solve_qp_scipy(*q, n_id=eng.nz)
        if res.status not in (1, 2):  # gtol / xtol termination
            fails += 1
            print(f"  qp {j}: scipy status {res.status}: {res.message}")
        sols.append(w_sp)
        d = np.abs(w_sp - ours[j]).max()
        du0 = np.abs(w_sp[:2] - ours[j][:2]).max()
        if j % 10 == 0 or d > 1e-4:
            print(f"  qp {j}: |w_scipy - w_ipm|_inf = {d:.2e}, u0 diff = {du0:.2e}")

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
    os.makedirs(out, exist_ok=True)
    fields = ["H0", "g0", "G", "c0", "lb", "ub", "z1", "z2"]
    np.savez_compressed(
        os.path.join(out, "qp_anchor.npz"),
        **{f: np.stack([q[k] for q in qps]) for k, f in enumerate(fields)},
        w_scipy=np.stack(sols),
        w_ipm_at_dump=np.stack(ours),
        n_id=eng.nz,
        scipy_fails=fails,
    )
    diffs = np.abs(np.stack(sols) - np.stack(ours))
    print(
        f"saved tests/data/qp_anchor.npz; scipy fails: {fails}; "
        f"max |w| diff {diffs.max():.3e}; max u0 diff {diffs[:, :2].max():.3e}"
    )


if __name__ == "__main__":
    main()
