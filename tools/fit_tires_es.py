"""Lap-scale tire calibration: batched full-lap evolution strategy on TPU.

Companion to tools/fit_tires_closedloop.py (the differentiable path).
Measured division of labor (docs/PARITY.md r5):

  * gradient descent THROUGH the sim scan works at chunk scale (clipped
    per-step cotangents; 100-step windows converge on their objective),
    but chunk-window tracking ratios are a biased estimator of the
    full-lap ratios the parity gate needs, and at 6000-step horizon the
    closed loop is chaotic — even sanitized reverse-mode gradients are
    noise (measured: ratios wander +-5% with no trend over 27 Adam steps);
  * the full-lap objective itself is cheap on TPU: a whole (population x
    {nominal, SNMPC}) x 120 s-lap product evaluates as two vmapped device
    programs in seconds — so the lap-scale calibration runs as a small
    (mu, lambda) evolution strategy on EXACTLY the quantity the gate
    checks. acados evaluates one lap at a time, in real time.

Objective per member (full 6000-step laps, both goldens):
    (mean|dev_lat|/golden - 1)^2 summed over runs
    + softplus divergence penalty + solver-failure penalty.

Run: python tools/fit_tires_es.py [--gens 60] [--pop 16] [--sigma 0.008]
Writes data/Config/EDGAR/pacejka_params_2023fit_cl.yaml (best member,
validated ok==1.0 on both laps) + Logs/attribution/closedloop_es.txt.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The population axis vmaps over the TIRE PARAMETERS, which the production
# kernels capture in closures — jax.custom_vmap asserts its closure consts
# are unbatched, so the Pallas-dispatch wrappers cannot batch over them.
# The differentiable mode's plain-jnp paths vmap over anything.
os.environ.setdefault("TUM_DIFFERENTIABLE", "1")

import jax

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_NOM = (
    "/root/reference/Papers_Plots/ACC24_SNMPC/"
    "NMPC_FnodistSE_n10uph15v0.8vlt0.35yrt0.035p0.82023-09-17_16-06-27/full_logs.npz"
)
GOLDEN_SNM = (
    "/root/reference/Papers_Plots/ACC24_SNMPC/"
    "SNMPC_FnodistSE_n10uph15v0.8vlt0.35yrt0.035p0.82023-09-17_16-03-35/full_logs.npz"
)
OUT_YAML = os.path.join(REPO, "data", "Config", "EDGAR", "pacejka_params_2023fit_cl.yaml")
BLEND_YAML = os.path.join(REPO, "data", "Config", "EDGAR", "pacejka_params_2023fit_snmpc.yaml")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=60)
    ap.add_argument("--pop", type=int, default=16)
    ap.add_argument("--mu", type=int, default=4)
    ap.add_argument("--sigma", type=float, default=0.008)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--init", default=None)
    ap.add_argument("--out", default=OUT_YAML)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import yaml

    from tum_control_tpu.config import MPCConfig, SimConfig, load_gg_table
    from tum_control_tpu.config import load_tire_params, load_vehicle_params
    from tum_control_tpu.controllers.common import GGTables
    from tum_control_tpu.controllers.nominal import NominalNMPC
    from tum_control_tpu.controllers.snmpc import StochasticNMPC
    from tum_control_tpu.params import TireParams
    from tum_control_tpu.sim.closed_loop import ClosedLoopSim
    from tum_control_tpu.sim.disturbances import disturbance_config
    from tum_control_tpu.track.trajectory import load_ref_trajectory, initial_state

    import tum_control_tpu.config as cfg_mod

    d_nom = np.load(GOLDEN_NOM)
    d_snm = np.load(GOLDEN_SNM)
    n = d_nom["simU"].shape[0]
    g_nom = float(np.abs(d_nom["dev_lat"][:n]).mean())
    g_snm = float(np.abs(d_snm["dev_lat"][:n]).mean())

    sim_cfg = SimConfig(sim_mode=0, T=n * 0.02)
    cfgp = cfg_mod.DEFAULT_CONFIG_PATH
    vp = load_vehicle_params(cfgp, sim_cfg.veh_params_file_MPC)
    gg = GGTables(*load_gg_table(cfgp, MPCConfig().lookuptable_gg_limits))
    traj_path = os.path.join(sim_cfg.trajectory_path, sim_cfg.ref_traj_file)
    traj = load_ref_trajectory(traj_path)
    x0m, x0s = initial_state(traj_path, sim_cfg.idx_ref_start)
    tp0 = load_tire_params(cfgp, "EDGAR/pacejka_params.yaml")
    dtype = jnp.float64 if args.cpu else jnp.float32
    x0m = jnp.asarray(x0m, dtype)
    x0s = jnp.asarray(x0s, dtype)

    base = np.log(np.array(
        [tp0.Bf, tp0.Cf, tp0.Df, tp0.Ef, tp0.Br, tp0.Cr, tp0.Dr, tp0.Er]
    ))

    with open(args.init or BLEND_YAML) as fh:
        by = yaml.safe_load(fh)["tire_params"]
    init_vals = np.array([
        by["front"]["Bf"], by["front"]["Cf"], by["front"]["Df"], by["front"]["Ef"],
        by["rear"]["Br"], by["rear"]["Cr"], by["rear"]["Dr"], by["rear"]["Er"],
    ])
    theta0 = np.log(init_vals) - base

    def make_tp(thvec):
        v = jnp.exp(jnp.asarray(base, dtype) + thvec)
        return TireParams(Bf=v[0], Cf=v[1], Df=v[2], Ef=v[3],
                          Br=v[4], Cr=v[5], Dr=v[6], Er=v[7], mu=tp0.mu)

    nodist = disturbance_config("none", np.zeros(7), enabled=False)

    def build_sim(ctrl, tp):
        return ClosedLoopSim(
            controller=ctrl, traj=traj, sim_mode=0, Ts=sim_cfg.Ts_sim_step,
            Tp=sim_cfg.Tp, N=sim_cfg.N, vp_sim=vp, tp_sim=tp,
            dist_deriv=nodist, dist_se=nodist,
        )

    def lap_stats(make_ctrl, thvec):
        tp = make_tp(thvec)
        sim = build_sim(make_ctrl(tp), tp)
        carry, log = sim.run(x0m, x0s, n, key=jax.random.PRNGKey(0))
        dev = jnp.abs(log.lat_dev)
        ok = jnp.mean((log.simSolverDebug[:, 4] == 0).astype(dtype))
        return jnp.mean(dev), jnp.max(dev), ok

    def make_nom(tp):
        return NominalNMPC(MPCConfig(), sim_cfg.N, sim_cfg.Ts_MPC, vp, tp, gg)

    def make_snm(tp):
        return StochasticNMPC(
            MPCConfig(controller="snmpc", uncertainty_propagation_horizon=15),
            sim_cfg.N, sim_cfg.Ts_MPC, vp, tp, gg,
        )

    @jax.jit
    def eval_pop(thetas):
        mn, xn, okn = jax.vmap(lambda t: lap_stats(make_nom, t))(thetas)
        ms, xs, oks = jax.vmap(lambda t: lap_stats(make_snm, t))(thetas)
        rn = mn / g_nom
        rs = ms / g_snm
        # divergence penalty must be ~0 in the healthy region (max ~0.8 m)
        # or its flat baseline drowns the ratio terms the gate cares about
        blow = lambda x: 0.25 * jax.nn.softplus(8.0 * (x - 1.3))
        fit = (
            (rn - 1.0) ** 2 + 1.5 * (rs - 1.0) ** 2
            + blow(xn) + blow(xs)
            + 10.0 * ((1.0 - okn) + (1.0 - oks))
        )
        return fit, rn, rs, xn, xs, okn, oks

    rng = np.random.default_rng(0)
    mean = theta0.copy()
    sigma = args.sigma
    os.makedirs(os.path.join(REPO, "Logs", "attribution"), exist_ok=True)
    logf = open(os.path.join(REPO, "Logs", "attribution", "closedloop_es.txt"), "w")
    best = (np.inf, theta0, None)

    for gen in range(args.gens):
        t0 = time.time()
        pert = rng.standard_normal((args.pop, 8)) * sigma
        pert[0] = 0.0  # elitist: always re-evaluate the current mean
        cand = mean[None, :] + pert
        fit, rn, rs, xn, xs, okn, oks = (
            np.asarray(a) for a in eval_pop(jnp.asarray(cand, dtype))
        )
        order = np.argsort(fit)
        elite = order[: args.mu]
        mean = cand[elite].mean(axis=0)
        gi = order[0]
        gate = max(abs(rn[gi] - 1), abs(rs[gi] - 1))
        if fit[gi] < best[0] and okn[gi] == 1.0 and oks[gi] == 1.0:
            best = (fit[gi], cand[gi].copy(), gate)
        line = (
            f"gen {gen:3d} best_fit {fit[gi]:.5f} ratios {rn[gi]:.3f}/{rs[gi]:.3f} "
            f"max {xn[gi]:.2f}/{xs[gi]:.2f} ok {okn[gi]:.4f}/{oks[gi]:.4f} "
            f"gate {gate:.3f} sigma {sigma:.4f} ({time.time()-t0:.1f}s)"
        )
        print(line, flush=True)
        logf.write(line + "\n")
        logf.flush()
        # 1/5-success-style sigma adaptation
        frac_better = float(np.mean(fit < fit[0]))  # vs the elitist mean member
        sigma *= 1.15 if frac_better > 0.3 else 0.9
        sigma = float(np.clip(sigma, 0.001, 0.05))

    _, th_best, gate = best
    tp = make_tp(jnp.asarray(th_best, dtype))
    vals = {k: float(getattr(tp, k)) for k in
            ["Bf", "Cf", "Df", "Ef", "Br", "Cr", "Dr", "Er", "mu"]}
    print(f"final best gate {gate}; theta {th_best}")
    logf.write(f"final best gate {gate}; theta {th_best}\n")
    with open(args.out, "w") as fh:
        fh.write(
            "# Pacejka parameters calibrated on the FULL-LAP closed-loop parity\n"
            "# objective (both ACC24 no-dist goldens jointly): chunk-scale fit by\n"
            "# gradient descent through the sim scan + lap-scale batched-rollout\n"
            "# evolution strategy. Generated by tools/fit_tires_closedloop.py +\n"
            "# tools/fit_tires_es.py — see docs/PARITY.md round-5 section.\n"
            "tire_params:\n"
            "  front:\n"
            f"    Bf: {vals['Bf']:.6f}\n    Cf: {vals['Cf']:.6f}\n"
            f"    Df: {vals['Df']:.3f}\n    Ef: {vals['Ef']:.6f}\n"
            "  rear:\n"
            f"    Br: {vals['Br']:.6f}\n    Cr: {vals['Cr']:.6f}\n"
            f"    Dr: {vals['Dr']:.3f}\n    Er: {vals['Er']:.6f}\n"
            f"mu: {vals['mu']:.6f}\n"
        )
    print("wrote", args.out)
    logf.close()


if __name__ == "__main__":
    main()
