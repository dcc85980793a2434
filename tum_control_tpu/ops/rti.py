"""SQP-RTI engine: one real-time iteration = linearize -> condense -> soft-QP.

This is the TPU-native replacement for the acados SQP_RTI + full-condensing
HPIPM pipeline (NMPC_STM_acados_settings.py:229-243). One `solve()` performs
exactly one real-time iteration, like `AcadosOcpSolver.solve()` under
`nlp_solver_type="SQP_RTI"`:

  1. linearize the discrete dynamics, the nonlinear-LS cost and the
     nonlinear constraints at the currently stored iterate (X, U)
     (Gauss-Newton, exact ERK sensitivities via `jax.jacfwd` of the
     integrator — matching acados' ERK forward sensitivities),
  2. condense all state deviations onto the control deviations
     (w = vec(dU), Dx_k = e_k + Gamma_k w) — the analog of acados'
     FULL_CONDENSING, realized as a `lax.scan` building Gamma,
  3. solve the resulting soft-constrained QP exactly with the
     semismooth-Newton solver in `ops/soft_qp.py`,
  4. update the iterate with the *linear* QP step (no re-rollout), exactly
     like acados RTI, and keep it as the warm start for the next call.

The engine is controller-agnostic: Nominal NMPC, SNMPC (stacked PCE state)
and R2NMPC all provide their own `OCPFunctions`. Everything is jit-safe and
batches over scenarios with `vmap`.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tum_control_tpu.ops.ipm import IPMWarm, init_warm, solve_soft_qp_ipm
from tum_control_tpu.ops.pallas_kernels.condense import condense_scan
from tum_control_tpu.ops.soft_qp import CondensedQP

BIG = 1e12  # stands in for +/- inf bounds (inf would produce inf*0 NaNs)


class OCPFunctions(NamedTuple):
    """Controller-supplied problem functions (node index k is static-shaped).

    dyn_step : (k, x, u) -> x_next        discrete shooting dynamics
    y_stage  : (k, x, u) -> (ny,)         nonlinear-LS stage output
    y_term   : (x) -> (ny_e,)             nonlinear-LS terminal output
    con_stage: (k, x) -> (nc,)            state-only nonlinear constraints
    """

    dyn_step: Callable
    y_stage: Callable
    y_term: Callable
    con_stage: Callable
    # optional reference-dependent residuals (EXTERNAL-cost variants where
    # the residual is not y(x,u) - yref, e.g. ego-frame lon/lat deviations):
    resid_stage: Callable = None   # (k, x, u, yref_k) -> (ny,)
    resid_term: Callable = None    # (x, yref_e) -> (ny_e,)
    # optional structure-exploiting dynamics linearization (e.g. SNMPC's
    # block-sparse stacked-sample sensitivities); default: jacfwd of dyn_step
    dyn_jac: Callable = None       # (k, x, u) -> (F (nx,), A (nx,nx), B (nx,nu))
    # optional fused rollout+sensitivity function over all stages at once
    # ((N, nx+nu) -> (F (N, nx), J (N, nx, nx+nu))), e.g. the Pallas kernel
    # from ops/pallas_kernels/linearize.py. Takes priority over dyn_jac.
    lin_rollout: Callable = None
    # optional fused linearize+condense replacing BOTH _linearize and
    # _condense: (X (N+1,nx), U (N,nu), d0 (nx,)) -> (e (N+1,nx),
    # Gam (N+1,nx,nz)). Used by structure-exploiting controllers (SNMPC's
    # block-sparse stacked state) where materializing the full (nx, nx)
    # stage sensitivities would waste FLOPs/HBM. Controllers using this hook
    # do not receive A_lin from solve_full (returned as zeros).
    lin_condense: Callable = None
    # optional cost-structure hint: when y_stage(k, x, u) == [g(x[sel]), u]
    # with unit diagonal Jacobian on the selected states (true for the
    # NONLINEAR_LS formulations: g is at most a yaw rewrap whose derivative
    # is 1), the Gauss-Newton blocks reduce to row slices of Gamma plus a
    # diagonal control block — no y-Jacobian evaluation, no (N, ny, nz)
    # einsums, and an (N*len(sel), nz) instead of (N*ny, nz) Hessian matmul.
    y_select: tuple = None         # state indices for the leading y rows
    y_select_term: tuple = None    # state indices for y_term rows
    # optional analytic constraint value+Jacobian: (k, x) -> (C (nc,),
    # Jc (nc, nx)). For structured large states (SNMPC's stacked samples)
    # jacfwd over the full nx pushes nx tangents through the constraint;
    # the analytic form costs O(samples) instead.
    con_jac: Callable = None
    # optional analytic stage-output value+Jacobians:
    # (k, x, u) -> (Y (ny,), Jx (ny, nx), Ju (ny, nu)); same rationale.
    y_jac: Callable = None
    # optional FULL custom QP assembly, bypassing the engine's generic
    # linearize/condense/cost/constraint paths entirely:
    #   build_qp(X, U, x0, yref, yref_e, merged) -> (CondensedQP, aux)
    # where `merged` is the engine's merged weight/bound 10-tuple and `aux`
    # is an opaque pytree consumed by expand_dx. Used by controllers whose
    # sensitivity structure makes the dense (N+1, nx, nz) Gamma wasteful to
    # materialize (SNMPC: block-sparse stacked samples + frozen tail — the
    # dense Gamma is 267 MB of HBM traffic per batched step at batch 256).
    # Engines using this hook return A_lin as zeros from solve_full.
    build_qp: Callable = None
    #   expand_dx(aux, w) -> dX (N+1, nx): the primal state update the dense
    #   path computes as e + Gamma @ w. Required with build_qp.
    expand_dx: Callable = None


class RTIState(NamedTuple):
    """Warm-start memory carried between RTI calls (acados solver memory):
    the primal trajectory iterate plus the QP solver's dual/slack warm start
    (the role of HPIPM's persistent QP memory)."""

    X: jnp.ndarray  # (N+1, nx) primal state trajectory
    U: jnp.ndarray  # (N, nu) primal control trajectory
    warm: IPMWarm   # interior-point dual/slack warm start


class QPMods(NamedTuple):
    """Optional per-solve overrides of the engine's static QP data.

    Used by Weights-varying MPC (cost weights + slack penalties updated at
    runtime, NMPC_class.py:269-317) and by R2NMPC (per-stage constraint-bound
    tightening, Reduced_Robustified_NMPC_class.py:335-365). `None` fields fall
    back to the static values.
    """

    W: jnp.ndarray = None
    We: jnp.ndarray = None
    con_lb: jnp.ndarray = None
    con_ub: jnp.ndarray = None
    con_z1: jnp.ndarray = None
    con_z2: jnp.ndarray = None
    u_lb: jnp.ndarray = None
    u_ub: jnp.ndarray = None
    u_z1: jnp.ndarray = None
    u_z2: jnp.ndarray = None


class SolverStats(NamedTuple):
    cost: jnp.ndarray      # nonlinear cost incl. slack penalties (get_cost analog)
    kkt_res: jnp.ndarray   # inf-norm KKT residual of the QP solve
    sqp_iter: jnp.ndarray  # SQP iterations per control step (1 = RTI)
    qp_iter: jnp.ndarray   # actual IPM iterations to convergence (max over
    #                        SQP iterations) — the HPIPM qp_iter analog the
    #                        reference logs (NMPC_class.py:202-206)
    status: jnp.ndarray    # 0 ok | 3 NaN detected (acados NAN_SOL analog)
    gap: jnp.ndarray       # final IPM complementarity gap (normalized)


class RTIEngine:
    """Static problem description + jit-safe solve().

    Bounds / penalty layout mirrors the reference OCPs: per-node constraint
    bounds (N+1, nc) for the state-only rows and (N, nu) for input rows, with
    per-row L1/L2 penalties. Hard rows get z1 = 0, z2 = `hard_penalty`.
    """

    def __init__(
        self,
        funcs: OCPFunctions,
        N: int,
        nx: int,
        nu: int,
        W: jnp.ndarray,       # (ny,) diagonal stage weight
        We: jnp.ndarray,      # (ny_e,) diagonal terminal weight
        con_lb: jnp.ndarray,  # (N+1, nc)
        con_ub: jnp.ndarray,  # (N+1, nc)
        con_z1: jnp.ndarray,  # (N+1, nc)
        con_z2: jnp.ndarray,  # (N+1, nc)
        u_lb: jnp.ndarray,    # (N, nu)
        u_ub: jnp.ndarray,    # (N, nu)
        u_z1: jnp.ndarray,    # (N, nu)
        u_z2: jnp.ndarray,    # (N, nu)
        newton_iters: int = 15,
        lm_reg: float = 0.0,
        sqp_iters: int = 1,
        kkt_fail_rel: float = 1e4,
    ):
        self.lm_reg = lm_reg
        self.sqp_iters = sqp_iters
        self.kkt_fail_rel = kkt_fail_rel
        if (funcs.build_qp is None) != (funcs.expand_dx is None):
            raise ValueError(
                "OCPFunctions.build_qp and expand_dx must be provided together"
            )
        self.funcs = funcs
        self.N, self.nx, self.nu = N, nx, nu
        self.nz = N * nu
        self.W, self.We = W, We
        self.con_lb, self.con_ub = con_lb, con_ub
        self.con_z1, self.con_z2 = con_z1, con_z2
        self.u_lb, self.u_ub = u_lb, u_ub
        self.u_z1, self.u_z2 = u_z1, u_z2
        self.newton_iters = newton_iters
        self.nc_total = (N + 1) * con_lb.shape[1] + N * nu
        # E_k = d(vec dU)/d(du_k): (N, nu, nz) selector, built once
        self.E = jnp.eye(self.nz).reshape(N, nu, self.nz)

    # ------------------------------------------------------------------
    def init_state(self, x0) -> RTIState:
        """acados-style cold start: all states at x0, controls at zero."""
        X = jnp.tile(x0[None, :], (self.N + 1, 1))
        U = jnp.zeros((self.N, self.nu), dtype=x0.dtype)
        return RTIState(X=X, U=U, warm=init_warm(self.nc_total, dtype=x0.dtype))

    # ------------------------------------------------------------------
    def _linearize(self, state: RTIState):
        N, nx, nu = self.N, self.nx, self.nu
        ks = jnp.arange(N)

        if self.funcs.lin_rollout is not None:
            XU = jnp.concatenate([state.X[:-1], state.U], axis=1)
            F, J = self.funcs.lin_rollout(XU)
            return J[:, :, :nx], J[:, :, nx:], F - state.X[1:]

        if self.funcs.dyn_jac is not None:
            F, A, B = jax.vmap(self.funcs.dyn_jac)(ks, state.X[:-1], state.U)
            return A, B, F - state.X[1:]

        def step_xu(k, xu):
            return self.funcs.dyn_step(k, xu[:nx], xu[nx:])

        XU = jnp.concatenate([state.X[:-1], state.U], axis=1)
        F = jax.vmap(step_xu)(ks, XU)
        J = jax.vmap(jax.jacfwd(step_xu, argnums=1))(ks, XU)  # (N, nx, nx+nu)
        A, B = J[:, :, :nx], J[:, :, nx:]
        xi = F - state.X[1:]
        return A, B, xi

    def _condense(self, A, B, xi, d0):
        """e_k, Gamma_k such that Dx_k = e_k + Gamma_k w.

        `condense_scan` is the jnp stage scan unbatched; under vmap on
        TPU/f32 it dispatches to the batch-in-lanes Pallas kernel
        (ops/pallas_kernels/condense.py) — faster and exact f32, where the
        XLA scan's per-stage batched matmuls accumulate ~2e-2 relative
        error through the default-precision MXU."""
        return condense_scan(A, B, xi, d0)

    # ------------------------------------------------------------------
    def _merged(self, mods: "QPMods | None"):
        if mods is None:
            mods = QPMods()
        pick = lambda m, s: s if m is None else m
        return (
            pick(mods.W, self.W),
            pick(mods.We, self.We),
            pick(mods.con_lb, self.con_lb),
            pick(mods.con_ub, self.con_ub),
            pick(mods.con_z1, self.con_z1),
            pick(mods.con_z2, self.con_z2),
            pick(mods.u_lb, self.u_lb),
            pick(mods.u_ub, self.u_ub),
            pick(mods.u_z1, self.u_z1),
            pick(mods.u_z2, self.u_z2),
        )

    # ------------------------------------------------------------------
    def _gn_assemble(self, r0, M, re0, Me, W, We):
        """Condensed Gauss-Newton blocks from stage residuals/Jacobians:
        H0 = M' W M + Me' We Me, g0 = M' W r + Me' We re."""
        N, nz = self.N, self.nz
        Mf = M.reshape(N * M.shape[1], nz)
        rf = r0.reshape(-1)
        wts = jnp.tile(W, N)
        H0 = (Mf * wts[:, None]).T @ Mf + (Me * We[:, None]).T @ Me
        g0 = Mf.T @ (wts * rf) + Me.T @ (We * re0)
        return H0, g0

    def _build_qp(self, state: RTIState, x0, yref, yref_e, mods=None, want_A=False):
        merged = self._merged(mods)
        if self.funcs.build_qp is not None:
            qp, aux = self.funcs.build_qp(state.X, state.U, x0, yref, yref_e, merged)
            A = jnp.zeros((self.N, self.nx, self.nx), dtype=state.X.dtype)
            if want_A:
                return qp, aux, None, A
            return qp, aux, None
        W, We, con_lb, con_ub, con_z1, con_z2, u_lb, u_ub, u_z1, u_z2 = merged
        N, nx, nu, nz = self.N, self.nx, self.nu, self.nz
        ks = jnp.arange(N)
        d0 = x0 - state.X[0]
        if self.funcs.lin_condense is not None:
            e, Gam = self.funcs.lin_condense(state.X, state.U, d0)
            A = jnp.zeros((N, nx, nx), dtype=state.X.dtype)  # not materialized
        else:
            A, B, xi = self._linearize(state)
            e, Gam = self._condense(A, B, xi, d0)

        # --- Gauss-Newton cost ---
        def y_xu(k, xu):
            return self.funcs.y_stage(k, xu[:nx], xu[nx:])

        XU = jnp.concatenate([state.X[:-1], state.U], axis=1)

        if self.funcs.resid_stage is not None:
            # EXTERNAL-cost variant: the residual is a general function of
            # (x, u, yref) — e.g. the ego-frame lon/lat deviations of
            # NMPC_STM_acados_settings_dev_lonlat.py:71-96 — so the GN blocks
            # come from the residual Jacobians, not from y(x,u) - yref. This
            # takes precedence over y_select (the selection structure does
            # not hold for a rotated residual).
            def r_xu(k, xu, yr):
                return self.funcs.resid_stage(k, xu[:nx], xu[nx:], yr)

            Rv = jax.vmap(r_xu)(ks, XU, yref)                  # (N, ny)
            Jr = jax.vmap(jax.jacfwd(r_xu, argnums=1))(ks, XU, yref)
            Jyx, Jyu = Jr[:, :, :nx], Jr[:, :, nx:]
            r0 = Rv + jnp.einsum("kij,kj->ki", Jyx, e[:N])
            M = jnp.einsum("kij,kjz->kiz", Jyx, Gam[:N]) + jnp.einsum(
                "kij,kjz->kiz", Jyu, self.E
            )
            ye = self.funcs.resid_term(state.X[N], yref_e)
            Jye = jax.jacfwd(self.funcs.resid_term, argnums=0)(state.X[N], yref_e)
            re0 = ye + Jye @ e[N]
            Me = Jye @ Gam[N]
            H0, g0 = self._gn_assemble(r0, M, re0, Me, W, We)
        elif self.funcs.y_select is not None:
            Y = jax.vmap(y_xu)(ks, XU)                         # (N, ny)
            # selection-structured cost: y = [x[sel] (unit Jacobian), u]
            sel = tuple(self.funcs.y_select)
            sel_e = tuple(self.funcs.y_select_term)
            ns = len(sel)
            # static per-index slices: an index-array gather here lowers to a
            # serial while-loop with full-Gamma dynamic-update-slices
            # (measured 0.6 ms/step at batch 256)
            take = lambda a, ax, idxs: jnp.concatenate(
                [jax.lax.slice_in_dim(a, i, i + 1, axis=ax) for i in idxs], axis=ax
            )
            r_x = Y[:, :ns] - yref[:, :ns] + take(e[:N], 1, sel)   # (N, ns)
            r_u = Y[:, ns:] - yref[:, ns:]                   # (N, nu)
            Wx, Wu = W[:ns], W[ns:]
            Mf4 = take(Gam[:N], 1, sel).reshape(N * ns, nz)
            wtsx = jnp.tile(Wx, N)
            ye = self.funcs.y_term(state.X[N])
            re0 = ye - yref_e + take(e[N], 0, sel_e)
            Me = take(Gam[N], 0, sel_e)                      # (ny_e, nz)
            H0 = (
                (Mf4 * wtsx[:, None]).T @ Mf4
                + (Me * We[:, None]).T @ Me
                + jnp.diag(jnp.tile(Wu, N))
            )
            g0 = (
                Mf4.T @ (wtsx * r_x.reshape(-1))
                + (Wu[None, :] * r_u).reshape(-1)
                + Me.T @ (We * re0)
            )
        elif self.funcs.y_jac is not None:
            Y, Jyx, Jyu = jax.vmap(self.funcs.y_jac)(ks, state.X[:-1], state.U)
            r0 = Y - yref + jnp.einsum("kij,kj->ki", Jyx, e[:N])
            M = jnp.einsum("kij,kjz->kiz", Jyx, Gam[:N]) + jnp.einsum(
                "kij,kjz->kiz", Jyu, self.E
            )
            ye = self.funcs.y_term(state.X[N])
            Jye = jax.jacfwd(self.funcs.y_term)(state.X[N])
            re0 = ye - yref_e + Jye @ e[N]
            Me = Jye @ Gam[N]
            H0, g0 = self._gn_assemble(r0, M, re0, Me, W, We)
        else:
            Y = jax.vmap(y_xu)(ks, XU)                          # (N, ny)
            Jy = jax.vmap(jax.jacfwd(y_xu, argnums=1))(ks, XU)  # (N, ny, nx+nu)
            Jyx, Jyu = Jy[:, :, :nx], Jy[:, :, nx:]
            r0 = Y - yref + jnp.einsum("kij,kj->ki", Jyx, e[:N])
            M = jnp.einsum("kij,kjz->kiz", Jyx, Gam[:N]) + jnp.einsum(
                "kij,kjz->kiz", Jyu, self.E
            )                                                   # (N, ny, nz)

            ye = self.funcs.y_term(state.X[N])
            Jye = jax.jacfwd(self.funcs.y_term)(state.X[N])     # (ny_e, nx)
            re0 = ye - yref_e + Jye @ e[N]
            Me = Jye @ Gam[N]                                   # (ny_e, nz)
            H0, g0 = self._gn_assemble(r0, M, re0, Me, W, We)

        if self.lm_reg:
            # Levenberg-Marquardt damping in the condensed variable space
            # (the reference's levenberg_marquardt=0.1 for the EXTERNAL
            # variant, NMPC_STM_acados_settings_dev_lonlat.py:268)
            H0 = H0 + self.lm_reg * jnp.eye(nz, dtype=H0.dtype)

        # --- constraint rows ---
        kall = jnp.arange(N + 1)
        if self.funcs.con_jac is not None:
            C, Jc = jax.vmap(self.funcs.con_jac)(kall, state.X)    # (N+1,nc),(N+1,nc,nx)
        else:
            C = jax.vmap(self.funcs.con_stage)(kall, state.X)      # (N+1, nc)
            Jc = jax.vmap(jax.jacfwd(self.funcs.con_stage, argnums=1))(kall, state.X)
        # VPU lowering: these are degenerate MXU shapes (per-node (nc, nx)
        # contractions, nc = 2) — broadcast-multiply + reduce avoids ~10k
        # tiny batched matmuls per step (same rationale as soft_qp._mv)
        c0_c = C + jnp.sum(Jc * e[:, None, :], axis=-1)
        G_c = jnp.sum(Jc[..., None] * Gam[:, None, :, :], axis=2)  # (N+1, nc, nz)

        # input-box rows have Jacobian E = I over w; they are handled
        # analytically inside the QP solvers (n_id = nz) — only the general
        # (state-constraint) rows are stored and multiplied.
        G = G_c.reshape(-1, nz)
        c0 = jnp.concatenate([c0_c.reshape(-1), state.U.reshape(-1)], axis=0)
        lb = jnp.concatenate([con_lb.reshape(-1), u_lb.reshape(-1)])
        ub = jnp.concatenate([con_ub.reshape(-1), u_ub.reshape(-1)])
        z1 = jnp.concatenate([con_z1.reshape(-1), u_z1.reshape(-1)])
        z2 = jnp.concatenate([con_z2.reshape(-1), u_z2.reshape(-1)])

        qp = CondensedQP(H0=H0, g0=g0, G=G, c0=c0, lb=lb, ub=ub, z1=z1, z2=z2)
        if want_A:
            return qp, e, Gam, A
        return qp, e, Gam

    # ------------------------------------------------------------------
    def nonlinear_cost(self, state: RTIState, yref, yref_e, mods=None):
        W, We, con_lb, con_ub, con_z1, con_z2, u_lb, u_ub, u_z1, u_z2 = self._merged(mods)
        """acados `get_cost()` analog: LS cost + slack penalties at the iterate."""
        N, nx = self.N, self.nx
        ks = jnp.arange(N)
        if self.funcs.resid_stage is not None:
            r = jax.vmap(self.funcs.resid_stage)(ks, state.X[:-1], state.U, yref)
        else:
            r = jax.vmap(self.funcs.y_stage)(ks, state.X[:-1], state.U) - yref
        cost = 0.5 * jnp.sum(r * r * W[None, :])
        if self.funcs.resid_term is not None:
            re = self.funcs.resid_term(state.X[N], yref_e)
        else:
            re = self.funcs.y_term(state.X[N]) - yref_e
        cost += 0.5 * jnp.sum(re * re * We)

        C = jax.vmap(self.funcs.con_stage)(jnp.arange(N + 1), state.X)
        du = jnp.maximum(C - con_ub, 0.0)
        dl = jnp.maximum(con_lb - C, 0.0)
        cost += jnp.sum(con_z1 * (du + dl) + 0.5 * con_z2 * (du**2 + dl**2))
        duu = jnp.maximum(state.U - u_ub, 0.0)
        dul = jnp.maximum(u_lb - state.U, 0.0)
        cost += jnp.sum(u_z1 * (duu + dul) + 0.5 * u_z2 * (duu**2 + dul**2))
        return cost

    # ------------------------------------------------------------------
    def solve(self, state: RTIState, x0, yref, yref_e, mods=None):
        """One RTI. Returns (u0, new_state, stats)."""
        u0, new_state, stats, _ = self.solve_full(state, x0, yref, yref_e, mods)
        return u0, new_state, stats

    def solve_full(self, state: RTIState, x0, yref, yref_e, mods=None):
        """One RTI returning also the dynamics sensitivities A (N, nx, nx)
        of this solve's linearization — the `get_from_qp_in(stage, "A")`
        data R2NMPC consumes (Reduced_Robustified_NMPC_class.py:295).

        On a NaN solution (acados status 3) the iterate is left unchanged and
        u0 falls back to the previous first control — the caller decides how
        to re-initialize, mirroring main.py:59-61.

        TPU matmul precision: the MXU's default bf16-pass f32 matmuls carry
        ~1e-3 relative error, enough to excite a multi-meter steering weave
        on high-speed straights (the QP's lateral subspace is nearly singular
        there; bisected with tools/diag_precision.py — bench lat_dev p99 was
        6-8 m before, <0.8 m after). Only the IPM's *gradient/residual*
        matvecs need exactness (pinned in ops/soft_qp.py / ops/ipm.py):
        noise in the normal MATRIX only perturbs Newton directions, which
        the exact-residual iteration corrects. The Pallas kernels
        (condense/chol/linearize) are exact f32 regardless.
        """
        # sqp_iters = 1 is the reference's SQP_RTI; > 1 re-linearizes within
        # the control step (acados' SQP mode, full steps, no line search)
        it_state = state
        qp_iter_max = jnp.zeros((), dtype=jnp.int32)
        gap_last = jnp.zeros((), dtype=state.X.dtype)
        for _ in range(self.sqp_iters):
            qp, e, Gam, A_lin = self._build_qp(it_state, x0, yref, yref_e, mods, want_A=True)
            w, kkt, warm_out, ipm_stats = solve_soft_qp_ipm(
                qp, n_iters=self.newton_iters, n_polish=1, warm=it_state.warm,
                n_id=self.nz, want_stats=True,
            )
            qp_iter_max = jnp.maximum(qp_iter_max, ipm_stats.iters)
            gap_last = ipm_stats.gap.astype(gap_last.dtype)
            if self.funcs.build_qp is not None:
                dX = self.funcs.expand_dx(e, w)  # e holds the aux pytree here
            else:
                dX = e + jnp.sum(Gam * w[None, None, :], axis=-1)
            it_state = RTIState(
                X=it_state.X + dX,
                U=it_state.U + w.reshape(self.N, self.nu),
                warm=warm_out,
            )
        X_new, U_new = it_state.X, it_state.U
        warm_out = it_state.warm

        # failure detection: non-finite or exploded iterates count as NAN_SOL.
        # (An unstable linearization — e.g. the A-product chain along a
        # spinning/saturated trajectory — can produce astronomically large
        # yet finite QP data; treat the result like acados status 3 so the
        # caller re-initializes, main.py:59-61.)
        #
        # The relative-KKT criterion is the fixed-iteration analog of
        # acados' QP-solver failure statuses: when the QP data turns extreme
        # (e.g. SNMPC sample defects amplified through a locally unstable
        # linearization at the grip limit), the fixed-iteration IPM can
        # return a *finite but unconverged* step whose application corrupts
        # the RTI warm start irrecoverably — HPIPM would report max-iter/
        # NaN there and the reference loop would re-initialize. Measured
        # (r4 SNMPC golden-attribution forensics): healthy closed loops
        # reach relative KKT <= ~90 on transient active-set changes that
        # the RTI feedback absorbs harmlessly; the catastrophic
        # warm-start-corruption regime shows >= 1e5. The 1e4 default only
        # catches the latter — tighter settings measurably degrade healthy
        # laps by spurious re-initializations.
        qp_scale = 1.0 + jnp.max(jnp.abs(qp.g0))
        bad = jnp.logical_not(
            jnp.all(jnp.isfinite(X_new))
            & jnp.all(jnp.isfinite(U_new))
            & (jnp.max(jnp.abs(X_new)) < 1e7)
            & (jnp.max(jnp.abs(U_new)) < 1e4)
            & (kkt / qp_scale < self.kkt_fail_rel)
        )
        X_new = jnp.where(bad, state.X, X_new)
        U_new = jnp.where(bad, state.U, U_new)
        warm_new = jax.tree.map(lambda n, o: jnp.where(bad, o, n), warm_out, state.warm)
        new_state = RTIState(X=X_new, U=U_new, warm=warm_new)

        stats = SolverStats(
            cost=self.nonlinear_cost(new_state, yref, yref_e, mods),
            kkt_res=kkt,
            sqp_iter=jnp.array(self.sqp_iters, dtype=jnp.int32),
            qp_iter=qp_iter_max,
            status=jnp.where(bad, 3, 0).astype(jnp.int32),
            gap=gap_last,
        )
        return U_new[0], new_state, stats, A_lin
