"""Constrained moving-horizon estimation (MHE) through the PQP solver.

MHE is the estimation dual of MPC: over a sliding window of the last
``N`` measurements, find the process-noise sequence (and thereby the
state trajectory) that best explains the data, subject to KNOWN bounds
on the noise / states that a Kalman filter cannot express:

    min_w  sum_k w_k' Qw^-1 w_k + sum_k (y_k - C x_k)' Rv^-1 (y_k - C x_k)
    s.t.   x_{k+1} = A x_k + B u_k + w_k,     x_{t-N} = x_bar (arrival),
           w_min <= w_k <= w_max,   y_min <= C x_k <= y_max.

The key observation: this IS the framework's MPC problem under the
identification {noise w -> "input", measurements y -> per-stage
reference, known inputs u -> disturbance channel}:

    estimation plant   x+ = A x + I w + B u,   y = C x
    weights            Qy = Rv^-1,  R = Qw^-1
    reference          r_k = y_k        (changes EVERY step)

so the whole geometry (Qp, Gp, dual Hessian, theta, splits) comes from
:func:`~pqp_for_mpc_tpu.models.mpc.condense` built once at r = 0, and
only the measurement-dependent forcing is assembled per step: the
reference enters the condensed blocks LINEARLY (Fp3 = L3 r,
Mp4 = L4 r, Mp5 = L5 r, Mp6 = r' Q4 r — the same algebra as
mpc._condense with rbar left symbolic), so each window solve is the
standard per-step pattern {assemble forcing -> dualize_forcing ->
solve_batched} every controller in this package uses.

The reference has no estimator at all (its state arrives by file,
PQP_CPU.c:757-930); the framework's Kalman filter
(models/estimator.py) covers the unconstrained case.  MHE adds the
constrained one — one-sided disturbances, physical state bounds —
where the filter's Gaussian assumption is wrong and a bounded QP
estimate is measurably better (tests/test_mhe.py).

Arrival handling: the window start is the previous window's smoothed
estimate PLUS a weighted arrival correction — stage 0's "noise" rides
free of the w bounds and is weighted by the inverse of the steady-state
one-step prediction covariance ``P0`` (the filter-DARE solution, or a
user-supplied prior).  This is the standard arrival-cost MHE expressed
through the framework's per-stage weight/bound stacks
(``MPCSpec.R``/``u_min`` as ``(H, ...)`` schedules): without it, a
wrong prior with active noise bounds is UNCORRECTABLE and the
recursion diverges (measured: cold-start tail error 1.8 vs 0.03 with
the arrival cost on the impulse test).  The recursion x_bar <- xs[0]
advances it one step per slide.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pqp_for_mpc_tpu.dual import dual_geometry, dualize_forcing
from pqp_for_mpc_tpu.models.mpc import (MPCSpec, _prediction_matrices_f64,
                                        _stage_weight_diag, condense)
from pqp_for_mpc_tpu.models.plants import LinearPlant
from pqp_for_mpc_tpu.solver import solve_batched


class MovingHorizonEstimator:
    """Sliding-window constrained state estimator (see module docstring).

    * :meth:`step` — solve ONE window ``(x_bar, u_win, y_win) ->
      (x_hat, xs, SolveResult)``; traceable, warm-started.
    * :meth:`run` — slide the window over a whole input/measurement
      record in one ``lax.scan`` (window solves, arrival recursion and
      warm-start carry all compiled).
    """

    def __init__(self, plant: LinearPlant, window: int, Qw, Rv,
                 w_min=None, w_max=None, y_min=None, y_max=None,
                 P0=None, cfg=None, warm_start: bool = True,
                 warm_start_floor: float = 1e-6):
        if np.asarray(plant.A).ndim == 3:
            raise NotImplementedError(
                "this condensed MHE needs an LTI plant; for LTV or "
                "nonlinear dynamics use NonlinearMHE (stage-wise window "
                "geometry rebuilt per window under jit)")
        ns, ny = plant.n_state, plant.n_output
        self.plant = plant
        self.window = int(window)
        N = self.window
        if N < 2:
            raise ValueError("window must be >= 2 (stage 0 carries the "
                             "arrival correction)")

        Qw = np.asarray(Qw, np.float64)
        Rv = np.asarray(Rv, np.float64)
        big = 1e4   # inert bound for unconstrained noise components
        wmax = (np.full(ns, big) if w_max is None
                else np.asarray(w_max, np.float64))
        wmin = (np.full(ns, -big) if w_min is None
                else np.asarray(w_min, np.float64))
        if P0 is None:
            # steady-state one-step prediction covariance (the shared
            # filter-DARE solver; raises on undetectable (A, C))
            from pqp_for_mpc_tpu.models.estimator import filter_dare
            P0 = filter_dare(plant.A, plant.C, Qw, Rv)
        P0 = np.asarray(P0, np.float64)
        # arrival cost as stage-0 structure: free bounds, weight P0^-1
        R_stack = np.concatenate(
            [np.linalg.inv(P0)[None],
             np.broadcast_to(np.linalg.inv(Qw), (N - 1, ns, ns))])
        wmax_stack = np.concatenate(
            [np.full((1, ns), big), np.broadcast_to(wmax, (N - 1, ns))])
        wmin_stack = np.concatenate(
            [np.full((1, ns), -big), np.broadcast_to(wmin, (N - 1, ns))])
        # estimation plant: noise is the input, the KNOWN plant input
        # rides the disturbance channel
        f32 = lambda a: np.asarray(a, np.float32)
        eplant = LinearPlant(A=f32(plant.A), B=f32(np.eye(ns)),
                             E=f32(plant.B), C=f32(plant.C),
                             name=plant.name + "_mhe")
        # The estimate is invariant to a UNIFORM scaling of (Qy, R) —
        # but the gap certification is not: inverse covariances put the
        # raw objective at O(1/Rv) (~1e4 for percent-level sensors),
        # which drives the absolute gap tolerance below the float32
        # floor and stalls the solve at 50k iters.  Normalize so the
        # largest weight entry is 1.
        Qy64 = np.linalg.inv(Rv)
        scale = 1.0 / max(np.abs(Qy64).max(), np.abs(R_stack).max())
        spec = MPCSpec(
            plant=eplant, horizon=N,
            Qy=scale * Qy64, R=scale * R_stack,
            r=np.zeros(ny, np.float32),
            u_min=wmin_stack.astype(np.float32),
            u_max=wmax_stack.astype(np.float32),
            # noise has no slew physics — keep the rows inert
            du_max=np.full(ns, 4 * big, np.float32),
            y_min=None if y_min is None else np.asarray(y_min, np.float32),
            y_max=None if y_max is None else np.asarray(y_max, np.float32))
        from pqp_for_mpc_tpu.config import MPC_CONFIG
        self.cfg = MPC_CONFIG if cfg is None else cfg
        self.spec = spec
        self.data = condense(spec)          # r = 0: Fp3 = 0, Mp4..6 = 0
        self.Qp = self.data.qp()
        self._geom = dual_geometry(self.data.Gp, self.data.Qp_inv,
                                   theta_floor=self.cfg.theta_floor,
                                   precision=self.cfg.precision)

        # measurement-dependent forcing maps (host f64 build, f32 on
        # device) — the rbar-linear terms of mpc._condense's algebra
        Sx, Su, Sd = _prediction_matrices_f64(eplant, N)
        C64 = np.asarray(plant.C, np.float64)
        Cs = np.kron(np.eye(N), C64)
        Qbar = _stage_weight_diag(scale * Qy64, N, ny, "Qy")
        CSu, CSx, CSd = Cs @ Su, Cs @ Sx, Cs @ Sd
        j32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
        self._L3 = j32(2.0 * CSu.T @ Qbar)      # Fp3  = L3 @ rbar
        self._L4 = j32(-8.0 * CSx.T @ Qbar)     # Mp4  = L4 @ rbar
        self._L5 = j32(-8.0 * CSd.T @ Qbar)     # Mp5  = L5 @ rbar
        self._Q4 = j32(4.0 * Qbar)              # Mp6  = r' Q4 r

        self._A = jnp.asarray(plant.A, jnp.float32)
        self._B = jnp.asarray(plant.B, jnp.float32)
        self.warm_start = warm_start
        self.warm_start_floor = warm_start_floor
        self._Y = None
        self._runs = {}

    # -- one window ------------------------------------------------------

    def _solve_window(self, x_bar, D, rbar, Y0):
        """Assemble the r-dependent forcing on top of the r=0 condensed
        blocks and solve; all inputs flat/unbatched."""
        primal0 = self.data.assemble(x=x_bar, D=D, Qp=self.Qp)
        dFp = self._L3 @ rbar                       # enters as -Fp3
        Mp4r = self._L4 @ rbar
        Mp5r = self._L5 @ rbar
        dMp = 0.5 * (Mp4r @ x_bar + Mp5r @ D + rbar @ (self._Q4 @ rbar))
        primal = dataclasses.replace(
            primal0,
            Fp=primal0.Fp - (dFp[:, None] if primal0.Fp.ndim == 2
                             else dFp),
            Mp=primal0.Mp + dMp)
        dual = dualize_forcing(self._geom, primal.Fp, primal.Mp,
                               primal.Kp, precision=self.cfg.precision)
        return solve_batched(primal, dual, Y0=Y0, cfg=self.cfg)

    def _roll(self, x_bar, W, u_win):
        """State trajectory from the arrival state, the solved noise
        sequence ``W (N, ns)`` and the known inputs ``u_win (N, nu)``;
        returns ``xs (N, ns)`` = x_{t-N+1} .. x_t."""
        def f(x, inp):
            w, u = inp
            xn = self._A @ x + w + self._B @ u
            return xn, xn
        _, xs = lax.scan(f, x_bar, (W, u_win))
        return xs

    def step(self, x_bar, u_win, y_win):
        """Solve one window.  ``x_bar (ns,)`` arrival state,
        ``u_win (N, nu)`` known inputs, ``y_win (N, ny)`` measurements
        (slot k holds u/y of window stage k).  Returns
        ``(x_hat, xs, SolveResult)`` with ``x_hat = xs[-1]`` the current
        state estimate."""
        ns = self.plant.n_state
        N = self.window
        x_bar = jnp.asarray(x_bar, jnp.float32).reshape(-1)
        u_win = jnp.asarray(u_win, jnp.float32).reshape(N, -1)
        y_win = jnp.asarray(y_win, jnp.float32).reshape(N, -1)
        Y0 = None
        if self.warm_start and self._Y is not None:
            Y0 = jnp.maximum(self._Y, self.warm_start_floor)
        res = self._solve_window(x_bar, u_win.reshape(-1),
                                 y_win.reshape(-1), Y0)
        if self.warm_start:
            self._Y = res.Y
        W = res.U
        W = (W[:, 0] if W.ndim == 2 else W).reshape(N, ns)
        xs = self._roll(x_bar, W, u_win)
        return xs[-1], xs, res

    def reset(self):
        self._Y = None

    # -- compiled sliding-window record run --------------------------------

    def run(self, x_bar0, u_seq, y_seq):
        """Estimate over a whole record in ONE compiled scan:
        ``u_seq (T, nu)``, ``y_seq (T, ny)`` with ``T >= window``.
        Window k covers samples ``k .. k+N-1``; the arrival recursion
        advances ``x_bar`` by the first smoothed state each slide and
        the dual warm start carries between windows.

        Returns dict: ``x_hat (T-N+1, ns)`` (estimate of the state at
        each window end), iters, converged.
        """
        N = self.window
        u_seq = jnp.asarray(u_seq, jnp.float32)
        y_seq = jnp.asarray(y_seq, jnp.float32)
        T = y_seq.shape[0]
        if u_seq.shape[0] != T or T < N:
            raise ValueError(f"need matching records with T >= {N}, got "
                             f"u {u_seq.shape[0]} / y {T}")
        steps = T - N + 1
        run = self._runs.get(steps)
        if run is None:
            run = self._build_run(steps)
            self._runs[steps] = run
        idx = jnp.arange(steps)[:, None] + jnp.arange(N)[None, :]
        xh, iters, conv = run(jnp.asarray(x_bar0, jnp.float32),
                              u_seq[idx], y_seq[idx])
        return dict(x_hat=np.asarray(xh), iters=np.asarray(iters),
                    converged=np.asarray(conv))

    def _build_run(self, steps: int):
        ns = self.plant.n_state
        N = self.window
        n_con = self.data.n_con
        cfg = self.cfg
        floor = self.warm_start_floor
        warm = self.warm_start

        def body(carry, wins):
            x_bar, Y = carry
            u_win, y_win = wins
            res = self._solve_window(x_bar, u_win.reshape(-1),
                                     y_win.reshape(-1),
                                     jnp.maximum(Y, floor))
            W = res.U
            W = (W[:, 0] if W.ndim == 2 else W).reshape(N, ns)
            xs = self._roll(x_bar, W, u_win)
            Yn = res.Y if warm else Y
            # arrival advances to the first smoothed state of the window
            return (xs[0], Yn), (xs[-1], res.iters[0], res.converged[0])

        @jax.jit
        def run(x_bar0, u_wins, y_wins):
            init = (x_bar0, jnp.full((n_con, 1), cfg.y0, jnp.float32))
            _, traj = lax.scan(body, init, (u_wins, y_wins))
            return traj

        return run


class NonlinearMHE:
    """Moving-horizon estimation for NONLINEAR (or LTV) dynamics by
    successive linearization — the estimation mirror of
    :class:`~pqp_for_mpc_tpu.models.rti.RTIController`.

    Dynamics ``x_{k+1} = f(x_k, u_k) + w_k`` with additive process
    noise and a linear measurement ``y = C x``.  Each window solve
    linearizes ``f`` along the nominal trajectory implied by the
    current noise estimate, maps the window onto the framework's
    stage-wise MPC machinery under the usual MHE identification
    {noise w -> input (B = I), known input + affine remainder
    ``f(xbar, u) - A xbar`` -> disturbance channel (E = I),
    measurement y_k -> per-stage reference r_k}, and solves the
    constrained QP matrix-free.  The geometry refresh is
    :func:`~pqp_for_mpc_tpu.models.stagewise.relinearize` — pure jnp —
    so a whole window step (Jacobians -> Riccati -> split -> PQP solve
    -> nonlinear re-roll) compiles into ONE XLA graph, and
    :meth:`run` slides the window over a record in one ``lax.scan``.

    Where the steady-state Kalman filter (models/estimator.py) freezes
    ONE linearization, this estimator re-linearizes along the estimated
    trajectory every window AND honors noise bounds — on a swinging
    pendulum measured by angle only, the origin-linearized KF diverges
    from the true velocity while this tracks it (pinned in
    tests/test_mhe.py).  The reference has no estimator of any kind —
    its state arrives by file (PQP_CPU.c:757-930).

    Arrival handling mirrors :class:`MovingHorizonEstimator`: stage 0's
    noise rides free of the bounds, weighted by ``P0^-1`` (one-step
    prediction covariance of the INITIAL linearization by default), and
    the recursion advances the arrival state by each window's first
    smoothed state.

    ``f_disc``: traceable ``(x (ns,), u (nu,)) -> x_next (ns,)``.
    ``sqp_iters``: linearize+solve passes per window (1 = classic RTI
    pacing; 2 helps when the trajectory bends fast within a window).
    """

    def __init__(self, f_disc, C, window: int, Qw, Rv,
                 w_min=None, w_max=None, y_min=None, y_max=None,
                 P0=None, cfg=None,
                 sqp_iters: int = 1, band: Optional[int] = None,
                 x_lin=None, u_lin=None,
                 warm_start: bool = True, warm_start_floor: float = 1e-6):
        from pqp_for_mpc_tpu.config import MPC_CONFIG
        from pqp_for_mpc_tpu.models.plants import LTVPlant
        from pqp_for_mpc_tpu.models.stagewise import stagewise_dual

        C = np.asarray(C, np.float64)
        ny, ns = C.shape
        N = int(window)
        if N < 2:
            raise ValueError("window must be >= 2 (stage 0 carries the "
                             "arrival correction)")
        self.f_disc = f_disc
        self.window = N
        self.sqp_iters = int(sqp_iters)
        self.warm_start = warm_start
        self.warm_start_floor = warm_start_floor

        # initial linearization point (defaults to the origin)
        x0 = jnp.zeros(ns, jnp.float32) if x_lin is None else \
            jnp.asarray(x_lin, jnp.float32)
        if u_lin is None:
            raise ValueError("pass u_lin (a representative known-input "
                             "vector, e.g. np.zeros(nu)) — the input "
                             "dimension cannot be inferred from f_disc")
        u0 = jnp.asarray(u_lin, jnp.float32)
        A0 = np.asarray(jax.jacobian(f_disc, argnums=0)(x0, u0),
                        np.float64)

        Qw = np.asarray(Qw, np.float64)
        Rv = np.asarray(Rv, np.float64)
        big = 1e4
        wmax = (np.full(ns, big) if w_max is None
                else np.asarray(w_max, np.float64))
        wmin = (np.full(ns, -big) if w_min is None
                else np.asarray(w_min, np.float64))
        if P0 is None:
            # arrival prior from the INITIAL linearization's filter
            # DARE (the shared solver; raises on undetectable (A0, C))
            from pqp_for_mpc_tpu.models.estimator import filter_dare
            P0 = filter_dare(A0, C, Qw, Rv)
        P0 = np.asarray(P0, np.float64)

        R_stack = np.concatenate(
            [np.linalg.inv(P0)[None],
             np.broadcast_to(np.linalg.inv(Qw), (N - 1, ns, ns))])
        wmax_stack = np.concatenate(
            [np.full((1, ns), big), np.broadcast_to(wmax, (N - 1, ns))])
        wmin_stack = np.concatenate(
            [np.full((1, ns), -big), np.broadcast_to(wmin, (N - 1, ns))])
        Qy64 = np.linalg.inv(Rv)
        # same normalization (and rationale) as MovingHorizonEstimator
        scale = 1.0 / max(np.abs(Qy64).max(), np.abs(R_stack).max())

        f32 = lambda a: np.asarray(a, np.float32)
        eye = np.broadcast_to(np.eye(ns), (N, ns, ns))
        eplant = LTVPlant(A=f32(np.broadcast_to(A0, (N, ns, ns))),
                          B=f32(eye), E=f32(eye),
                          C=f32(np.broadcast_to(C, (N, ny, ns))),
                          name="nonlinear_mhe")
        # y_min/y_max: hard bounds on the MEASURED OUTPUT of the
        # estimated trajectory (physically-known sensor/state ranges a
        # Gaussian filter cannot express) — the stage-wise path takes
        # them matrix-free, same as MovingHorizonEstimator's surface
        spec = MPCSpec(
            plant=eplant, horizon=N,
            Qy=scale * Qy64, R=scale * R_stack,
            r=np.zeros(ny, np.float32),
            u_min=wmin_stack.astype(np.float32),
            u_max=wmax_stack.astype(np.float32),
            du_max=np.full(ns, 4 * big, np.float32),
            y_min=None if y_min is None else np.asarray(y_min, np.float32),
            y_max=None if y_max is None else np.asarray(y_max, np.float32))
        self.cfg = MPC_CONFIG if cfg is None else cfg
        self.spec = spec
        self._sd0 = stagewise_dual(spec, theta_floor=self.cfg.theta_floor,
                                   band=band)
        self._B_eye = jnp.asarray(eye, jnp.float32)
        self._C = jnp.asarray(C, jnp.float32)
        self._ns, self._ny = ns, ny
        self._Y = None
        self._W = None
        self._runs = {}

    @property
    def band(self) -> int:
        return self._sd0.band

    def reset(self):
        self._Y = None
        self._W = None

    # -- one window (pure jnp) --------------------------------------------

    def _window_core(self, x_bar, u_win, y_win, W, Y):
        """One window solve with ``sqp_iters`` relinearization passes.
        All inputs jnp: ``x_bar (ns,)``, ``u_win (N, nu)``,
        ``y_win (N, ny)``, ``W (N, ns)`` noise warm start, ``Y
        (n_con, 1)`` dual warm start.  Returns ``(xs, W, Y, res)``."""
        from pqp_for_mpc_tpu.models.stagewise import (relinearize,
                                                      solve_stagewise)
        f_disc = self.f_disc
        N, ns = self.window, self._ns
        res = None

        def jac_x(x, u):
            return jax.jacobian(f_disc, argnums=0)(x, u)

        for _ in range(self.sqp_iters):
            # nominal trajectory ENTERING each stage under the current
            # noise estimate: xbar_0 = x_bar
            def prop(x, inp):
                u, w = inp
                return f_disc(x, u) + w, x
            _, xbars = lax.scan(prop, x_bar, (u_win, W))   # (N, ns)
            A = jax.vmap(jac_x)(xbars, u_win)              # (N, ns, ns)
            # known forcing: f(xbar, u) - A xbar rides the disturbance
            # channel (E = I) — includes B u and the affine remainder
            d = (jax.vmap(f_disc)(xbars, u_win)
                 - jnp.einsum("kij,kj->ki", A, xbars))     # (N, ns)
            sd = relinearize(self._sd0, A, self._B_eye, r=y_win)
            Y0 = (jnp.maximum(Y, self.warm_start_floor)
                  if self.warm_start else None)
            res = solve_stagewise(sd, x_bar[:, None],
                                  dseq=d[:, :, None], Y0=Y0,
                                  cfg=self.cfg)
            W = res.U[:, 0].reshape(N, ns)
            Y = res.Y

        # smoothed states from the NONLINEAR roll with the solved noise
        def roll(x, inp):
            u, w = inp
            xn = f_disc(x, u) + w
            return xn, xn
        _, xs = lax.scan(roll, x_bar, (u_win, W))          # x_1..x_N
        return xs, W, Y, res

    def step(self, x_bar, u_win, y_win):
        """Solve one window eagerly (host API).  Returns
        ``(x_hat, xs, SolveResult)``; carries noise/dual warm starts."""
        N, ns = self.window, self._ns
        x_bar = jnp.asarray(x_bar, jnp.float32).reshape(-1)
        u_win = jnp.asarray(u_win, jnp.float32).reshape(N, -1)
        y_win = jnp.asarray(y_win, jnp.float32).reshape(N, -1)
        W = (jnp.zeros((N, ns), jnp.float32) if self._W is None
             else self._W)
        Y = (jnp.full((self._sd0.n_con, 1), self.cfg.y0, jnp.float32)
             if self._Y is None else self._Y)
        xs, W, Y, res = self._window_core(x_bar, u_win, y_win, W, Y)
        if self.warm_start:
            # shift the noise plan one slide forward for the next window
            self._W = jnp.concatenate([W[1:], W[-1:]])
            self._Y = Y
        return xs[-1], xs, res

    # -- compiled sliding-window record run ---------------------------------

    def run(self, x_bar0, u_seq, y_seq):
        """Estimate over a whole record in ONE compiled scan (same
        contract as :meth:`MovingHorizonEstimator.run`)."""
        N = self.window
        u_seq = jnp.asarray(u_seq, jnp.float32)
        y_seq = jnp.asarray(y_seq, jnp.float32)
        T = y_seq.shape[0]
        if u_seq.shape[0] != T or T < N:
            raise ValueError(f"need matching records with T >= {N}, got "
                             f"u {u_seq.shape[0]} / y {T}")
        steps = T - N + 1
        run = self._runs.get(steps)
        if run is None:
            run = self._build_run(steps)
            self._runs[steps] = run
        idx = jnp.arange(steps)[:, None] + jnp.arange(N)[None, :]
        xh, iters, conv = run(jnp.asarray(x_bar0, jnp.float32),
                              u_seq[idx], y_seq[idx])
        return dict(x_hat=np.asarray(xh), iters=np.asarray(iters),
                    converged=np.asarray(conv))

    def _build_run(self, steps: int):
        N, ns = self.window, self._ns
        n_con = self._sd0.n_con
        cfg = self.cfg
        warm = self.warm_start

        def body(carry, wins):
            x_bar, W, Y = carry
            u_win, y_win = wins
            xs, Wn, Yn, res = self._window_core(x_bar, u_win, y_win,
                                                W, Y)
            if warm:
                W_next = jnp.concatenate([Wn[1:], Wn[-1:]])
                Y_next = Yn
            else:
                W_next, Y_next = W, Y
            return (xs[0], W_next, Y_next), (xs[-1], res.iters[0],
                                             res.converged[0])

        @jax.jit
        def run(x_bar0, u_wins, y_wins):
            init = (x_bar0, jnp.zeros((N, ns), jnp.float32),
                    jnp.full((n_con, 1), cfg.y0, jnp.float32))
            _, traj = lax.scan(body, init, (u_wins, y_wins))
            return traj

        return run
