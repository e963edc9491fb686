"""Offset-free MPC: disturbance-augmented estimation + target tracking.

A linear MPC tracking a constant reference has steady-state offset
whenever the real plant differs from the prediction model (unmeasured
constant disturbances, parameter mismatch): the controller plans for a
plant that is not the one being actuated.  The textbook fix
(Pannocchia & Rawlings, AIChE J. 2003; Maeder, Borrelli & Morari,
Automatica 2009) is a three-piece loop:

1. **Disturbance-augmented estimation** — model a fictitious constant
   disturbance ``d`` entering the state update (``Bd d``) and/or the
   output (``Cd d``), and estimate ``(x, d)`` jointly with a Kalman
   filter on the augmented plant (:func:`augment_plant` +
   :class:`~pqp_for_mpc_tpu.models.estimator.KalmanFilter`);
2. **Target calculation** — per step, solve the steady-state equations
   for the state/input pair ``(x_ss, u_ss)`` that holds the output at
   the reference GIVEN the current disturbance estimate
   (:func:`target_maps`: one host-precomputed linear map, so the
   per-step "solve" is two tiny matvecs — fully traceable);
3. **Deviation MPC** — run the PQP solve in deviation coordinates
   ``z = x - x_ss``, ``v = u - u_ss`` (reference zero; box bounds
   shifted by ``u_ss``, output bounds by ``y_ss``, slew rows unchanged
   — first differences are shift-invariant).  All shifts are additive
   updates of the per-step bound vector, exactly the machinery the
   receding-horizon loop already uses for ``u_prev``
   (models/mpc.py ``kp_of``), so the dual geometry (Qd, θ, splits /
   Riccati factor) is still built once and reused every step.

The reference has no estimator and no targets — its state arrives by
file (``input()``, PQP_CPU.c:757-930) and its reference is baked into
the precondensed forcing blocks.  This module composes the framework's
own pieces (estimator.py, mpc.py / stagewise.py) into the standard
production-MPC loop; the whole output-feedback closed loop — estimate,
targets, deviation QP, actuation, measurement — compiles into ONE
``lax.scan`` (:meth:`OffsetFreeController.rollout_jit`), something the
reference's main()-per-QP architecture cannot express.

Disturbance-model choice (``kind``):

* ``"output"`` — ``Bd = 0, Cd = I`` (ny disturbances on the measured
  outputs).  Always detectable when the plant has no integrating modes
  (``rank(I - A) = ns``); the classic default.
* ``"input"`` — ``Bd = B, Cd = 0`` (nu disturbances on the actuators).
  Often better conditioned for plants where mismatch enters through
  the inputs; requires the rank condition below.

Either way the augmented estimator is detectable iff ``(A, C)`` is
detectable and ``rank [[I - A, -Bd], [C, Cd]] = ns + nd`` with
``nd <= ny`` (checked at construction with a clear error).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pqp_for_mpc_tpu.dual import dualize_forcing
from pqp_for_mpc_tpu.models.estimator import KalmanFilter
from pqp_for_mpc_tpu.models.mpc import MPCController, MPCSpec
from pqp_for_mpc_tpu.models.plants import LinearPlant
from pqp_for_mpc_tpu.solver import solve_batched


def disturbance_channels(plant: LinearPlant, kind: str = "output",
                         Bd=None, Cd=None):
    """Resolve the disturbance-model channels ``(Bd (ns, nd),
    Cd (ny, nd))`` from a named ``kind`` or explicit matrices
    (explicit ones win; missing one defaults to zeros)."""
    ns, nu, ny = plant.n_state, plant.n_input, plant.n_output
    if Bd is None and Cd is None:
        if kind == "output":
            Bd = np.zeros((ns, ny))
            Cd = np.eye(ny)
        elif kind == "input":
            Bd = np.asarray(plant.B, np.float64)
            Cd = np.zeros((ny, nu))
        else:
            raise ValueError(f"unknown disturbance kind {kind!r} "
                             "(use 'output', 'input', or pass Bd/Cd)")
    else:
        nd = (np.asarray(Bd).shape[1] if Bd is not None
              else np.asarray(Cd).shape[1])
        Bd = (np.zeros((ns, nd)) if Bd is None
              else np.asarray(Bd, np.float64))
        Cd = (np.zeros((ny, nd)) if Cd is None
              else np.asarray(Cd, np.float64))
    Bd = np.asarray(Bd, np.float64)
    Cd = np.asarray(Cd, np.float64)
    if Bd.shape[0] != ns or Cd.shape[0] != ny or Bd.shape[1] != Cd.shape[1]:
        raise ValueError(f"disturbance channel shapes Bd {Bd.shape} / "
                         f"Cd {Cd.shape} inconsistent with plant "
                         f"(ns={ns}, ny={ny})")
    return Bd, Cd


def augment_plant(plant: LinearPlant, Bd, Cd) -> LinearPlant:
    """Disturbance-augmented plant for the estimator:
    state ``[x; d]`` with ``d`` a random-walk constant —
    ``A_aug = [[A, Bd], [0, I]]``, ``C_aug = [C, Cd]``."""
    A = np.asarray(plant.A, np.float64)
    B = np.asarray(plant.B, np.float64)
    E = np.asarray(plant.E, np.float64)
    C = np.asarray(plant.C, np.float64)
    if A.ndim != 2:
        raise ValueError("augment_plant needs an LTI plant")
    ns, nd = Bd.shape
    A_aug = np.block([[A, Bd], [np.zeros((nd, ns)), np.eye(nd)]])
    B_aug = np.vstack([B, np.zeros((nd, plant.n_input))])
    E_aug = np.vstack([E, np.zeros((nd, plant.n_dist))])
    C_aug = np.hstack([C, Cd])
    f32 = lambda m: np.asarray(m, np.float32)
    return LinearPlant(f32(A_aug), f32(B_aug), f32(E_aug), f32(C_aug),
                       name=plant.name + "_aug")


def check_offset_free_rank(plant: LinearPlant, Bd, Cd):
    """The Pannocchia-Rawlings detectability condition for the
    augmented estimator: ``nd <= ny`` and
    ``rank [[I - A, -Bd], [C, Cd]] = ns + nd``.  Raises ValueError
    with the measured rank on failure."""
    ns, ny = plant.n_state, plant.n_output
    nd = Bd.shape[1]
    if nd > ny:
        raise ValueError(f"offset-free disturbance model has nd={nd} > "
                         f"ny={ny} disturbances — at most one per "
                         "measured output is estimable")
    A = np.asarray(plant.A, np.float64)
    C = np.asarray(plant.C, np.float64)
    T = np.block([[np.eye(ns) - A, -Bd], [C, Cd]])
    rank = np.linalg.matrix_rank(T)
    if rank < ns + nd:
        raise ValueError(
            f"augmented disturbance model undetectable: "
            f"rank [[I-A, -Bd],[C, Cd]] = {rank} < ns + nd = {ns + nd} "
            "(integrating plant modes overlapping the disturbance "
            "channels? try kind='input' or fewer disturbances)")


def target_maps(plant: LinearPlant, Bd, Cd):
    """Precompute the steady-state target map (host, float64):

        [[A - I, B], [C, 0]] [x_ss; u_ss] = [-Bd d; r - Cd d]

    so per step ``[x_ss; u_ss] = Gd @ d_hat + Gr @ r``.  Square systems
    (ny == nu, invertible) solve exactly; otherwise the pseudo-inverse
    gives the least-squares target (ny > nu: closest reachable output;
    ny < nu: minimum-norm input).  Returns float32 ``(Gd, Gr)``.
    """
    A = np.asarray(plant.A, np.float64)
    B = np.asarray(plant.B, np.float64)
    C = np.asarray(plant.C, np.float64)
    ns, nu, ny = plant.n_state, plant.n_input, plant.n_output
    T = np.block([[A - np.eye(ns), B], [C, np.zeros((ny, nu))]])
    Rd = np.vstack([-Bd, -Cd])                      # (ns+ny, nd)
    Rr = np.vstack([np.zeros((ns, ny)), np.eye(ny)])
    if ny == nu and np.linalg.cond(T) < 1e12:
        Ti = np.linalg.inv(T)
    else:
        Ti = np.linalg.pinv(T)
    return ((Ti @ Rd).astype(np.float32), (Ti @ Rr).astype(np.float32))


class OffsetFreeController:
    """Output-feedback offset-free MPC (see module docstring).

    Wraps an :class:`~pqp_for_mpc_tpu.models.mpc.MPCController` built
    on the deviation problem (``spec`` with reference zero) plus the
    augmented Kalman filter and the target map.  ``spec.r`` must be a
    constant ``(ny,)`` reference (per-stage trajectories have no
    steady-state target).

    Eager surface (user-driven loops):

    * ``estimator.step(xa, u, y_next)`` — augmented estimate update;
    * :meth:`targets` — ``d_hat -> (x_ss, u_ss)``;
    * :meth:`control` — ``(x_hat, d_hat, u_prev) -> (u, SolveResult)``
      (warm-started like ``MPCController.step``).

    Compiled surface: :meth:`rollout_jit` runs the entire closed loop
    (truth simulation with a constant true disturbance through the
    model channels, measurement [+ optional noise], estimation,
    targets, deviation solve, actuation) in one ``lax.scan``.
    """

    def __init__(self, spec: MPCSpec, kind: str = "output",
                 Bd=None, Cd=None, Qw=None, Rv=None,
                 cfg=None, backend: str = "condensed",
                 warm_start="shift", warm_start_floor: float = 1e-6,
                 cold_start_y0: Optional[float] = None,
                 retry_cold: bool = False):
        r = np.asarray(spec.r, np.float64)
        if r.ndim != 1:
            raise ValueError("offset-free MPC needs a constant (ny,) "
                             "reference — a per-stage trajectory has no "
                             "steady-state target")
        plant = spec.plant
        if np.asarray(plant.A).ndim == 3:
            raise NotImplementedError("offset-free MPC needs an LTI "
                                      "plant (LTV loops relinearize per "
                                      "step — see models/rti.py)")
        Bd64, Cd64 = disturbance_channels(plant, kind, Bd, Cd)
        check_offset_free_rank(plant, Bd64, Cd64)
        nd = Bd64.shape[1]

        # Deviation problem: same plant/horizon/weights/bounds,
        # reference 0 and a zero slew anchor (v_prev supplied per step).
        dev_spec = dataclasses.replace(spec, r=np.zeros_like(r),
                                       u_prev=None)
        self._ctrl = MPCController(dev_spec, cfg=cfg,
                                   warm_start=warm_start,
                                   cold_start_y0=cold_start_y0,
                                   warm_start_floor=warm_start_floor,
                                   backend=backend,
                                   retry_cold=retry_cold)
        Gd, Gr = target_maps(plant, Bd64, Cd64)
        self._Gd = jnp.asarray(Gd)
        self._Gr = jnp.asarray(Gr)
        self._r = jnp.asarray(r, jnp.float32)
        self._Bd = jnp.asarray(Bd64, jnp.float32)
        self._Cd = jnp.asarray(Cd64, jnp.float32)
        self._C = jnp.asarray(plant.C, jnp.float32)
        self.n_dist_model = nd

        ns, ny = plant.n_state, plant.n_output
        if Qw is None:
            # default augmented process noise: small on the physical
            # state, larger on the disturbance walk so d_hat tracks
            # step disturbances within a few filter time constants
            Qw = np.diag(np.concatenate([np.full(ns, 1e-4),
                                         np.full(nd, 1e-2)]))
        if Rv is None:
            Rv = 1e-4 * np.eye(ny)
        self.estimator = KalmanFilter(augment_plant(plant, Bd64, Cd64),
                                      Qw, Rv)
        self._Y = None
        self._rollouts = {}

    # -- traceable pieces ------------------------------------------------

    def targets(self, d_hat: jax.Array):
        """Steady-state target ``(x_ss, u_ss)`` for the current
        disturbance estimate (two matvecs; jittable)."""
        ns = self._ctrl.spec.plant.n_state
        t = self._Gd @ d_hat + self._Gr @ self._r
        return t[:ns], t[ns:]

    def _dev_solve(self, z, u_ss, v_prev, y_ss, Y0, D=None):
        """Deviation-coordinates PQP solve: reference-zero problem with
        box rows shifted by ``u_ss``, slew anchor at ``v_prev`` and (if
        present) output rows shifted by ``y_ss``.  All shifts are
        additive bound updates — the dual geometry is reused.  ``D``:
        optional flat ``(H * nd,)`` KNOWN-disturbance preview window
        through the plant's E channel (shift-invariant, so it enters
        the deviation problem unchanged)."""
        c = self._ctrl
        retry = c.retry_cold and Y0 is not None
        if c.backend == "stagewise":
            from pqp_for_mpc_tpu.models.stagewise import solve_stagewise
            sd0 = c._sd
            # Kp layout (4, H, nu): [umax, -umin, dmax + e1 up, dmax - e1 up]
            Kp = sd0.Kp.at[0].add(-u_ss).at[1].add(u_ss)
            Kp = Kp.at[2, 0].add(v_prev).at[3, 0].add(-v_prev)
            repl = dict(Kp=Kp, u_prev=v_prev)
            if sd0.has_y:
                repl["y_max"] = sd0.y_max - y_ss
                repl["y_min"] = sd0.y_min - y_ss
            sd = dataclasses.replace(sd0, **repl)
            z2 = z if z.ndim == 2 else z[:, None]
            dseq = None
            if D is not None:
                dseq = D.reshape(c.spec.horizon,
                                 c.spec.plant.n_dist)[..., None]
            return solve_stagewise(sd, z2, dseq=dseq, Y0=Y0, cfg=c.cfg,
                                   retry_cold=retry)
        data = c.data
        H, nu = c.spec.horizon, c.spec.plant.n_input
        ny = c.spec.plant.n_output
        Hv = c._Hv           # move blocking shrinks the input groups
        M = Hv * nu
        tss = jnp.tile(u_ss, Hv)
        Kp = data.Kp.at[:M].add(-tss).at[M:2 * M].add(tss)
        e1 = jnp.zeros(M, jnp.float32).at[:nu].set(v_prev)
        Kp = Kp.at[2 * M:3 * M].add(e1).at[3 * M:4 * M].add(-e1)
        if data.Kx is not None:
            # output rows sit right after the 4M input rows; slack-
            # positivity rows (soft mode) follow and are shift-free
            ty = jnp.tile(y_ss, H)
            b = 4 * M
            Kp = Kp.at[b:b + H * ny].add(-ty) \
                   .at[b + H * ny:b + 2 * H * ny].add(ty)
        d2 = dataclasses.replace(data, Kp=Kp)
        nd = c.spec.plant.n_dist
        D0 = jnp.zeros(H * nd, jnp.float32) if D is None else D
        primal = d2.assemble(x=z, D=D0, Qp=c.Qp)
        dual = dualize_forcing(c._geom, primal.Fp, primal.Mp, primal.Kp,
                               precision=c.cfg.precision)
        return solve_batched(primal, dual, Y0=Y0, cfg=c.cfg,
                             retry_cold=retry)

    # -- eager surface ---------------------------------------------------

    def control(self, x_hat, d_hat, u_prev=None):
        """One offset-free control computation from the current
        estimates; returns ``(u, SolveResult)`` with ``u`` in ORIGINAL
        input coordinates (``v* + u_ss``)."""
        c = self._ctrl
        nu = c.spec.plant.n_input
        x_hat = jnp.asarray(x_hat, jnp.float32).reshape(-1)
        d_hat = jnp.asarray(d_hat, jnp.float32).reshape(-1)
        up = (jnp.zeros(nu, jnp.float32) if u_prev is None
              else jnp.asarray(u_prev, jnp.float32).reshape(-1))
        x_ss, u_ss = self.targets(d_hat)
        y_ss = self._C @ x_ss + self._Cd @ d_hat
        Y0 = None
        if c.warm_start and self._Y is not None:
            Yw = self._Y
            if c.warm_start == "shift":
                Yw = c._shift_multipliers(Yw)
            Y0 = jnp.maximum(Yw, c.warm_start_floor)
        res = self._dev_solve(x_hat - x_ss, u_ss, up - u_ss, y_ss, Y0)
        if c.warm_start:
            self._Y = res.Y
        v0 = res.U[:nu]
        v0 = v0[:, 0] if v0.ndim == 2 else v0
        return v0 + u_ss, res

    def reset(self):
        self._Y = None
        self._ctrl.reset()

    # -- compiled closed loop ---------------------------------------------

    def rollout_jit(self, x0, steps: int, d_true,
                    x_hat0=None, d_hat0=None, meas_noise=None,
                    w_seq=None, d_forecast=None):
        """Fully-jitted output-feedback closed loop: one ``lax.scan``
        over {targets -> deviation solve -> actuate -> simulate truth
        with the constant disturbance ``d_true`` through the model
        channels -> measure (+ ``meas_noise[t]`` if given) -> estimate}.

        Production composition hooks (tests/test_composition.py — the
        full stack {robust tightening + offset-free + estimator +
        preview} rides this one scan):

        * ``w_seq (steps, ns)`` — additive process disturbance on the
          TRUE state update (the robust tube's ``|w| <= w_box``; pair
          with a :func:`~pqp_for_mpc_tpu.models.robust.robust_spec`-
          tightened spec to keep the ORIGINAL bounds under it);
        * ``d_forecast (steps + H, nd)`` — KNOWN-disturbance preview
          through the plant's E channel, windowed per step exactly like
          :meth:`MPCController.rollout_jit`; the truth propagates with
          ``E d_forecast[t]``.

        Returns stacked trajectories: x (truth), y (measurements),
        u, d_hat, iters, converged.
        """
        plant = self._ctrl.spec.plant
        H = self._ctrl.spec.horizon
        key = (steps, w_seq is not None, d_forecast is not None)
        run = self._rollouts.get(key)
        if run is None:
            run = self._build_rollout(steps, with_w=w_seq is not None,
                                      with_preview=d_forecast is not None)
            self._rollouts[key] = run
        x0 = jnp.asarray(x0, jnp.float32)
        xh = x0 if x_hat0 is None else jnp.asarray(x_hat0, jnp.float32)
        dh = (jnp.zeros(self.n_dist_model, jnp.float32) if d_hat0 is None
              else jnp.asarray(d_hat0, jnp.float32))
        xa0 = jnp.concatenate([xh, dh])
        dt = jnp.asarray(d_true, jnp.float32).reshape(-1)
        nz = (jnp.zeros((steps, plant.n_output), jnp.float32)
              if meas_noise is None
              else jnp.asarray(meas_noise, jnp.float32))
        args = [x0, xa0, dt, nz]
        if w_seq is not None:
            args.append(jnp.asarray(w_seq, jnp.float32).reshape(
                steps, plant.n_state))
        if d_forecast is not None:
            df = jnp.asarray(d_forecast, jnp.float32).reshape(
                -1, plant.n_dist)
            if df.shape[0] < steps + H:
                raise ValueError(f"d_forecast needs {steps + H} rows "
                                 f"(steps + horizon), got {df.shape[0]}")
            idx = jnp.arange(steps)[:, None] + jnp.arange(H)[None, :]
            args.append(df[idx])
        xs, ys, us, dhs, iters, conv = run(*args)
        return dict(x=np.asarray(xs), y=np.asarray(ys), u=np.asarray(us),
                    d_hat=np.asarray(dhs), iters=np.asarray(iters),
                    converged=np.asarray(conv))

    def _build_rollout(self, steps: int, with_w: bool = False,
                       with_preview: bool = False):
        c = self._ctrl
        plant = c.spec.plant
        ns, nu = plant.n_state, plant.n_input
        A = jnp.asarray(plant.A, jnp.float32)
        B = jnp.asarray(plant.B, jnp.float32)
        Em = jnp.asarray(plant.E, jnp.float32)
        C, Bd, Cd = self._C, self._Bd, self._Cd
        kf = self.estimator
        floor = c.warm_start_floor
        warm = c.warm_start
        N = c.data.n_con if c.backend == "condensed" else c._sd.n_con
        Y_cold = jnp.full((N, 1), c.cfg.y0, jnp.float32)

        def step(carry, noise_t, d_true, w_t, win):
            x, xa, u_prev, Y = carry
            x_hat, d_hat = xa[:ns], xa[ns:]
            x_ss, u_ss = self.targets(d_hat)
            y_ss = C @ x_ss + Cd @ d_hat
            D = None if win is None else win.reshape(-1)
            res = self._dev_solve(x_hat - x_ss, u_ss, u_prev - u_ss,
                                  y_ss, jnp.maximum(Y, floor), D=D)
            v0 = res.U[:nu]
            u0 = (v0[:, 0] if v0.ndim == 2 else v0) + u_ss
            xn = A @ x + B @ u0 + Bd @ d_true
            if w_t is not None:
                xn = xn + w_t
            if win is not None:
                xn = xn + Em @ win[0]
            yn = C @ xn + Cd @ d_true + noise_t
            # the estimator sees the previewed disturbance as a known
            # input through the AUGMENTED plant's E channel
            xan = kf.step(xa, u0, yn,
                          d=None if win is None else win[0])
            if warm == "shift":
                Yn = c._shift_multipliers(res.Y)
            elif warm:
                Yn = res.Y
            else:
                Yn = Y_cold
            return ((xn, xan, u0, Yn),
                    (xn, yn, u0, xan[ns:], res.iters[0], res.converged[0]))

        @jax.jit
        def run(x0, xa0, d_true, noises, *extra):
            ws = extra[0] if with_w else None
            wins = extra[-1] if with_preview else None
            init = (x0, xa0, jnp.zeros(nu, jnp.float32), Y_cold)

            def body(cy, scanned):
                i = 1
                nz = scanned[0]
                w_t = scanned[i] if with_w else None
                i += int(with_w)
                win = scanned[i] if with_preview else None
                return step(cy, nz, d_true, w_t, win)

            scanned = (noises,) + tuple(
                a for a in (ws, wins) if a is not None)
            _, traj = lax.scan(body, init, scanned)
            return traj

        return run
