"""LTI plant model zoo.

The reference ships exactly one plant, pre-condensed to text files (a
29-state thermal/HVAC-like model, judging by ``example/x.txt`` ~304-308 K
states and ``example/D.txt`` = 312.15 K; SURVEY.md §2.1).  It never
represents the plant itself.  This module provides the plant abstraction
plus a family of standard test plants; :mod:`pqp_for_mpc_tpu.models.mpc`
condenses any of them over an arbitrary horizon — the derivation step the
reference omits (SURVEY.md §5, "long-context" row).

Discrete-time LTI dynamics:  x+ = A x + B u + E d,   y = C x.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class LinearPlant:
    """Discrete-time LTI plant with disturbance input."""

    A: np.ndarray  # (ns, ns)
    B: np.ndarray  # (ns, nu)
    E: np.ndarray  # (ns, nd)
    C: np.ndarray  # (ny, ns)
    name: str = "plant"

    @property
    def n_state(self) -> int:
        return self.A.shape[0]

    @property
    def n_input(self) -> int:
        return self.B.shape[1]

    @property
    def n_dist(self) -> int:
        return self.E.shape[1]

    @property
    def n_output(self) -> int:
        return self.C.shape[0]

    def step(self, x, u, d=None):
        xn = self.A @ x + self.B @ u
        if d is not None:
            xn = xn + self.E @ d
        return xn


def _f32(*arrays):
    return tuple(np.asarray(a, np.float32) for a in arrays)


def double_integrator(dt: float = 0.1) -> LinearPlant:
    """Classic 2-state double integrator (position/velocity, force input)."""
    A = np.array([[1.0, dt], [0.0, 1.0]])
    B = np.array([[0.5 * dt * dt], [dt]])
    E = np.zeros((2, 1))
    C = np.array([[1.0, 0.0]])
    A, B, E, C = _f32(A, B, E, C)
    return LinearPlant(A, B, E, C, name="double_integrator")


def mass_spring_damper(n_masses: int = 3, dt: float = 0.05,
                       k: float = 2.0, c: float = 0.5) -> LinearPlant:
    """Chain of ``n_masses`` unit masses coupled by springs/dampers;
    actuated at every mass, disturbance force at the last mass,
    positions observed.  State = [positions; velocities]."""
    n = n_masses
    K = np.zeros((n, n))
    for i in range(n):
        K[i, i] = -2.0 * k
        if i > 0:
            K[i, i - 1] = k
        if i < n - 1:
            K[i, i + 1] = k
    Cd = K * (c / k)
    Ac = np.block([[np.zeros((n, n)), np.eye(n)], [K, Cd]])
    Bc = np.vstack([np.zeros((n, n)), np.eye(n)])
    Ec = np.zeros((2 * n, 1))
    Ec[-1, 0] = 1.0
    # forward-Euler discretization (adequate for a test plant at small dt)
    A = np.eye(2 * n) + dt * Ac
    B = dt * Bc
    E = dt * Ec
    C = np.hstack([np.eye(n), np.zeros((n, n))])
    A, B, E, C = _f32(A, B, E, C)
    return LinearPlant(A, B, E, C, name=f"mass_spring_{n_masses}")


def thermal_rc(n_rooms: int = 29, n_heaters: int = 7, dt: float = 60.0,
               seed: int = 0) -> LinearPlant:
    """RC-network building thermal model in the spirit of the reference's
    example plant (29 states / 7 inputs / ambient-temperature disturbance).

    Rooms exchange heat along a random sparse adjacency; ``n_heaters``
    heaters each drive one room; the disturbance is the ambient
    temperature coupling into every room.
    """
    rng = np.random.default_rng(seed)
    n = n_rooms
    G = np.zeros((n, n))  # conductances
    order = rng.permutation(n)
    for a, b in zip(order[:-1], order[1:]):  # spanning chain => connected
        g = rng.uniform(0.5, 1.5)
        G[a, b] = G[b, a] = g
    for _ in range(n):  # extra random links
        a, b = rng.integers(0, n, 2)
        if a != b:
            g = rng.uniform(0.1, 0.6)
            G[a, b] = G[b, a] = g
    g_amb = rng.uniform(0.05, 0.2, n)
    cap = rng.uniform(5.0, 15.0, n)  # thermal capacitances
    Ac = np.zeros((n, n))
    for i in range(n):
        Ac[i] = G[i] / cap[i]
        Ac[i, i] = -(G[i].sum() + g_amb[i]) / cap[i]
    heater_rooms = rng.permutation(n)[:n_heaters]
    Bc = np.zeros((n, n_heaters))
    for j, r in enumerate(heater_rooms):
        Bc[r, j] = 1.0 / cap[r]
    Ec = (g_amb / cap)[:, None]
    A = np.eye(n) + dt * Ac
    B = dt * Bc
    E = dt * Ec
    C = np.zeros((n_heaters, n))
    for j, r in enumerate(heater_rooms):
        C[j, r] = 1.0  # observe heated rooms
    A, B, E, C = _f32(A, B, E, C)
    return LinearPlant(A, B, E, C, name=f"thermal_rc_{n}x{n_heaters}")


def random_stable(n_state: int, n_input: int, n_dist: int = 1,
                  n_output: int | None = None, rho: float = 0.95,
                  seed: int = 0) -> LinearPlant:
    """Random discrete-time plant with spectral radius scaled to ``rho``."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n_state, n_state))
    A *= rho / max(abs(np.linalg.eigvals(A)))
    B = rng.standard_normal((n_state, n_input))
    E = rng.standard_normal((n_state, n_dist)) * 0.1
    ny = n_output or min(n_state, n_input)
    C = rng.standard_normal((ny, n_state)) / np.sqrt(n_state)
    A, B, E, C = _f32(A, B, E, C)
    return LinearPlant(A, B, E, C, name=f"random_{n_state}x{n_input}")


ZOO = {
    "double_integrator": double_integrator,
    "mass_spring_damper": mass_spring_damper,
    "thermal_rc": thermal_rc,
    "random_stable": random_stable,
}
