"""Quadrotor trajectory-tracking optimal control (BASELINE config 2; the
optimal-control frontier the reference serves through its OptimalControl.jl
bridge, /root/reference/ext/ExaModelsOptimalControl.jl).

Standard 9-state/4-control quadcopter tracking model (as used in the
MadNLP/ExaModels GPU literature): states r = (x,y,z) position,
v = (vx,vy,vz) velocity, attitude (φ, θ, ψ); controls u1 = total thrust
magnitude and attitude rates (u2, u3, u4). Euler discretization with N
intervals over [0, tf]; quadratic tracking + control-effort objective.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.math import cos, sin
from ..nlp.core import ExaCore
from ..nlp.model import ExaModel

__all__ = ["quadrotor_core", "quadrotor_model"]


def quadrotor_core(N: int, *, tf: float = 60.0, dtype=None) -> ExaCore:
    dt = tf / N
    g = 9.8

    # reference trajectory (circular climb)
    ts = dt * np.arange(N + 1)
    x_ref = np.sin(ts / 6.0)
    y_ref = 2.0 * np.sin(ts / 12.0)
    z_ref = ts / 30.0

    c = ExaCore(dtype)
    # state blocks over knots 0..N
    xs = [c.add_var(N + 1, start=0.0, name=n) for n in
          ("x", "y", "z", "vx", "vy", "vz", "phi", "th", "psi")]
    x, y, z, vx, vy, vz, phi, th, psi = xs
    # controls over intervals 0..N-1
    u1 = c.add_var(N, start=g, name="u1")
    u2 = c.add_var(N, start=0.0, name="u2")
    u3 = c.add_var(N, start=0.0, name="u3")
    u4 = c.add_var(N, start=0.0, name="u4")

    # initial conditions
    for s in xs:
        c.add_con(s[0])

    # dynamics (forward Euler), one pattern per state equation
    c.add_con(lambda i: x[i + 1] - x[i] - dt * vx[i], range(N), name="dx")
    c.add_con(lambda i: y[i + 1] - y[i] - dt * vy[i], range(N), name="dy")
    c.add_con(lambda i: z[i + 1] - z[i] - dt * vz[i], range(N), name="dz")
    c.add_con(
        lambda i: vx[i + 1] - vx[i]
        - dt * u1[i] * (cos(phi[i]) * sin(th[i]) * cos(psi[i]) + sin(phi[i]) * sin(psi[i])),
        range(N),
        name="dvx",
    )
    c.add_con(
        lambda i: vy[i + 1] - vy[i]
        - dt * u1[i] * (cos(phi[i]) * sin(th[i]) * sin(psi[i]) - sin(phi[i]) * cos(psi[i])),
        range(N),
        name="dvy",
    )
    c.add_con(
        lambda i: vz[i + 1] - vz[i] - dt * (u1[i] * cos(phi[i]) * cos(th[i]) - g),
        range(N),
        name="dvz",
    )
    c.add_con(
        lambda i: phi[i + 1] - phi[i]
        - dt * (u2[i] * cos(phi[i]) + u3[i] * sin(phi[i])),
        range(N),
        name="dphi",
    )
    c.add_con(
        lambda i: th[i + 1] - th[i]
        - dt * (u2[i] * sin(phi[i]) / cos(th[i]) - u3[i] * cos(phi[i]) / cos(th[i]))
        * (-1.0),
        range(N),
        name="dth",
    )
    c.add_con(
        lambda i: psi[i + 1] - psi[i]
        - dt * (u2[i] * sin(phi[i]) + u3[i] * cos(phi[i])) / cos(th[i]) * 0.0
        - dt * u4[i],
        range(N),
        name="dpsi",
    )

    # tracking + effort objective
    track = {"k": np.arange(N + 1), "xr": x_ref, "yr": y_ref, "zr": z_ref}
    c.add_obj(
        lambda d: 0.5 * (
            (x[d.k] - d.xr) ** 2 + (y[d.k] - d.yr) ** 2 + (z[d.k] - d.zr) ** 2
        ),
        track,
    )
    c.add_obj(
        lambda i: 0.5 * 0.01 * (u1[i] ** 2 + u2[i] ** 2 + u3[i] ** 2 + u4[i] ** 2)
        + 0.5 * 0.1 * (phi[i] ** 2 + th[i] ** 2 + psi[i] ** 2),
        range(N),
    )
    return c


def quadrotor_model(N: int, **kw) -> ExaModel:
    return ExaModel(quadrotor_core(N, **kw))
