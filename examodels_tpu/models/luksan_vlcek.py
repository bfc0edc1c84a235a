"""Luksan-Vlcek chained problem (the reference's canonical example/benchmark:
"rosenrock" in /root/reference/benchmark/runbenchmark.jl:163-170 and the
docs example /root/reference/docs/src/develop.md:20-58)."""

from __future__ import annotations

import numpy as np

from ..core.math import exp, sin
from ..nlp.core import ExaCore
from ..nlp.model import ExaModel


def luksan_vlcek_core(N: int, *, use_aug: bool = False, dtype=None) -> ExaCore:
    """min Σ_{i=2..N} 100(x_{i-1}² − x_i)² + (x_{i-1} − 1)²
    s.t. 3x_{k+1}³ + 2x_{k+2} − 5 + sin(x_{k+1}−x_{k+2})sin(x_{k+1}+x_{k+2})
         + 4x_{k+1} − x_k e^{x_k−x_{k+1}} − 3 = 0,  k = 1..N−2   (0-based here)
    """
    c = ExaCore(dtype)
    x = c.add_var(
        N,
        start=[(-1.2 if i % 2 == 0 else 1.0) for i in range(N)],
        name="x",
    )
    c.add_obj(
        lambda i: 100.0 * (x[i - 1] ** 2 - x[i]) ** 2 + (x[i - 1] - 1.0) ** 2,
        range(1, N),
    )
    if use_aug:
        con = c.add_con(
            lambda i: 3 * x[i + 1] ** 3 + 2 * x[i + 2] - 5, range(N - 2), name="s"
        )
        c.add_con_aug(
            con,
            lambda i: (
                i,
                sin(x[i + 1] - x[i + 2]) * sin(x[i + 1] + x[i + 2])
                + 4 * x[i + 1]
                - x[i] * exp(x[i] - x[i + 1])
                - 3,
            ),
            range(N - 2),
        )
    else:
        c.add_con(
            lambda i: 3 * x[i + 1] ** 3
            + 2 * x[i + 2]
            - 5
            + sin(x[i + 1] - x[i + 2]) * sin(x[i + 1] + x[i + 2])
            + 4 * x[i + 1]
            - x[i] * exp(x[i] - x[i + 1])
            - 3,
            range(N - 2),
            name="s",
        )
    return c


def luksan_vlcek_model(N: int, **kwargs) -> ExaModel:
    return ExaModel(luksan_vlcek_core(N, **kwargs))


# Ipopt reference anchors for N = 10
# (/root/reference/docs/src/develop.md:75-107)
LUKSAN_VLCEK_10_SOLUTION = np.array([
    -0.9505563573613093, 0.9139008176388945, 0.9890905176644905,
    0.9985592422681151, 0.9998087408802769, 0.9999745932450963,
    0.9999966246997642, 0.9999995512524277, 0.999999944919307,
    0.999999930070643,
])
LUKSAN_VLCEK_10_MULTIPLIERS = np.array([
    4.1358568305002255, -1.876494903703342, -0.06556333356358675,
    -0.021931863018312875, -0.0019537261317119302, -0.00032910445671233547,
    -3.8788212776372465e-5, -7.376592164341867e-6,
])
