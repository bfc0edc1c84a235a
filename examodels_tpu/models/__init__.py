"""Model library: the reference's benchmark/test problem families
(/root/reference/benchmark/runbenchmark.jl, /root/reference/test/COPSApp.jl)
rebuilt on the TPU-native core."""

from .luksan_vlcek import (
    LUKSAN_VLCEK_10_MULTIPLIERS,
    LUKSAN_VLCEK_10_SOLUTION,
    luksan_vlcek_core,
    luksan_vlcek_model,
)
from .cops import (
    COPS_BUILDERS,
    bearing_core, bearing_model,
    camshape_core, camshape_model,
    catmix_core, catmix_model,
    chain_core, chain_model,
    elec_core, elec_model,
    minsurf_core, minsurf_model,
    polygon_core, polygon_model,
    rocket_core, rocket_model,
    steering_core, steering_model,
    torsion_core, torsion_model,
)
from .opf import (
    OPFData,
    ac_opf_core,
    ac_opf_model,
    parse_matpower,
    synthetic_case,
)
from .stochastic_opf import (  # noqa: F401
    stochastic_opf_core,
    stochastic_opf_model,
)
from .quadrotor import quadrotor_core, quadrotor_model

__all__ = [
    "luksan_vlcek_core", "luksan_vlcek_model",
    "LUKSAN_VLCEK_10_SOLUTION", "LUKSAN_VLCEK_10_MULTIPLIERS",
    "COPS_BUILDERS",
    "elec_core", "elec_model", "chain_core", "chain_model",
    "camshape_core", "camshape_model", "bearing_core", "bearing_model",
    "torsion_core", "torsion_model", "minsurf_core", "minsurf_model",
    "catmix_core", "catmix_model", "steering_core", "steering_model",
    "rocket_core", "rocket_model", "polygon_core", "polygon_model",
    "OPFData", "parse_matpower", "synthetic_case", "ac_opf_core", "ac_opf_model",
    "stochastic_opf_core", "stochastic_opf_model",
    "quadrotor_core", "quadrotor_model",
]
