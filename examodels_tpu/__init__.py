"""examodels_tpu — a TPU-native algebraic modeling + AD + interior-point stack.

A ground-up JAX/XLA/Pallas implementation of the "SIMD abstraction" for large
sparse nonlinear programs (capability reference: exanauts/ExaModels.jl — see
SURVEY.md):  the user declares objective/constraint terms as a single scalar
expression *template* iterated over an index/data set; each template is traced
once into an expression tree, its derivative sparsity is detected at build
time, and obj/cons/grad/jac/hess evaluate as batched reverse-mode AD
(`jax.vmap` of per-element value/grad/hess) scattering into fixed COO slots
via sorted segment-sums.

Unlike the reference (which stops at the NLPModels oracle API), this package
also ships an on-device filter line-search interior-point solver.

Design notes (TPU-first):
  * everything on the hot path is jitted; structures are static at build time
  * accumulation is sort-once + segment_sum, never atomic scatter
  * float64 is enabled by default (NLP to 1e-6 needs it); set
    EXAMODELS_TPU_NO_X64=1 before import to opt out.
"""

import os as _os

import jax as _jax

if not _os.environ.get("EXAMODELS_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

# persistent XLA compilation cache: first compiles of the jitted oracle /
# KKT / IPM programs are expensive (especially through remote TPU tunnels);
# cache them across processes. EXAMODELS_TPU_NO_CACHE=1 disables.
if not _os.environ.get("EXAMODELS_TPU_NO_CACHE"):
    _cache_dir = _os.environ.get(
        "EXAMODELS_TPU_CACHE_DIR", "/tmp/examodels_tpu_xla_cache"
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # older jax without the option
        pass

from .core.graph import (  # noqa: E402
    Node,
    Const,
    register_univariate,
    register_bivariate,
)
from .core import math as emath  # noqa: E402
from .core.math import *  # noqa: F401,F403,E402
from .nlp.core import (  # noqa: E402
    ExaCore,
    Variable,
    Parameter,
    Constraint,
    Objective,
    add_var,
    add_par,
    add_obj,
    add_con,
    add_con_aug,
    add_expr,
    add_oracle,
    add_scalar_oracle,
    add_eval,
)
from .nlp.model import (  # noqa: E402
    ExaModel,
    get_lcon,
    get_lvar,
    get_start,
    get_ucon,
    get_uvar,
    get_value,
    multipliers,
    multipliers_L,
    multipliers_U,
    set_lcon,
    set_lvar,
    set_parameter,
    set_start,
    set_ucon,
    set_uvar,
    set_value,
    solution,
)
from .nlp.two_stage import (  # noqa: E402
    EachScenario,
    TwoStageCore,
    TwoStageModel,
    get_con_scen,
    get_nscen,
    get_scenario_lcon,
    get_scenario_lvar,
    get_scenario_start,
    get_scenario_theta,
    get_scenario_ucon,
    get_scenario_uvar,
    get_scenario_y0,
    get_var_scen,
    scenario_values,
    set_scenario_lcon,
    set_scenario_lvar,
    set_scenario_start,
    set_scenario_theta,
    set_scenario_ucon,
    set_scenario_uvar,
    set_scenario_values,
    set_scenario_y0,
)
from .nlp.oracle import (  # noqa: E402
    OracleEvaluator,
    ScalarNonlinearOracle,
    VectorNonlinearOracle,
    embed_oracle,
    has_matfree_hess,
    has_matfree_jac,
)
from .utils.aot import AOTModel, load_model, save_model  # noqa: E402
from . import native  # noqa: E402
from .solver.ipm import madipm, IPMOptions, IPMResult  # noqa: E402
from .solver.ipm_device import madipm_device, madipm_hybrid  # noqa: E402
from .utils.wrappers import CompressedModel, TimedModel, WrapperModel  # noqa: E402
from .bridge import FlatCore, flat_model, nl_model, read_nl  # noqa: E402
from .core.prettyprint import full_display, show_tree, tree_str  # noqa: E402
from . import bridge  # noqa: E402
from .nlp import legacy  # noqa: E402
from .nlp.legacy import (  # noqa: E402
    constraint,
    constraint_aug,
    objective,
    parameter,
    subexpr,
    variable,
)

__all__ = [
    "Node",
    "Const",
    "register_univariate",
    "register_bivariate",
    "emath",
    "ExaCore",
    "ExaModel",
    "Variable",
    "Parameter",
    "Constraint",
    "Objective",
    "add_var",
    "add_par",
    "add_obj",
    "add_con",
    "add_con_aug",
    "add_expr",
    "set_parameter",
    "get_value",
    "set_value",
    "get_start",
    "set_start",
    "get_lvar",
    "set_lvar",
    "get_uvar",
    "set_uvar",
    "get_lcon",
    "set_lcon",
    "get_ucon",
    "set_ucon",
    "solution",
    "multipliers",
    "multipliers_L",
    "multipliers_U",
    "madipm",
    "madipm_device",
    "madipm_hybrid",
    "IPMOptions",
    "IPMResult",
    "EachScenario",
    "TwoStageCore",
    "TwoStageModel",
    "get_nscen",
    "get_var_scen",
    "get_con_scen",
    "scenario_values",
    "set_scenario_values",
    "get_scenario_start",
    "set_scenario_start",
    "get_scenario_lvar",
    "set_scenario_lvar",
    "get_scenario_uvar",
    "set_scenario_uvar",
    "get_scenario_y0",
    "set_scenario_y0",
    "get_scenario_lcon",
    "set_scenario_lcon",
    "get_scenario_ucon",
    "set_scenario_ucon",
    "get_scenario_theta",
    "set_scenario_theta",
    "full_display",
    "show_tree",
    "tree_str",
    "CompressedModel",
    "TimedModel",
    "WrapperModel",
    "VectorNonlinearOracle",
    "ScalarNonlinearOracle",
    "OracleEvaluator",
    "embed_oracle",
    "has_matfree_jac",
    "has_matfree_hess",
    "FlatCore",
    "flat_model",
    "nl_model",
    "read_nl",
    "bridge",
    "legacy",
    "native",
    "add_oracle",
    "add_scalar_oracle",
    "add_eval",
    "save_model",
    "load_model",
    "AOTModel",
    "variable",
    "parameter",
    "objective",
    "constraint",
    "constraint_aug",
    "subexpr",
] + emath.__all__

__version__ = "0.1.0"
