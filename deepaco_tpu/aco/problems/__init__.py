from deepaco_tpu.aco.problems.bpp import BPPACO, bpp_fitness
from deepaco_tpu.aco.problems.cvrp import (
    CVRPACO,
    cvrp_spec,
    route_cost,
    validate_routes,
)
from deepaco_tpu.aco.problems.mkp import (
    MKPACO,
    MKPItemsACO,
    mkp_items_spec,
    mkp_objective,
    mkp_spec,
)
from deepaco_tpu.aco.problems.op import OPACO, op_objective, op_spec
from deepaco_tpu.aco.problems.pctsp import PCTSPACO, pctsp_objective, pctsp_spec
from deepaco_tpu.aco.problems.smtwtp import SMTWTPACO, smtwtp_cost, smtwtp_spec
from deepaco_tpu.aco.problems.sop import SOPACO, sop_cost, sop_spec
from deepaco_tpu.aco.problems.tsp import tour_cost, tsp_spec

__all__ = [
    "BPPACO", "CVRPACO", "MKPACO", "MKPItemsACO", "OPACO", "PCTSPACO",
    "SMTWTPACO", "SOPACO",
    "bpp_fitness", "cvrp_spec", "mkp_items_spec", "mkp_objective", "mkp_spec",
    "op_objective", "op_spec", "pctsp_objective", "pctsp_spec", "route_cost",
    "smtwtp_cost", "smtwtp_spec", "sop_cost", "sop_spec", "tour_cost",
    "tsp_spec", "validate_routes",
]
