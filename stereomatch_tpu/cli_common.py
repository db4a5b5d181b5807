"""String registries + pipeline factory shared by the CLIs.

Mirrors the reference (stereomatch/cli_common.py:9-52).
"""

from __future__ import annotations

from .aggregation import Semiglobal
from .cost import SSD, Birchfield, SSDTexture
from .disparity_reduce import DynamicProgramming, WinnerTakesAll
from .pipeline import Pipeline

COST_METHODS = {
    "ssd": SSD,
    "ssd-texture": SSDTexture,
    "birchfield": Birchfield,
}

AGGREGATION_METHODS = {
    "sgm": Semiglobal,
}

DISPARITY_METHODS = {
    "wta": WinnerTakesAll,
    "dyn": DynamicProgramming,
}


def create_pipeline(cost_method: str, disp_method: str,
                    aggr_method: str = None,
                    max_disparity: int = 32,
                    penalty1: float = 0.1, penalty2: float = 0.2,
                    backend: str = "auto") -> Pipeline:
    """Create a pipeline from method names.

    Available cost functions: ``list(COST_METHODS)``; disparity methods:
    ``list(DISPARITY_METHODS)``; aggregation methods:
    ``list(AGGREGATION_METHODS)`` (or None).

    ``penalty1``/``penalty2`` configure SGM (ignored without aggregation);
    ``backend`` selects pallas/xla kernels for the stages that have both
    (see utils.backend.resolve_backend).
    """
    aggregation_cls = AGGREGATION_METHODS.get(aggr_method, None)
    aggregation = (aggregation_cls(penalty1=penalty1, penalty2=penalty2,
                                   backend=backend)
                   if aggregation_cls is not None else None)

    disparity_cls = DISPARITY_METHODS[disp_method]
    disparity = (disparity_cls(backend=backend)
                 if disparity_cls is DynamicProgramming else disparity_cls())

    return Pipeline(COST_METHODS[cost_method](max_disparity),
                    disparity, aggregation=aggregation)
