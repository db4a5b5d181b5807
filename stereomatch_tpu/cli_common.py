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
                    max_disparity: int = 32) -> Pipeline:
    """Create a pipeline from method names.

    Available cost functions: ``list(COST_METHODS)``; disparity methods:
    ``list(DISPARITY_METHODS)``; aggregation methods:
    ``list(AGGREGATION_METHODS)`` (or None).
    """
    aggregation_cls = AGGREGATION_METHODS.get(aggr_method, None)
    aggregation = aggregation_cls() if aggregation_cls is not None else None

    return Pipeline(COST_METHODS[cost_method](max_disparity),
                    DISPARITY_METHODS[disp_method](),
                    aggregation=aggregation)
