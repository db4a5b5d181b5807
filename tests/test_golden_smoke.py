"""Golden-image smoke tests: run each stage and save a colorized depthmap.

Mirrors the reference's eyeball-artifact pattern (tests/test_cost.py:18-38,
test_semiglobalmatch.py:13-36, tests/viz.py:11-29) but with assertions the
reference lacks: files exist, and the disparity maps carry real signal
(ground-truth agreement on the synthetic scene).
"""

import numpy as np
import pytest

from stereomatch_tpu.aggregation import Semiglobal
from stereomatch_tpu.cost import SSD, Birchfield
from stereomatch_tpu.disparity_reduce import DynamicProgramming, WinnerTakesAll
from stereomatch_tpu.utils import viz

from .conftest import STM_MAX_DISPARITY, synthetic_stereo_pair

D = STM_MAX_DISPARITY


@pytest.fixture(scope="module")
def scene():
    return synthetic_stereo_pair(48, 96, D, seed=11)


@pytest.mark.parametrize("cost_cls", [SSD, Birchfield])
@pytest.mark.parametrize("use_sgm", [False, True])
def test_smoke_depthmaps(scene, cost_cls, use_sgm):
    left, right, gt = scene
    kwargs = {"kernel_size": 3} if cost_cls is SSD else {}
    vol = cost_cls(D, **kwargs)(left, right)
    if use_sgm:
        vol = Semiglobal()(vol, left)
    disp = np.asarray(WinnerTakesAll()(vol))

    name = f"{cost_cls.__name__.lower()}{'_sgm' if use_sgm else ''}"
    path = viz.save_depthmap(disp, pytest.STM_TEST_OUTPUT_PATH / name, D)
    assert path.exists() and path.stat().st_size > 0

    bad = np.mean((np.abs(disp - gt) > 1)[:, D:])
    assert bad < 0.15, f"{name}: bad-pixel {bad:.2%}"


def test_smoke_dp_depthmap(scene):
    left, right, gt = scene
    vol = Semiglobal()(SSD(D, kernel_size=3)(left, right), left)
    disp = np.asarray(DynamicProgramming()(vol))
    path = viz.save_depthmap(disp, pytest.STM_TEST_OUTPUT_PATH / "dp_sgm", D)
    assert path.exists()
    bad = np.mean((np.abs(disp - gt) > 1)[:, D:])
    assert bad < 0.25
