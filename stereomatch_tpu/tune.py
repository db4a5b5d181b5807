"""Gradient-based SGM penalty tuning.

Beyond the reference's capability surface: its README notes "The
operations aren't differentiable" (/root/reference/README.md:25), so its
P1/P2 defaults (stereomatch/aggregation.py:26) can only be hand-tuned.
Here the scan-based SGM is differentiable (ops/soft.py), so the penalties
become learnable parameters: descend a robust disparity loss between the
soft-argmin prediction and ground truth.

The cost volumes do not depend on the penalties, so they are built once
and the optimization loop differentiates only through aggregation +
soft-argmin — one compiled update step, reused every iteration (the
penalties are traced, not static).

Typical use (with the synthetic ground-truth scenes, so it runs offline)::

    from stereomatch_tpu import tune
    result = tune.tune_penalties([(left, right, gt)], max_disparity=32,
                                 cost="census")
    pipeline = create_pipeline("census", "wta", "sgm",
                               penalty1=result.penalty1,
                               penalty2=result.penalty2)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops.soft import semiglobal_aggregate_diff, soft_argmin


class TuneResult(NamedTuple):
    """Tuned penalties plus the optimization trace."""
    penalty1: float
    penalty2: float
    loss_history: np.ndarray     # [steps]
    penalty_history: np.ndarray  # [steps, 2]


def _build_volumes(scenes, *, cost, max_disparity, kernel_size,
                   census_window, cost_dtype):
    from .ops import cost as cost_ops
    if kernel_size is None:
        kernel_size = {"birchfield": 4, "census": 1}.get(cost, 7)
    vols, imgs, gts = [], [], []
    for left, right, gt in scenes:
        left = jnp.asarray(left, jnp.float32)
        right = jnp.asarray(right, jnp.float32)
        if cost in ("ssd", "ssd-texture"):
            vol = cost_ops.ssd_cost_volume(
                left, right, max_disparity=max_disparity,
                kernel_size=kernel_size, cost_dtype=cost_dtype)
        elif cost == "sad":
            vol = cost_ops.sad_cost_volume(
                left, right, max_disparity=max_disparity,
                kernel_size=kernel_size, cost_dtype=cost_dtype)
        elif cost == "ncc":
            vol = cost_ops.zncc_cost_volume(
                left, right, max_disparity=max_disparity,
                kernel_size=kernel_size, cost_dtype=cost_dtype)
        elif cost == "census":
            vol = cost_ops.census_hamming_cost_volume(
                left, right, max_disparity=max_disparity,
                window_size=census_window, kernel_size=kernel_size,
                cost_dtype=cost_dtype)
        elif cost == "birchfield":
            vol = cost_ops.birchfield_cost_volume(
                left, right, max_disparity=max_disparity,
                kernel_size=kernel_size)
        else:
            raise ValueError(f"unknown cost {cost!r}")
        vols.append(vol)
        imgs.append(left)
        gts.append(jnp.asarray(gt, jnp.float32))
    return jnp.stack(vols), jnp.stack(imgs), jnp.stack(gts)


def tune_penalties(scenes: Sequence, *, max_disparity: int,
                   cost: str = "census",
                   kernel_size: Optional[int] = None,
                   census_window: int = 5,
                   steps: int = 60,
                   learning_rate: float = 0.05,
                   tau: float = 2.0,
                   init_penalty1: float = 0.1,
                   init_penalty2: float = 0.2,
                   huber_delta: float = 1.0,
                   valid_masks=None) -> TuneResult:
    """Fit SGM penalties (P1, P2) by gradient descent on a disparity loss.

    Args:
      scenes: sequence of ``(left, right, gt_disparity)`` triples with one
        common shape; gt in pixels (float or int).
      max_disparity / cost / kernel_size / census_window: cost-volume
        configuration, as in the CLI registries.
      steps / learning_rate: Adam schedule length and step size.
      tau: soft-argmin temperature (in cost units — census Hamming counts,
        SSD sums, ...; larger = smoother loss surface, blurrier argmin).
      init_penalty1/2: starting point — the reference defaults
        (stereomatch/aggregation.py:26) unless overridden.
      huber_delta: Huber loss transition point, in disparity pixels.
      valid_masks: optional [S, H, W] bool — pixels to score.  Default:
        columns >= max_disparity (where every hypothesis is valid), the
        convention of the synthetic-scene tests.

    Returns:
      TuneResult with positive tuned penalties and per-step histories.
    """
    import optax

    vols, imgs, gts = _build_volumes(
        scenes, cost=cost, max_disparity=max_disparity,
        kernel_size=kernel_size, census_window=census_window,
        cost_dtype=jnp.float32)

    if valid_masks is None:
        mask = np.zeros(gts.shape, bool)
        mask[:, :, max_disparity:] = True
    else:
        mask = np.asarray(valid_masks, bool)
    mask = jnp.asarray(mask)
    denom = jnp.maximum(mask.sum(), 1)

    def softplus_inv(y):
        y = float(y)
        return float(np.log(np.expm1(y))) if y < 20 else y

    theta0 = jnp.array([softplus_inv(init_penalty1),
                        softplus_inv(init_penalty2)], jnp.float32)
    opt = optax.adam(learning_rate)

    def loss_fn(theta):
        p1 = jax.nn.softplus(theta[0])
        p2 = jax.nn.softplus(theta[1])
        agg = jax.vmap(
            lambda v, i: semiglobal_aggregate_diff(v, i, p1, p2))(vols, imgs)
        disp = jax.vmap(lambda a: soft_argmin(a, tau))(agg)
        err = disp - gts
        loss = optax.huber_loss(err, delta=huber_delta)
        return jnp.sum(jnp.where(mask, loss, 0.0)) / denom

    @jax.jit
    def update(theta, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = opt.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return theta, opt_state, loss

    theta = theta0
    opt_state = opt.init(theta)
    losses, thetas = [], []
    for _ in range(steps):
        theta, opt_state, loss = update(theta, opt_state)
        losses.append(float(loss))
        thetas.append(np.asarray(jax.nn.softplus(theta)))

    p1, p2 = (float(x) for x in jax.nn.softplus(theta))
    return TuneResult(penalty1=p1, penalty2=p2,
                      loss_history=np.asarray(losses, np.float32),
                      penalty_history=np.asarray(thetas, np.float32))
