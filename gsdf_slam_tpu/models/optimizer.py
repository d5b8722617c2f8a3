"""Six-group Adam with parameter surgery, matching the reference setup.

The reference drives one torch::optim::Adam with six per-tensor groups
(xyz / f_dc / f_rest / opacity / scaling / rotation), eps=1e-15, lr set per
group (gaussian_model.cpp:319-352), and performs "optimizer surgery" when the
point set changes: moments are concatenated with zeros for new points
(densificationPostfix :492-568), gathered on prune (prunePoints :431-490),
and zeroed wholesale on opacity reset (replaceTensorToOptimizer :410-429) —
always preserving the step count.

Here the optimizer is a pure pytree (per-param m/v + one shared step); the
surgery is row-wise gather/scatter on the fixed-capacity arrays, done by the
model module. Hand-rolled rather than optax because optax's multi_transform
cannot express row surgery that must stay bitwise-true to torch semantics.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15  # adam_options.eps() = 1e-15, gaussian_model.cpp:327

PARAM_GROUPS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")


@struct.dataclass
class AdamState:
    m: dict[str, jnp.ndarray]
    v: dict[str, jnp.ndarray]
    step: jnp.ndarray  # scalar int32; groups step together

    @staticmethod
    def init(params: dict[str, jnp.ndarray]) -> "AdamState":
        zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
        return AdamState(
            m=zeros, v=jax.tree.map(jnp.copy, zeros), step=jnp.int32(0)
        )


def adam_step(
    params: dict[str, jnp.ndarray],
    grads: dict[str, jnp.ndarray],
    state: AdamState,
    lrs: dict[str, jnp.ndarray],
) -> tuple[dict[str, jnp.ndarray], AdamState]:
    """One torch-semantics Adam step over all groups."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - BETA1**t
    bc2 = 1.0 - BETA2**t
    new_params, new_m, new_v = {}, {}, {}
    for k in params:
        g = grads[k]
        m = BETA1 * state.m[k] + (1.0 - BETA1) * g
        v = BETA2 * state.v[k] + (1.0 - BETA2) * g * g
        # torch op order exactly: denom = sqrt(v)/sqrt(bc2) + eps;
        # p -= (lr/bc1) * m / denom  (keeps parity bit-near)
        denom = jnp.sqrt(v) / jnp.sqrt(bc2) + EPS
        new_params[k] = params[k] - (lrs[k] / bc1) * m / denom
        new_m[k] = m
        new_v[k] = v
    return new_params, AdamState(m=new_m, v=new_v, step=step)


def expon_lr(
    step: Any,
    lr_init: Any,
    lr_final: Any,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 30_000,
):
    """Log-lerp lr schedule (gaussian_model.cpp:1025-1037, the classic 3DGS
    get_expon_lr_func). `lr_init`/`lr_final` may be traced values so live
    hyperparameter edits (viewer sliders) never trigger a recompile."""
    step = jnp.asarray(step, jnp.float32)
    lr_init = jnp.asarray(lr_init, jnp.float32)
    lr_final = jnp.asarray(lr_final, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * math.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    # guard log(0): the reference helper returns 0.0 when both rates are 0
    log_lerp = jnp.exp(
        jnp.log(jnp.maximum(lr_init, 1e-38)) * (1.0 - t)
        + jnp.log(jnp.maximum(lr_final, 1e-38)) * t
    )
    log_lerp = jnp.where((lr_init == 0.0) & (lr_final == 0.0), 0.0, log_lerp)
    return jnp.where(step < 0, 0.0, delay * log_lerp)


def group_lrs(
    opt,  # OptimizationParams
    spatial_lr_scale: float,
    iteration: Any,
    live: Any = None,  # LiveOptValues | None — traced slider overrides
) -> dict[str, jnp.ndarray]:
    """Current lr per group (trainingSetup :319-352 + updateLearningRate).

    When `live` is given, its (possibly traced) values override the static
    ones so viewer slider edits flow through without recompiling."""
    position_lr_init = opt.position_lr_init if live is None else live.position_lr_init
    feature_lr = opt.feature_lr if live is None else live.feature_lr
    opacity_lr = opt.opacity_lr if live is None else live.opacity_lr
    scaling_lr = opt.scaling_lr if live is None else live.scaling_lr
    rotation_lr = opt.rotation_lr if live is None else live.rotation_lr
    xyz_lr = expon_lr(
        iteration,
        position_lr_init * spatial_lr_scale,
        opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )
    f = lambda v: jnp.asarray(v, jnp.float32)
    return {
        "xyz": xyz_lr,
        "f_dc": f(feature_lr),
        "f_rest": f(feature_lr / 20.0),
        "opacity": f(opacity_lr),
        "scaling": f(scaling_lr),
        "rotation": f(rotation_lr),
    }
