"""Reference-named API facade.

Maps the C++ class names of the reference (include/gaussian_mapper.h,
gaussian_renderer.h, gaussian_scene.h, gaussian_keyframe.h,
gaussian_model.h) onto this package's equivalents, so code written against
the reference's vocabulary finds the same surface here:

    from gsdf_slam_tpu.compat import (
        GaussianMapper, GaussianRenderer, GaussianScene, GaussianKeyframe,
        GaussianModel,
    )

The mapper/scene/keyframe names are direct aliases. `GaussianRenderer`
keeps the reference's static-`render` shape (gaussian_renderer.h:29-42)
over our functional `render_state`; `GaussianModel` bundles the state
pytree with its surgery functions under the reference's method names
(gaussian_model.h:57-175).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .engine.keyframe import Camera, Keyframe as GaussianKeyframe
from .engine.mapper import GaussianMapper
from .engine.scene import Scene as GaussianScene
from .engine.train import render_state
from .models.gaussian_model import (
    GaussianState,
    create_from_pcd,
    densify_and_prune,
    increase_pcd,
    prune_young,
    reset_opacity,
    with_capacity,
)
from .models.optimizer import AdamState
from .ops.rasterize import RasterizeConfig, RenderOutput

__all__ = [
    "Camera",
    "GaussianKeyframe",
    "GaussianMapper",
    "GaussianModel",
    "GaussianRenderer",
    "GaussianScene",
]


class GaussianRenderer:
    """GaussianRenderer::render (gaussian_renderer.cpp:23-141): static
    render of a model from a keyframe's viewpoint."""

    @staticmethod
    def render(
        keyframe: GaussianKeyframe,
        height: int,
        width: int,
        model: "GaussianModel | GaussianState",
        bg_color=None,
        scaling_modifier: float = 1.0,
        z_near: float = 0.01,
        z_far: float = 100.0,
    ) -> RenderOutput:
        active_sh = None
        if isinstance(model, GaussianModel):
            state = model.state
            active_sh = jnp.int32(model.max_sh_degree)  # honor sh_degree
        else:
            state = model
        cfg = RasterizeConfig(
            height=height, width=width, scale_modifier=scaling_modifier
        )
        bg = jnp.zeros(3) if bg_color is None else jnp.asarray(bg_color)
        return render_state(
            state, keyframe.camera_matrices(z_near, z_far), bg, cfg,
            active_sh_degree=active_sh,
        )


class GaussianModel:
    """Stateful wrapper matching GaussianModel's method surface
    (gaussian_model.h:57-175) over the functional fixed-capacity core."""

    def __init__(self, sh_degree: int = 3, capacity: int = 1 << 18):
        import jax

        self.max_sh_degree = sh_degree
        self.capacity = capacity
        self.state: GaussianState | None = None
        self.adam: AdamState | None = None
        self._key = jax.random.PRNGKey(0)

    def _ensure(self, incoming: int) -> None:
        """Grow capacity so `incoming` new rows fit — the reference's
        dynamic reallocation never drops points, so neither does this
        facade (the raw functional API reports drops via SurgeryAux)."""
        count = int(self.state.count) if self.state is not None else 0
        while count + incoming > self.capacity:
            self.capacity *= 2
            if self.state is not None:
                self.state, self.adam = with_capacity(
                    self.state, self.adam, self.capacity
                )

    # --- createFromPcd (gaussian_model.cpp:130-199) ----------------------
    def create_from_pcd(self, points, colors) -> None:
        points = np.asarray(points, np.float32)
        colors = np.asarray(colors, np.float32)
        self._ensure(len(points))
        self.state = create_from_pcd(
            jnp.asarray(points), jnp.asarray(colors),
            jnp.ones(len(points), bool), self.capacity,
            n_rest=(self.max_sh_degree + 1) ** 2 - 1,
        )
        self.adam = AdamState.init(self.state.params())

    # --- increasePcd (:207-317) ------------------------------------------
    def increase_pcd(self, points, colors, iteration: int = 0) -> None:
        points = np.asarray(points, np.float32)
        colors = np.asarray(colors, np.float32)
        self._ensure(len(points))
        self.state, self.adam, _ = increase_pcd(
            self.state, self.adam, jnp.asarray(points), jnp.asarray(colors),
            jnp.ones(len(points), bool), jnp.int32(iteration),
        )

    # --- densifyAndPrune (:644-665) --------------------------------------
    def densify_and_prune(
        self, max_grad, min_opacity, extent, max_screen_size, key=None
    ) -> None:
        import jax

        if key is None:  # fresh randomness per densify round
            self._key, key = jax.random.split(self._key)
        for attempt in range(4):
            new_state, new_adam, aux = densify_and_prune(
                self.state, self.adam, key, max_grad=max_grad,
                min_opacity=min_opacity, extent=extent,
                max_screen_size=max_screen_size,
            )
            dropped = int(aux.dropped_for_capacity)
            if dropped == 0:
                break
            if attempt == 3:
                # mirror GaussianMapper._post_step_phase's give-up path
                print(
                    f"[compat] densify surgery still dropping {dropped} "
                    f"points after {attempt + 1} capacity growths; "
                    "accepting the lossy result"
                )
                break
            # grow relative to the CURRENT state capacity (guaranteed
            # progress, like the mapper's grow-and-redo loop) — a target
            # below the present capacity would re-run the identical
            # lossy surgery forever
            self._ensure(self.state.capacity + dropped)
        self.state, self.adam = new_state, new_adam
        self.capacity = self.state.capacity

    # --- resetOpacity (:399-408) -----------------------------------------
    def reset_opacity(self) -> None:
        self.state, self.adam = reset_opacity(self.state, self.adam)

    def prune_young(self, iteration: int, stable_num_iter: int) -> None:
        self.state, self.adam = prune_young(
            self.state, self.adam, jnp.int32(iteration),
            jnp.int32(stable_num_iter),
        )

    # --- accessors matching get_xyz/get_opacity/... ----------------------
    @property
    def xyz(self):
        return self.state.xyz[: int(self.state.count)]

    @property
    def opacity(self):
        return self.state.opacity_act()[: int(self.state.count), 0]

    @property
    def scaling(self):
        return self.state.scaling_act()[: int(self.state.count)]

    def __len__(self) -> int:
        return int(self.state.count) if self.state is not None else 0
