"""Inference-only renderer: checkpointed variables -> full-frame renders.

Equivalent of the reference's ``batched_inference`` + decode step
(/root/reference/eval.py:29-59,288-295) as a per-resolution-jitted,
``lax.map``-tiled XLA program. Used by the eval / video apps and by
validation.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crnerf_tpu.config import Config
from crnerf_tpu.render.system import CrNerfSystem


class Renderer:
    def __init__(self, cfg: Config, variables: Dict,
                 system: Optional[CrNerfSystem] = None):
        self.cfg = cfg
        self.system = system or CrNerfSystem(cfg)
        self.variables = variables
        self._cache: Dict[Tuple[int, int], callable] = {}

    def _fn(self, hw: Tuple[int, int]):
        if hw in self._cache:
            return self._cache[hw]
        tile = min(self.cfg.chunk, hw[0] * hw[1])

        def render(variables, rays, whole_img, key):
            batch = {"rays": rays, "whole_img": whole_img}
            results, _ = self.system.forward(
                variables, batch, key, train=False, tile=tile, image_hw=hw
            )
            keep = {}
            for k in ("rgb_fine", "rgb_coarse", "depth_fine",
                      "depth_coarse", "out_mask"):
                if k in results:
                    keep[k] = results[k]
            return keep

        fn = jax.jit(render)
        self._cache[hw] = fn
        return fn

    def render_frame(
        self,
        rays: np.ndarray,           # (h*w, 8)
        whole_img: np.ndarray,      # (1, Ha, Wa, 3) in [-1, 1] (style source)
        hw: Tuple[int, int],        # (h, w)
        key: Optional[jax.Array] = None,
    ) -> Dict[str, np.ndarray]:
        h, w = hw
        out = self._fn(hw)(
            self.variables,
            jnp.asarray(rays),
            jnp.asarray(whole_img),
            key if key is not None else jax.random.PRNGKey(0),
        )
        out = jax.device_get(out)
        typ = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
        res = {
            "rgb": np.asarray(out[typ]).reshape(h, w, 3),
            "depth": np.asarray(
                out.get("depth_fine", out["depth_coarse"])
            ).reshape(h, w),
        }
        if "out_mask" in out:
            res["mask"] = np.asarray(out["out_mask"]).reshape(h, w)
        return res
