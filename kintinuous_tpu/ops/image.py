"""Model-view rendering for visualisation (jnp).

TPU equivalents of src/frontend/cuda/image_generator.cu:
  generate_image <- generateImage (:165-187): Phong-shaded normal render
                    of the raycast prediction, with the fusion-weight
                    heat colouring option (:71-155)
  generate_depth <- generateDepth (:210-219): depth render from a vmap

These feed the headless viz exports (the reference shows them in the
PangoVis model panes, PangoVis.cpp:45-80).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def generate_image(
    vmap: jnp.ndarray,  # (3,H,W) local-frame vertices (NaN = miss)
    nmap: jnp.ndarray,  # (3,H,W)
    color: jnp.ndarray | None = None,  # (3,H,W) RGB 0..255 from raycast
    weight: jnp.ndarray | None = None,  # (H,W) fusion weights for heat mode
    light_dir=(0.3, -0.4, -0.85),
    mode: str = "shaded",  # shaded | color | heat
) -> jnp.ndarray:
    """-> (H,W,3) uint8 render."""
    H, W = vmap.shape[1:]
    valid = jnp.isfinite(nmap).all(axis=0)
    l = jnp.asarray(light_dir, jnp.float32)
    l = l / jnp.linalg.norm(l)
    ndotl = jnp.abs(
        nmap[0] * l[0] + nmap[1] * l[1] + nmap[2] * l[2]
    )
    shade = jnp.where(valid, 0.15 + 0.85 * ndotl, 0.0)
    if mode == "color" and color is not None:
        img = jnp.moveaxis(color, 0, -1) * (0.3 + 0.7 * shade[..., None])
    elif mode == "heat" and weight is not None:
        # weight 0..128 -> blue..red ramp (reference heat colouring)
        t = jnp.clip(weight / 128.0, 0.0, 1.0)
        img = (
            jnp.stack([t, 0.2 + 0.3 * t, 1.0 - t], axis=-1)
            * 255.0
            * shade[..., None]
        )
    else:
        img = jnp.stack([shade] * 3, axis=-1) * 255.0
    return jnp.clip(jnp.nan_to_num(img), 0, 255).astype(jnp.uint8)


def generate_depth(depth: jnp.ndarray, max_depth: float = 6.0) -> jnp.ndarray:
    """Depth (H,W) metres -> (H,W,3) uint8 grayscale viz."""
    t = jnp.clip(depth / max_depth, 0.0, 1.0)
    g = jnp.where(depth > 0, 255.0 * (1.0 - t), 0.0)
    return jnp.stack([g] * 3, axis=-1).astype(jnp.uint8)
