"""On-device training-time augmentation for skeleton + sensor windows.

New capability (the reference trains on raw windows only). TPU-first
design: every transform is drawn per window per step *inside* the jitted
train step, so an epoch's augmentation is part of the single scanned
device program — no host RNG, no extra HBM copies (XLA fuses the affine
into the batch gather). The motion stream is derived in-model from the
augmented points, so both skeleton streams stay geometrically consistent.

Geometry notes:

* Windows are ``scale_pose``-normalized per window to [-1, 1] per axis
  (``har_create4.py:40-51``), so transforms operate in that space:
  rotation/scale act about the window's (x, y) centroid, translation is in
  normalized units, and a horizontal mirror is ``x -> -x`` plus a
  left/right joint swap.
* The confidence/score channel (C > 2) is never touched.
* Flipping needs the layout's left/right pairing; it is defined here for
  the layouts whose joint semantics the prep pipeline pins
  (``data/prep.py:POSE_JOINT_NAMES``). Asking for ``flip_prob > 0`` on a
  layout without a known pairing raises at build time, not mid-train.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fall_multimodal_tpu.configs.config import AugmentConfig

__all__ = ["FLIP_PERMUTATIONS", "make_augment_fn"]

# Left/right joint swap per skeleton layout. coco_cut joint order is the
# prep pipeline's POSE_JOINT_NAMES (Nose, L/R Shoulder, L/R Elbow, L/R
# Wrist, L/R Hip, L/R Knee, L/R Ankle) + the synthetic center joint 13.
# coco_mmpose is the standard 17-keypoint COCO order (nose, L/R eye, L/R
# ear, L/R shoulder/elbow/wrist/hip/knee/ankle; reference
# Model/graph.py:41-55) + the neck/center joint 17.
#
# openpose is the BODY_18 order (nose, neck, R shoulder/elbow/wrist,
# L shoulder/elbow/wrist, R hip/knee/ankle, L hip/knee/ankle, R eye,
# L eye, R ear, L ear; reference musa_model.py:236-244). ntu-rgb+d is the
# Kinect-v2 25-joint order (spine-base, spine-mid, neck, head, L arm 4-7,
# R arm 8-11, L leg 12-15, R leg 16-19, spine-shoulder 20, L handtip/
# thumb 21-22, R handtip/thumb 23-24; musa_model.py:245-255). ntu_edge is
# the same skeleton with the spine-shoulder node removed and the hand
# joints renumbered down by one (musa_model.py:256-266).
#
# Every permutation is validated against the graph topology in
# test_augment.py (an involution that maps the layout's bone set onto
# itself and fixes the center joint).
FLIP_PERMUTATIONS = {
    "coco_cut": np.array([0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 13]),
    "coco_mmpose": np.array(
        [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15, 17]
    ),
    "openpose": np.array(
        [0, 1, 5, 6, 7, 2, 3, 4, 11, 12, 13, 8, 9, 10, 15, 14, 17, 16]
    ),
    "ntu-rgb+d": np.array(
        [0, 1, 2, 3, 8, 9, 10, 11, 4, 5, 6, 7, 16, 17, 18, 19,
         12, 13, 14, 15, 20, 23, 24, 21, 22]
    ),
    "ntu_edge": np.array(
        [0, 1, 2, 3, 8, 9, 10, 11, 4, 5, 6, 7, 16, 17, 18, 19,
         12, 13, 14, 15, 22, 23, 20, 21]
    ),
}


def make_augment_fn(
    cfg: AugmentConfig, layout: str = "coco_cut"
) -> Optional[Callable[[jax.Array, jnp.ndarray, jnp.ndarray],
                       Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Build ``augment(key, features, sensors) -> (features, sensors)``.

    Returns None when the config is disabled or all magnitudes are zero
    (the train step then compiles without any augmentation ops at all).
    ``features``: (N, T, V, C>=2) with (x, y[, score]) channels;
    ``sensors``: (N, T, S).
    """
    magnitudes = {
        "rotate_deg": cfg.rotate_deg, "scale": cfg.scale,
        "translate": cfg.translate, "joint_jitter": cfg.joint_jitter,
        "flip_prob": cfg.flip_prob, "sensor_noise": cfg.sensor_noise,
        "sensor_scale": cfg.sensor_scale,
    }
    negative = sorted(k for k, v in magnitudes.items() if v < 0)
    if negative:
        # a sign mistake must not silently disable the transform: every
        # magnitude is a half-range (draws are already symmetric/±)
        raise ValueError(
            f"augment magnitudes must be >= 0 (draws are symmetric ranges); "
            f"got negative {negative}"
        )
    active = cfg.enabled and any(v > 0 for v in magnitudes.values())
    if not active:
        return None
    if cfg.flip_prob > 0 and layout not in FLIP_PERMUTATIONS:
        raise ValueError(
            f"augment.flip_prob needs a left/right joint pairing for layout "
            f"{layout!r}; known: {sorted(FLIP_PERMUTATIONS)} — add the "
            "permutation to FLIP_PERMUTATIONS or disable flipping"
        )
    flip_perm = (
        jnp.asarray(FLIP_PERMUTATIONS[layout]) if cfg.flip_prob > 0 else None
    )
    rot_rad = float(np.deg2rad(cfg.rotate_deg))

    def augment(key, features, sensors):
        n = features.shape[0]
        k_rot, k_scale, k_shift, k_jit, k_flip, k_snoise, k_sgain = (
            jax.random.split(key, 7)
        )
        xy = features[..., :2]                              # (N, T, V, 2)
        rest = features[..., 2:]

        if cfg.rotate_deg > 0 or cfg.scale > 0:
            # one affine per window: scale * rotation (about the centroid);
            # statically skipped when both are off so the untouched channels
            # stay bit-identical (no identity-matmul rounding)
            centroid = xy.mean(axis=(1, 2), keepdims=True)  # (N, 1, 1, 2)
            theta = jax.random.uniform(
                k_rot, (n,), minval=-rot_rad, maxval=rot_rad)
            gain = 1.0 + jax.random.uniform(
                k_scale, (n,), minval=-cfg.scale, maxval=cfg.scale)
            cos, sin = jnp.cos(theta) * gain, jnp.sin(theta) * gain
            rot = jnp.stack(
                [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2
            )                                               # (N, 2, 2)
            out = jnp.einsum("ntvc,ncd->ntvd", xy - centroid, rot) + centroid
        else:
            out = xy

        if cfg.translate > 0:
            out = out + jax.random.uniform(
                k_shift, (n, 1, 1, 2),
                minval=-cfg.translate, maxval=cfg.translate)
        if cfg.joint_jitter > 0:
            out = out + cfg.joint_jitter * jax.random.normal(k_jit, out.shape)

        feats = jnp.concatenate([out, rest], axis=-1)
        if flip_perm is not None:
            do_flip = (
                jax.random.uniform(k_flip, (n, 1, 1, 1)) < cfg.flip_prob
            )
            mirrored = feats[:, :, flip_perm, :].at[..., 0].multiply(-1.0)
            feats = jnp.where(do_flip, mirrored, feats)

        if cfg.sensor_noise > 0:
            sensors = sensors + cfg.sensor_noise * jax.random.normal(
                k_snoise, sensors.shape)
        if cfg.sensor_scale > 0:
            sgain = 1.0 + jax.random.uniform(
                k_sgain, (n, 1, 1),
                minval=-cfg.sensor_scale, maxval=cfg.sensor_scale)
            sensors = sensors * sgain
        return feats, sensors

    return augment
