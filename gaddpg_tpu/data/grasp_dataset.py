"""Grasp-pose dataset generation for goal-feature training.

TPU-side stand-in for the reference's ACRONYM pipeline
(reference: misc/grasp_data_reader.py: pyrender depth -> clouds,
positive/hard-negative grasp sampling, perturbation + evaluation):
object clouds are rendered with the point-splat camera from random
viewpoints, positives come from the library grasp DB with small valid
perturbations, negatives from large perturbations (the "hard negative"
construction, reference: misc/grasp_data_reader.py:140-176).
"""

from typing import Dict

import jax
import jax.numpy as jnp

from gaddpg_tpu.envs.assets import ObjectLibrary
from gaddpg_tpu.geometry.rotations import euler_to_mat
from gaddpg_tpu.geometry.se3 import pack_pose_rot_first, se3_inverse
from gaddpg_tpu.render.camera import CameraParams, visible_points

POS_TRANS_STD = 0.008
POS_ROT_STD = 0.08
NEG_TRANS = (0.03, 0.10)
NEG_ROT = (0.4, 1.2)


class GraspDatasetGenerator:
    """Jitted batch generator: (cloud, grasp_qt, label)."""

    def __init__(self, lib: ObjectLibrary, cloud_points: int = 512,
                 cam: CameraParams = CameraParams(width=64, height=64)):
        self.lib = lib
        self.cam = cam
        self.cloud_points = cloud_points
        self.sample = jax.jit(self._sample, static_argnames=("batch",))

    def _render_cloud(self, key, obj_idx):
        """Visible object points from a random viewpoint, object frame."""
        k1, k2, k3 = jax.random.split(key, 3)
        # camera on a sphere looking at the object center
        theta = jax.random.uniform(k1, (), minval=0.2, maxval=1.2)
        phi = jax.random.uniform(k2, (), minval=0, maxval=2 * jnp.pi)
        r = jax.random.uniform(k3, (), minval=0.3, maxval=0.6)
        eye = r * jnp.stack([
            jnp.sin(theta) * jnp.cos(phi),
            jnp.sin(theta) * jnp.sin(phi),
            jnp.cos(theta),
        ])
        z = -eye / jnp.maximum(jnp.linalg.norm(eye), 1e-6)
        up = jnp.array([0.0, 0.0, 1.0])
        x = jnp.cross(up, z)
        x = x / jnp.maximum(jnp.linalg.norm(x), 1e-6)
        y = jnp.cross(z, x)
        cam_pose = jnp.eye(4).at[:3, 0].set(x).at[:3, 1].set(y).at[:3, 2].set(z)
        cam_pose = cam_pose.at[:3, 3].set(eye)
        pts_cam, valid = visible_points(
            self.cam, se3_inverse(cam_pose), self.lib.surface_points[obj_idx],
            max_points=self.cloud_points,
        )
        pts_obj = pts_cam @ cam_pose[:3, :3].T + cam_pose[:3, 3]
        return jnp.where(valid[:, None], pts_obj, 0.0), valid

    def _perturb(self, key, grasp, t_mag, r_mag):
        k1, k2 = jax.random.split(key)
        dt = jax.random.normal(k1, (3,)) * t_mag
        de = jax.random.normal(k2, (3,)) * r_mag
        rot = euler_to_mat(de)
        out = grasp.at[:3, 3].add(dt)
        return out.at[:3, :3].set(rot @ grasp[:3, :3])

    def _one(self, key, obj_idx):
        k_cloud, k_pick, k_pos, k_lab, k_neg = jax.random.split(key, 5)
        cloud, valid = self._render_cloud(k_cloud, obj_idx)

        gv = self.lib.grasp_valid[obj_idx]
        probs = gv / jnp.maximum(gv.sum(), 1)
        gi = jax.random.choice(k_pick, gv.shape[0], p=probs)
        grasp = self.lib.grasps[obj_idx, gi]

        positive = jax.random.uniform(k_lab, ()) < 0.5
        pos_g = self._perturb(k_pos, grasp, POS_TRANS_STD, POS_ROT_STD)
        kn1, kn2 = jax.random.split(k_neg)
        t_mag = jax.random.uniform(kn1, (), minval=NEG_TRANS[0], maxval=NEG_TRANS[1])
        r_mag = jax.random.uniform(kn1, (), minval=NEG_ROT[0], maxval=NEG_ROT[1])
        neg_g = self._perturb(kn2, grasp, t_mag, r_mag)
        g = jnp.where(positive, pos_g, neg_g)
        return cloud, pack_pose_rot_first(g), positive.astype(jnp.float32), valid

    def _sample(self, key, batch: int = 64) -> Dict[str, jnp.ndarray]:
        ks = jax.random.split(key, batch)
        k_obj = jax.random.fold_in(key, 99)
        obj_idx = jax.random.randint(
            k_obj, (batch,), 0, self.lib.num_objects
        )
        cloud, grasp_qt, label, valid = jax.vmap(self._one)(ks, obj_idx)
        return {
            "cloud": cloud,           # (B, P, 3) object frame
            "grasp": grasp_qt,        # (B, 7) [q, t]
            "label": label,           # (B,) 1 = near-DB grasp
            "cloud_valid": valid,     # (B, P)
            "obj_idx": obj_idx,
        }


def make_goal_feature_update(goal_module, tx):
    """Jitted GoalFeature training step: PM loss on positives + BCE on
    the confidence head (reference trains the grasp evaluator/sampler
    this way, misc/grasp_data_reader.py:338-357)."""
    from gaddpg_tpu.agents.losses import goal_pred_loss

    def update(params, stats, opt_state, batch):
        def loss_fn(params_):
            (pred_qt, conf), mut = goal_module.apply(
                {"params": params_, "batch_stats": stats},
                batch["cloud"], train=True, mutable=["batch_stats"],
            )
            pm = goal_pred_loss(pred_qt, batch["grasp"], batch["label"] > 0.5)
            eps = 1e-6
            bce = -jnp.mean(
                batch["label"] * jnp.log(conf + eps)
                + (1 - batch["label"]) * jnp.log(1 - conf + eps)
            )
            return pm + bce, (mut["batch_stats"], pm, bce)

        grads, (new_stats, pm, bce) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, new_stats, opt_state, {"pm_loss": pm, "bce_loss": bce}

    return jax.jit(update)
