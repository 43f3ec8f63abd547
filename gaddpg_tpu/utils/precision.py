"""Matmul-precision control.

TPU matmuls default to bf16 inputs -- perfect for the PointNet/ResNet
learner (large batched MXU work), catastrophic for the *geometry*
matmuls: FK chains, IK jacobian solves, SE(3) composition and the
trajectory optimizer are centimeter-sensitive, and bf16 rounding there
collapsed expert grasp success from ~0.8 to ~0.2 on the TPU backend.

`f32_matmuls` wraps an entry point so everything traced inside uses
float32 matmul precision. Applied to the env/expert/robot entry points;
the agents' network paths keep the fast default.
"""

import functools

import jax


def f32_matmuls(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
