"""GA-DDPG-TPU: a TPU-native 6-DoF grasping RL framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
liruiw/GA-DDPG (CoRL 2021, arXiv 2010.00824): point-cloud-conditioned
6-DoF grasping policies trained with behavior cloning + DAgger/DART +
TD3-style actor-critic with goal-auxiliary grasp prediction heads.

Instead of the reference's Ray-actor farm of CPU PyBullet simulators
(reference: core/train_online.py, core/trainer.py), everything here is a
single SPMD program: thousands of vectorized physics envs, an on-device
replay ring buffer, and jitted learner updates, sharded over a
`jax.sharding.Mesh` of TPU chips.

Subpackages
-----------
- geometry:  SE(3)/quaternion/euler math, gripper control points
- robot:     analytic Panda FK, batched damped-least-squares IK
- physics:   vmapped rigid-body stepping with compliant contacts
- render:    point-based depth/mask camera and backprojection
- envs:      PandaGraspEnv -- pure functional grasping environment
- models:    PointNet++ encoder, Gaussian policy, twin Q critic
- ops:       FPS / ball-query / grouped-MLP primitives (XLA + Pallas)
- replay:    on-device sharded replay ring buffer (+ reference .npz IO)
- agents:    BC and DDPG(TD3) jitted update steps, PM losses
- expert:    grasp databases and the on-device goal-servo expert planner
- parallel:  mesh construction and sharding helpers
- train:     config system, fused train loop, checkpoints, metrics
"""

__version__ = "0.1.0"
