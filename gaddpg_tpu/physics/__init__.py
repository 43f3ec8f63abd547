"""Vectorized rigid-body physics for tabletop grasping.

TPU-native replacement for PyBullet (reference: env/panda_scene.py uses
p.stepSimulation at 1 kHz, 150 substeps per policy step,
reference: env/panda_scene.py:152,358-364). Design:

- the arm is a stiff position-servo in joint space (PyBullet position
  control with 250 Nm torque caps behaves near-kinematically at these
  speeds, reference: env/panda_gripper_hand_camera.py:17-20);
- fingers are force-limited spring servos, so grip force saturates at a
  max squeeze force instead of crushing through the object;
- the target object is a free 6-DoF rigid body with compliant
  (penalty + regularized Coulomb friction) contacts against the table
  plane, the two finger pads, and the palm, all represented as sphere
  sets vs analytic SDFs;
- one policy step = `lax.scan` over 150 fixed substeps; everything
  vmaps over the env axis and shards over the device mesh.

The fidelity contract is behavioral, not trajectory-level: lift/fall
thresholds (reference: env/panda_scene.py:863-879) and contact events
must match, not individual contact impulses.
"""

from gaddpg_tpu.physics.types import PhysicsParams, BodyState, ArmState, PhysicsState
from gaddpg_tpu.physics.contact import (
    Contacts,
    sphere_plane_contacts,
    sphere_box_contacts,
    normal_forces,
    friction_impulses,
)
from gaddpg_tpu.physics.step import physics_substep, physics_step
