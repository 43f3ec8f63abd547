"""Data pipelines: mesh import, grasp datasets, format converters.

Covers the reference's offline data machinery
(reference: misc/grasp_data_reader.py, misc/convert_graspnet_grasp.py)
re-targeted at the TPU asset contract: meshes become sphere sets /
surface samples / SDF grids (native C++ with numpy fallbacks), grasp
datasets are generated procedurally for goal-feature training.
"""

from gaddpg_tpu.data.mesh_native import (
    native_available,
    voxel_occupancy,
    surface_distance_grid,
    sphere_pack,
    surface_sample,
)
from gaddpg_tpu.data.mesh_import import load_obj, asset_from_mesh
from gaddpg_tpu.data.grasp_dataset import GraspDatasetGenerator
