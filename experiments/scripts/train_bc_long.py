"""Long BC training run -> learned-policy success artifact.

Phases (resumable; state on disk under output/bc_long):
  1. generate + save the fixed eval scene set (the reference's
     pre-generated scene_{k} protocol, reference:
     core/train_test_offline.py:176-256, experiments/scripts/test_ycb.sh)
  2. collect expert demonstrations on the YCB proxy library until
     TARGET_TRANSITIONS successful-episode transitions are stored
  3. train BC with periodic checkpoints
  4. (run eval_bc_long.py afterwards for the success table)

Usage (dev host, CPU):
    JAX_PLATFORMS=cpu python experiments/scripts/train_bc_long.py
Env knobs: ENVS, TARGET_TRANSITIONS, MAX_UPDATES, MAX_HOURS, BATCH.
"""

import json
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401  (CPU override, see _platform.py)

from gaddpg_tpu import replay  # noqa: E402
from gaddpg_tpu.envs.assets import library_from_index  # noqa: E402
from gaddpg_tpu.envs.scenes import generate_scenes, save_scenes  # noqa: E402
from gaddpg_tpu.replay.npz_io import load_npz, save_npz  # noqa: E402
from gaddpg_tpu.train.checkpoints import save_agent  # noqa: E402
from gaddpg_tpu.train.config import load_config  # noqa: E402
from gaddpg_tpu.train.loop import Trainer  # noqa: E402

OUT = os.environ.get("OUT", "output/bc_long")
# object library + clutter knobs: INDEX may be a built-in name ("ycb",
# "extra_shape", "proc_shapenet:N") or a mesh-index JSON path (the
# filter_shapenet.json pattern); CLUTTER > 0 trains in dynamic-clutter
# scenes (physics/multi.py), the round-4 learned-clutter artifact
INDEX = os.environ.get("INDEX", "ycb")
SPLIT = os.environ.get("SPLIT", "train")
CLUTTER = int(os.environ.get("CLUTTER", 0))
ENVS = int(os.environ.get("ENVS", 24))
TARGET_TRANSITIONS = int(os.environ.get("TARGET_TRANSITIONS", 5000))
MAX_UPDATES = int(os.environ.get("MAX_UPDATES", 4000))
MAX_HOURS = float(os.environ.get("MAX_HOURS", 7.0))
BATCH = int(os.environ.get("BATCH", 64))
NUM_SCENES = int(os.environ.get("NUM_SCENES", 200))
# DAgger rounds after the pure-BC phase (the reference's bc_aux_dagger
# recipe: explore episodes with expert relabels fix the distribution
# shift pure BC suffers, reference: experiments/cfgs/bc_aux_dagger.yaml)
DAGGER_WAVES = int(os.environ.get("DAGGER_WAVES", 60))
DAGGER_UPDATES_PER_WAVE = int(os.environ.get("DAGGER_UPDATES_PER_WAVE", 40))
# DART perturbation on expert episodes (recovery-state supervision,
# reference: env/panda_scene.py:1069-1076; excluded from the critic)
DART = os.environ.get("DART", "0") == "1"
# buffer-save cadence during collection (device->host transfer +
# compression of the whole buffer: minutes per save on the tunnel
# device/1-core host -- raise this when resumability doesn't matter)
SAVE_EVERY = int(os.environ.get("SAVE_EVERY", 5))
# training-curve snapshots: SNAP_EVERY=k keeps OUT/snap_<n> agent
# copies every k updates (training here is deterministic, so one run +
# per-snapshot evals measures the success-vs-updates curve directly)
SNAP_EVERY = int(os.environ.get("SNAP_EVERY", 0))
# collision-aware imitation knobs (round-2 VERDICT item 2: the policy's
# clutter gap is collision-dominated; the reference only LOGS collision,
# reference: env/panda_scene.py:1078-1095 -- we train on it):
#   COL_FILTER=1     drop demo episodes carrying a collision flag
#   SUCCESS_FILTER=1 keep only successful episodes in DAgger waves
#   COL_DISCOUNT=d   down-weight collision-suffix expert transitions
#   COL_AUX=w        collision-prediction aux head weight (sigmoid BCE)
COL_FILTER = os.environ.get("COL_FILTER", "0") == "1"
SUCCESS_FILTER = os.environ.get("SUCCESS_FILTER", "0") == "1"
COL_DISCOUNT = float(os.environ.get("COL_DISCOUNT", 0.0))
COL_AUX = float(os.environ.get("COL_AUX", 0.0))
# image-mode policy (RGBDM through ResNet-18, reference:
# experiments/config.py:105 use_image, core/networks.py:106-147):
#   USE_IMAGE=1, IMG=<res>, DOMAIN_RAND=1, PRETRAINED=<resnet .pth/.npz>
USE_IMAGE = os.environ.get("USE_IMAGE", "0") == "1"
IMG = int(os.environ.get("IMG", 64))
DOMAIN_RAND = os.environ.get("DOMAIN_RAND", "0") == "1"
PRETRAINED = os.environ.get("PRETRAINED", "")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(os.path.join(OUT, "run.log"), "a") as f:
        f.write(line + "\n")


def main():
    os.makedirs(OUT, exist_ok=True)
    t_start = time.time()
    if COL_FILTER and COL_AUX > 0:
        # round-4 root cause: COL_FILTER removes every collision
        # episode, so the collision aux head trains on all-zero labels
        # -- a saturated BCE whose Adam drift through the shared
        # encoder collapsed the policy after ~4.5k updates (the logit
        # clip in losses.collision_bce now bounds the drift, but the
        # aux still learns nothing from a positive-free buffer)
        print("WARNING: COL_FILTER=1 leaves the COL_AUX collision head "
              "with zero positive labels; prefer COL_DISCOUNT over "
              "COL_FILTER when COL_AUX>0", flush=True)
    buffer_size = max(
        TARGET_TRANSITIONS + DAGGER_WAVES * ENVS * 26 + 2000, 8000
    )
    cfg = load_config(overrides={
        "num_envs": ENVS,
        "batch_size": BATCH,
        "updates_per_iter": 1,
        "explore_ratio": 0.0,
        "explore_cap": 0.0,
        "explore_ratio_list": (0.0,),
        "dart": DART,
        "dagger": False,
        "buffer_size": buffer_size,
        "max_epoch": MAX_UPDATES + DAGGER_WAVES * DAGGER_UPDATES_PER_WAVE + 1,
        "index_file": INDEX,
        "index_split": SPLIT,
        "num_clutter": CLUTTER,
        "output_dir": OUT,
        "demo_collision_filter": COL_FILTER,
        "dagger_success_filter": SUCCESS_FILTER,
        "collision_demo_discount": COL_DISCOUNT,
        "collision_aux_weight": COL_AUX,
        "use_image": USE_IMAGE,
        "IMG_SIZE": IMG,
        "domain_rand": DOMAIN_RAND,
        "pretrained_resnet": PRETRAINED,
    }, policy="BC")
    lib = library_from_index(INDEX, SPLIT)
    if os.environ.get("VERIFY_GRASPS", "1") == "1":
        from gaddpg_tpu.envs.assets import verify_library_grasps
        lib = verify_library_grasps(lib)  # physics-verified grasp DB

    tr = Trainer(cfg, lib=lib)

    # phase 1: fixed eval scenes
    scene_path = os.path.join(OUT, "eval_scenes.npz")
    if not os.path.exists(scene_path):
        log(f"generating {NUM_SCENES} eval scenes...")
        scenes = generate_scenes(tr.env, jax.random.PRNGKey(1234), NUM_SCENES)
        save_scenes(scenes, scene_path)
        log(f"saved {scene_path}")

    # phase 2: expert demonstrations
    data_path = os.path.join(OUT, "bc_demos.npz")
    if os.path.exists(data_path):
        tr.buffer = load_npz(data_path, buffer_size=cfg.buffer_size,
                             num_points=cfg.env.uniform_num_pts + 6)
        log(f"loaded {int(tr.buffer.filled)} transitions from {data_path}")
    wave = 0
    while int(replay.upper_idx(tr.buffer)) < TARGET_TRANSITIONS:
        t0 = time.time()
        stats = tr.collect()
        wave += 1
        log(f"collect wave {wave}: {stats} ({time.time()-t0:.0f}s)")
        if wave % SAVE_EVERY == 0:
            save_npz(tr.buffer, data_path)
        if time.time() - t_start > MAX_HOURS * 3600 * 0.5:
            log("collection time budget hit")
            break
    save_npz(tr.buffer, data_path)
    n_data = int(tr.buffer.filled)
    log(f"dataset: {n_data} transitions")

    # phase 3: BC training
    losses = []
    t_train0 = time.time()
    for i in range(MAX_UPDATES):
        m = tr.train_iter()
        if not m:
            log("buffer too small for a batch; aborting train")
            break
        losses.append(m.get("bc_loss", float("nan")))
        if (i + 1) % 25 == 0:
            log(f"update {i+1}: bc_loss={np.mean(losses[-25:]):.4f} "
                f"aux={m.get('policy_grasp_aux_loss', 0):.4f} "
                f"({(time.time()-t_train0)/(i+1):.1f}s/upd)")
        if (i + 1) % 100 == 0:
            save_agent(tr.agent_state, OUT)
            with open(os.path.join(OUT, "train_stats.json"), "w") as f:
                json.dump({"updates": i + 1, "n_data": n_data,
                           "loss_first25": float(np.mean(losses[:25])),
                           "loss_last25": float(np.mean(losses[-25:]))}, f)
        if SNAP_EVERY and (i + 1) % SNAP_EVERY == 0:
            snap = os.path.join(OUT, f"snap_{i + 1}")
            os.makedirs(snap, exist_ok=True)
            save_agent(tr.agent_state, snap)
        if time.time() - t_start > MAX_HOURS * 3600:
            log("total time budget hit")
            break
    save_agent(tr.agent_state, OUT)
    # snapshot the pure-BC agent separately: the DAgger phase keeps
    # overwriting OUT, and the pure-vs-DAgger comparison needs both
    pure_dir = os.path.join(OUT, "pure")
    os.makedirs(pure_dir, exist_ok=True)
    save_agent(tr.agent_state, pure_dir)
    log(f"pure-BC phase done: {len(losses)} updates, final bc_loss "
        f"{np.mean(losses[-25:]) if losses else float('nan'):.4f} "
        f"(snapshot -> {pure_dir})")

    # phase 4: DAgger rounds -- explore episodes with expert relabels
    # (reference: experiments/cfgs/bc_aux_dagger.yaml; explore ratio 0.5,
    # dagger relabels mid-episode, replay keeps explore episodes)
    if DAGGER_WAVES > 0:
        import dataclasses

        from gaddpg_tpu.train.rollout import RolloutWorker

        # DAgger waves optionally aggregate only clean successes:
        # success-filtered (round-2 proc_policy.md showed failed
        # on-policy trajectories dilute the demo set) and collision-
        # filtered (approach clearance is the measured clutter gap)
        tr.cfg = dataclasses.replace(
            tr.cfg, dagger=True, explore_ratio=1.0, explore_cap=0.5,
            explore_ratio_list=(0.5,),
            dagger_success_filter=SUCCESS_FILTER,
            demo_collision_filter=COL_FILTER
            or os.environ.get("DAGGER_COL_FILTER", "0") == "1",
        )
        # fresh worker: the dagger/explore flags are baked into the
        # jitted rollout at trace time
        tr.worker = RolloutWorker(tr.env, tr.cfg.agent, tr.cfg)
        d_losses = []
        for w in range(DAGGER_WAVES):
            stats = tr.collect()
            for _ in range(DAGGER_UPDATES_PER_WAVE):
                m = tr.train_iter()
                if m:
                    d_losses.append(m.get("bc_loss", float("nan")))
            if (w + 1) % 10 == 0:
                log(f"dagger wave {w+1}: rollout_success="
                    f"{stats['rollout_success']:.2f} "
                    f"bc_loss={np.mean(d_losses[-40:]):.4f} "
                    f"buffer={stats['buffer_idx']}")
                save_agent(tr.agent_state, OUT)
                if SNAP_EVERY:
                    # dagger-phase curve points (eval_snaps.py reads
                    # snap_<update_step>, so key on the global step)
                    snap = os.path.join(
                        OUT, f"snap_{int(tr.agent_state.update_step)}")
                    os.makedirs(snap, exist_ok=True)
                    save_agent(tr.agent_state, snap)
            if time.time() - t_start > MAX_HOURS * 3600:
                log("total time budget hit in dagger phase")
                break
        save_agent(tr.agent_state, OUT)
        with open(os.path.join(OUT, "train_stats.json"), "w") as f:
            json.dump({
                "updates": int(tr.agent_state.update_step),
                "n_data": n_data,
                "dagger_waves": w + 1,
                "loss_first25": float(np.mean(losses[:25])) if losses else None,
                "loss_last25": float(np.mean(d_losses[-25:])) if d_losses else None,
            }, f)
        log(f"dagger phase done: {len(d_losses)} updates, bc_loss "
            f"{np.mean(d_losses[-25:]) if d_losses else float('nan'):.4f}")


if __name__ == "__main__":
    main()
