"""Does the RL path work? Lift a WEAK BC baseline with online TD3.

The round-3 negative result (RESULTS.md) showed RL degrading a BC
policy that already matches the expert -- but that is not the RL
path's job. In the reference, actor-critic RL earns its keep by
improving on an imperfect BC baseline through the agent's own rollouts
(reference: experiments/cfgs/td3_critic_aux_policy_aux.yaml,
core/train_online.py:531-574, core/ddpg.py:146-185). This experiment
reproduces that setting at this build's scale:

  weak     BC on a 2,500-transition slice of the expert buffer (a
           deliberately data-starved baseline)
  rl       from the weak checkpoint: online TD3 -- explore=1.0 (every
           rollout is the policy's own; NO new expert data ever enters),
           on-policy buffer mixed into each batch, policy loss =
           0.9*BC(weak expert slice) + 0.1*(-min Q) on self rollouts
           (the reference's mix), critic + goal-aux on
  control  from the same weak checkpoint: the same number of EXTRA BC
           updates on the same static 2,500 transitions, no interaction
           -- isolates "RL + own rollouts" from "more gradient steps"

All three evaluate on the flagship's fixed 200-scene protocol
(output/bc_long_r3/eval_scenes.npz). If rl > weak and rl > control,
the DDPG/TD3 machinery demonstrably works here; the round-3 result is
then a ceiling effect, not a defect.

    ARM=weak|rl|control python experiments/scripts/rl_lift.py
    ARM=report python experiments/scripts/rl_lift.py

Env knobs: N_WEAK (2500), WEAK_UPDATES (800), RL_ITERS (250),
UPDATES_PER_ITER (8), ENVS (24), BATCH (64), DATA (output/bc_long_r3),
OUT (output/rl_lift). Runs on the default platform (axon).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401

from gaddpg_tpu import replay  # noqa: E402
from gaddpg_tpu.envs.assets import library_from_index, verify_library_grasps  # noqa: E402
from gaddpg_tpu.envs.scenes import load_scenes  # noqa: E402
from gaddpg_tpu.replay.npz_io import load_npz  # noqa: E402
from gaddpg_tpu.train.checkpoints import load_agent, save_agent  # noqa: E402
from gaddpg_tpu.train.config import load_config  # noqa: E402
from gaddpg_tpu.train.loop import Trainer  # noqa: E402

ARM = os.environ.get("ARM", "weak")
N_WEAK = int(os.environ.get("N_WEAK", 2500))
WEAK_UPDATES = int(os.environ.get("WEAK_UPDATES", 800))
RL_ITERS = int(os.environ.get("RL_ITERS", 250))
UPDATES_PER_ITER = int(os.environ.get("UPDATES_PER_ITER", 8))
ENVS = int(os.environ.get("ENVS", 24))
BATCH = int(os.environ.get("BATCH", 64))
DATA = os.environ.get("DATA", "output/bc_long_r3")
OUT = os.environ.get("OUT", "output/rl_lift")


def log(arm, msg):
    line = f"[{time.strftime('%H:%M:%S')}] [{arm}] {msg}"
    print(line, flush=True)
    with open(os.path.join(OUT, "run.log"), "a") as f:
        f.write(line + "\n")


def fixed_eval(tr):
    scenes = load_scenes(os.path.join(DATA, "eval_scenes.npz"))
    n_scenes = len(np.asarray(scenes["obj_idx"]))
    waves = -(-n_scenes // tr.cfg.num_envs)
    rate, _ = tr.evaluate(episodes=waves, scenes=scenes)
    return rate


def make_trainer(policy, extra=None):
    over = {
        "num_envs": ENVS, "batch_size": BATCH, "index_file": "ycb",
        "output_dir": OUT,
    }
    over.update(extra or {})
    cfg = load_config(overrides=over, policy=policy)
    lib = verify_library_grasps(library_from_index("ycb", "train"))
    return Trainer(cfg, lib=lib)


def load_weak_buffer(cfg_buffer_size, num_points):
    # first N_WEAK transitions of the flagship expert buffer -- the
    # deliberately data-starved slice shared by every arm
    return load_npz(os.path.join(DATA, "bc_demos.npz"),
                    buffer_size=cfg_buffer_size, num_points=num_points)


def arm_weak():
    tr = make_trainer("BC", {"buffer_size": N_WEAK})
    tr.buffer = load_weak_buffer(N_WEAK, tr.cfg.env.uniform_num_pts + 6)
    log("weak", f"buffer: {int(tr.buffer.filled)} transitions")
    t0 = time.time()
    for i in range(WEAK_UPDATES):
        m = tr.train_iter()
        if (i + 1) % 100 == 0:
            log("weak", f"upd {i+1}: bc={m.get('bc_loss', float('nan')):.4f} "
                f"({(time.time()-t0)/(i+1):.2f}s/upd)")
    save_agent(tr.agent_state, os.path.join(OUT, "weak"))
    rate = fixed_eval(tr)
    log("weak", f"fixed-scene success: {rate:.3f}")
    json.dump({"arm": "weak", "success": rate, "updates": WEAK_UPDATES,
               "n_data": N_WEAK},
              open(os.path.join(OUT, "weak.json"), "w"))


def arm_rl():
    # the reference's online posture minus fresh expert data: every
    # rollout is the policy's own (explore 1.0), on-policy buffer mixed
    # 0.5 per batch, mix_policy_ratio 0.1 (-Q term), dagger OFF
    tr = make_trainer("DDPG", {
        "buffer_size": N_WEAK,
        "RL": True,
        "onpolicy": True,
        "online_buffer_size": 30000,
        "online_buffer_ratio": 0.5,
        "explore_ratio": 1.0,
        "explore_cap": 1.0,
        "explore_ratio_list": (1.0,),
        "mix_policy_ratio_list": (0.1,),
        "updates_per_step": UPDATES_PER_ITER,
        "dagger": False,
        "max_epoch": 10 ** 9,
    })
    tr.buffer = load_weak_buffer(N_WEAK, tr.cfg.env.uniform_num_pts + 6)
    weak = load_agent(tr.agent_state, os.path.join(OUT, "weak"))
    assert weak is not None, "run ARM=weak first"
    tr.agent_state = weak
    log("rl", f"expert buffer {int(tr.buffer.filled)} (static); "
        f"online buffer {tr.cfg.online_buffer_size}")
    t0 = time.time()
    succ_hist = []
    for it in range(1, RL_ITERS + 1):
        stats = tr.collect()
        m = tr.train_iter()
        succ_hist.append(stats["rollout_success"])
        if it % 20 == 0 or it == 1:
            log("rl", f"iter {it}: rollout_success="
                f"{np.mean(succ_hist[-20:]):.2f} "
                f"critic={m.get('critic_loss', float('nan')):.4f} "
                f"bc={m.get('bc_loss', float('nan')):.4f} "
                f"onbuf={int(replay.upper_idx(tr.online_buffer))} "
                f"({(time.time()-t0)/60:.0f}m)")
            save_agent(tr.agent_state, os.path.join(OUT, "rl"))
    save_agent(tr.agent_state, os.path.join(OUT, "rl"))
    rate = fixed_eval(tr)
    log("rl", f"fixed-scene success: {rate:.3f}")
    json.dump({"arm": "rl", "success": rate, "iters": RL_ITERS,
               "updates": RL_ITERS * UPDATES_PER_ITER,
               "rollout_success_last20": float(np.mean(succ_hist[-20:]))},
              open(os.path.join(OUT, "rl.json"), "w"))


def arm_control():
    tr = make_trainer("BC", {"buffer_size": N_WEAK})
    tr.buffer = load_weak_buffer(N_WEAK, tr.cfg.env.uniform_num_pts + 6)
    weak = load_agent(tr.agent_state, os.path.join(OUT, "weak"))
    assert weak is not None, "run ARM=weak first"
    tr.agent_state = weak
    n = RL_ITERS * UPDATES_PER_ITER
    log("control", f"{n} extra BC updates on the static weak buffer")
    t0 = time.time()
    for i in range(n):
        m = tr.train_iter()
        if (i + 1) % 400 == 0:
            log("control", f"upd {i+1}: bc={m.get('bc_loss', float('nan')):.4f} "
                f"({(time.time()-t0)/(i+1):.2f}s/upd)")
    save_agent(tr.agent_state, os.path.join(OUT, "control"))
    rate = fixed_eval(tr)
    log("control", f"fixed-scene success: {rate:.3f}")
    json.dump({"arm": "control", "success": rate, "updates": n},
              open(os.path.join(OUT, "control.json"), "w"))


def report():
    for arm in ("weak", "rl", "control"):
        p = os.path.join(OUT, f"{arm}.json")
        if os.path.exists(p):
            r = json.load(open(p))
            print(f"{arm:8s} success={r['success']:.3f} "
                  f"updates={r.get('updates')}")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    if ARM == "report":
        report()
    else:
        {"weak": arm_weak, "rl": arm_rl, "control": arm_control}[ARM]()
