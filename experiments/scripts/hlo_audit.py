"""HLO instruction audit of the batched env step (round-4 verdict item
1: the driver bench crept 10.7k -> 9.4k steps/s between rounds 1 and 4
with no op-level attribution; on this device per-op dispatch dominates,
so EXECUTED op count is the cost model).

Parses the optimized HLO module per computation, detects while loops +
their trip counts, and reports an execution-weighted instruction count:

    executed = entry ops + sum(while body ops * trip count)

(fusions count as one dispatched op; a 150-substep physics loop's body
is multiplied by 150).

    python experiments/scripts/hlo_audit.py            # axon (bench device)
    PROFILE_DEVICE=cpu python experiments/scripts/hlo_audit.py
Env knobs: BENCH_ENVS (1024), HLO_DUMP=/path to save full HLO text.
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if os.environ.get("PROFILE_DEVICE") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

NUM_ENVS = int(os.environ.get("BENCH_ENVS", 1024))

NOCOST = {"parameter", "constant", "tuple", "get-tuple-element",
          "bitcast", "after-all"}


def parse_computations(txt):
    """-> {comp_name: Counter(opcode)} plus while-loop edges
    {caller_body_op_line: (cond_comp, body_comp)}."""
    comps = {}
    whiles = []  # (comp, body_name, cond_name)
    cur = None
    for line in txt.splitlines():
        m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s+\([^)]*\)\s*->", line)
        if m and "=" not in line.split("(")[0]:
            cur = m.group(1)
            comps[cur] = collections.Counter()
            continue
        if cur is None:
            continue
        m = re.match(r"\s+(?:ROOT\s+)?%?[\w.\-]+\s*=\s*\S+\s+([\w\-]+)\(", line)
        if m:
            op = m.group(1)
            comps[cur][op] += 1
            if op == "while":
                mb = re.search(r"body=%?([\w.\-]+)", line)
                mc = re.search(r"condition=%?([\w.\-]+)", line)
                whiles.append((cur, mb.group(1) if mb else None,
                               mc.group(1) if mc else None))
    return comps, whiles


def cost(counter):
    return sum(v for k, v in counter.items() if k not in NOCOST)


def audit(name, fn, *args, trip_hint=None):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    dump = os.environ.get("HLO_DUMP")
    if dump:
        with open(f"{dump}.{name.replace(' ', '_')}.hlo", "w") as f:
            f.write(txt)
    comps, whiles = parse_computations(txt)
    entry = None
    for line in txt.splitlines():
        m = re.match(r"ENTRY\s+%?([\w.\-]+)", line)
        if m:
            entry = m.group(1)
            break
    base = cost(comps.get(entry, collections.Counter()))
    # execution-weighted: add body cost * trip count for each while.
    # trip counts are not in HLO text; use trip_hint map {body_substr: n}
    # (defaults to 1 if unknown -- reported so the reader can weight).
    weighted = base
    detail = []
    for caller, body, cond_ in whiles:
        bc = cost(comps.get(body, collections.Counter()))
        cc = cost(comps.get(cond_, collections.Counter()))
        trips = 1
        if trip_hint:
            for sub, n in trip_hint.items():
                if body and sub in body:
                    trips = n
                    break
        weighted += (bc + cc) * trips
        detail.append(f"while[{body}]: body={bc} cond={cc} x{trips}")
    top = ", ".join(
        f"{k}:{v}" for k, v in comps.get(entry, collections.Counter()).most_common(10)
        if k not in NOCOST)
    print(f"{name:26s} entry={base:5d} weighted={weighted:7d}  {top}", flush=True)
    for d in detail:
        print(f"    {d}", flush=True)
    return weighted


def main():
    from gaddpg_tpu.envs import EnvParams, PandaGraspEnv
    from gaddpg_tpu.envs.assets import library_from_index
    from gaddpg_tpu.physics.fast import fast_physics_step

    print(f"platform: {jax.devices()[0].platform}, {NUM_ENVS} envs", flush=True)
    lib = library_from_index("ycb", "train")
    env = PandaGraspEnv(EnvParams(), lib)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, NUM_ENVS)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)
    actions = jnp.zeros((NUM_ENVS, 6)).at[:, 2].set(0.02)
    sk = jax.random.split(jax.random.fold_in(key, 1), NUM_ENVS)

    sub = env.p.physics.substeps if hasattr(env.p.physics, "substeps") else 150
    hint = {"": sub}  # weight every while body by the substep count

    audit("FULL step_batched", env.step_batched, states, actions, sk,
          trip_hint=hint)
    audit("apply_action (IK)", jax.vmap(env._apply_action), states, actions,
          trip_hint=hint)

    def phys(st):
        return fast_physics_step(
            env.p.physics, st.phys, lib.spheres[st.obj_idx],
            lib.mass[st.obj_idx], lib.inertia[st.obj_idx], scan_impl="xla")
    audit("physics (xla scan)", phys, states, trip_hint=hint)

    sk2 = jax.vmap(lambda k: jax.random.fold_in(k, 1))(sk)
    audit("observe", jax.vmap(env._observe), states, sk2, trip_hint=hint)


if __name__ == "__main__":
    main()
