"""Generate golden parity traces from the reference CityLearn (CPU).

Runs the reference implementation at /root/reference on selected configs,
recording returned observations, rewards, per-building series and final
KPIs. Traces are stored as npz under tests/golden/ and loaded by
tests/test_parity.py. Network access is stubbed (zero-egress sandbox).

Usage: python tools/make_golden.py [--quick]
"""

import argparse
import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/reference")

from citylearn.data import DataSet  # noqa: E402

DataSet.get_pv_sizing_data = lambda self: pd.DataFrame()
DataSet.get_battery_sizing_data = lambda self: pd.DataFrame()

from citylearn.citylearn import CityLearnEnv  # noqa: E402

# EVs without an initial_soc draw from the *unseeded* `random` module
# (citylearn.py:2564) — pin to the midpoint (0.5 for (0,1)) to match the
# rebuild's documented deterministic default.
import citylearn.citylearn as _cl_mod  # noqa: E402
_cl_mod.random.uniform = lambda a, b: (a + b) / 2

DATASETS = "/root/reference/data/datasets"
OUT = "/root/repo/tests/golden"


def rollout(env, policy, n_steps=None):
    obs, _ = env.reset()
    observations = [[list(map(float, o)) for o in obs]]
    rewards = []
    steps = 0
    while not env.terminated and (n_steps is None or steps < n_steps):
        actions = policy(env, steps)
        obs, r, term, trunc, _ = env.step(actions)
        observations.append([list(map(float, o)) for o in obs])
        rewards.append(list(map(float, r)))
        steps += 1
    return observations, rewards


def zero_policy(env, step):
    return [[0.0] * s.shape[0] for s in (env.action_space if not env.central_agent
                                         else env.action_space)]


def make_scripted_policy(seed):
    rng = np.random.RandomState(seed)

    def policy(env, step):
        return [list(rng.uniform(s.low, s.high).astype(float))
                for s in env.action_space]
    return policy


def record(name, schema, policy_name, episode_time_steps, central_agent=False,
           seed=0):
    env = CityLearnEnv(schema, central_agent=central_agent,
                       episode_time_steps=episode_time_steps, random_seed=seed)
    policy = {"zero": zero_policy, "scripted": make_scripted_policy(123)}[policy_name]
    # seed the global RNG so the unconnected-EV SOC drift (citylearn.py:1473,
    # drawn from np.random) matches our seeded replication stream
    np.random.seed(seed)
    t0 = time.time()
    observations, rewards = rollout(env, policy)
    elapsed = time.time() - t0
    kpis = env.evaluate()
    per_building = {}
    for b in env.buildings:
        per_building[b.name] = {
            "net": np.asarray(b.net_electricity_consumption, np.float64),
            "soc": np.asarray(b.electrical_storage.soc, np.float64),
            "battery_cons": np.asarray(b.electrical_storage.electricity_consumption, np.float64),
            "solar": np.asarray(b.solar_generation, np.float64),
        }
    # observations is ragged only across agents; store as object -> flatten
    obs_arr = np.asarray([np.concatenate([np.asarray(a, np.float64) for a in o])
                          for o in observations])
    rew_arr = np.asarray(rewards, np.float64)
    np.savez_compressed(
        f"{OUT}/{name}.npz",
        observations=obs_arr,
        rewards=rew_arr,
        kpi_names=np.asarray([f"{r.level}|{r.name}|{r.cost_function}"
                              for r in kpis.itertuples()]),
        kpi_values=np.asarray([np.nan if r.value is None else float(r.value)
                               for r in kpis.itertuples()]),
        obs_names=np.asarray(["|".join(names) for names in env.observation_names]),
        elapsed=np.asarray([elapsed]),
        steps=np.asarray([len(rewards)]),
        **{f"b_{k}_{f}": v for k, d in per_building.items() for f, v in d.items()},
    )
    steps_per_sec = len(rewards) / elapsed if elapsed > 0 else 0
    print(f"{name}: {len(rewards)} steps in {elapsed:.2f}s "
          f"({steps_per_sec:.0f} steps/s), KPIs={len(kpis)} rows")
    return steps_per_sec


def record_wrappers(seed=0):
    """Golden traces for the Discrete/TabularQ/RLlib interop wrappers
    (reference wrappers.py:241-515, 664-856)."""
    from citylearn.wrappers import (
        DiscreteSpaceWrapper,
        TabularQLearningWrapper,
    )

    schema = f"{DATASETS}/citylearn_challenge_2022_phase_1/schema.json"

    # --- Discrete (decentralized, default 10 bins) ---
    env = DiscreteSpaceWrapper(CityLearnEnv(
        schema, central_agent=False, episode_time_steps=48, random_seed=seed))
    obs0, _ = env.reset()
    acts = [[7] * s.shape[0] for s in env.action_space]
    obs1, r1, *_ = env.step(acts)
    np.savez_compressed(
        f"{OUT}/wrap_discrete.npz",
        obs_nvec=np.concatenate([s.nvec for s in env.observation_space]),
        act_nvec=np.concatenate([s.nvec for s in env.action_space]),
        obs0=np.asarray(obs0, np.int64), obs1=np.asarray(obs1, np.int64),
        rewards=np.asarray(r1, np.float64))

    # --- TabularQ (tiny active surface to keep the cross-product small) ---
    env = TabularQLearningWrapper(
        CityLearnEnv(schema, central_agent=False, episode_time_steps=48,
                     random_seed=seed, active_observations=["hour"],
                     active_actions=["electrical_storage"]),
        default_observation_bin_size=12, default_action_bin_size=5)
    obs0, _ = env.reset()
    obs_n = [s.n for s in env.observation_space]
    act_n = [s.n for s in env.action_space]
    obs1, r1, *_ = env.step([[3] for _ in act_n])
    obs2, r2, *_ = env.step([[0] for _ in act_n])
    np.savez_compressed(
        f"{OUT}/wrap_tabularq.npz",
        obs_n=np.asarray(obs_n), act_n=np.asarray(act_n),
        obs0=np.asarray(obs0, np.int64), obs1=np.asarray(obs1, np.int64),
        obs2=np.asarray(obs2, np.int64),
        r1=np.asarray(r1, np.float64), r2=np.asarray(r2, np.float64))

    # --- RLlib multi-agent dict protocol: the reference wrappers are pure
    # restructuring of the base env (wrappers.py:664-755: obs dict keyed
    # agent_<i>, dict actions -> list-of-lists via dict-value order, reward
    # dict); record the equivalent base trace with those conversions ---
    env = CityLearnEnv(schema, central_agent=False, episode_time_steps=48,
                       random_seed=seed)
    obs0_l, _ = env.reset()
    agent_ids = [f"agent_{i}" for i in range(len(env.buildings))]
    acts = [[0.25] * s.shape[0] for s in env.action_space]
    obs1_l, r1, *_ = env.step(acts)
    np.savez_compressed(
        f"{OUT}/wrap_rllib_ma.npz",
        agent_ids=np.asarray(agent_ids),
        obs0=np.stack([np.asarray(o, np.float64) for o in obs0_l]),
        obs1=np.stack([np.asarray(o, np.float64) for o in obs1_l]),
        rewards=np.asarray(r1, np.float64))
    print("wrapper goldens: discrete, tabularq, rllib_ma")


def build_occupant_dataset(n_buildings=2, seed=7):
    """Synthesize the occupant decision-tree pickles the bundled quebec
    dataset ships without (reference occupant.py:49-56 crashes on the
    missing files) and write a trimmed dataset copy under tests/golden/.

    The logistic interaction parameters are rewritten with steep
    temperature-centered curves so increase/decrease/no-op/overlap paths
    all fire within a 168-step trace (indoor temperature sits at
    ~18.9-20.4 degC in the source data).
    """
    import os
    import pickle
    import shutil

    from sklearn.tree import DecisionTreeClassifier

    src = f"{DATASETS}/quebec_neighborhood_with_demand_response_set_points"
    out_dir = f"{OUT}/quebec_occ"
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{src}/schema.json") as f:
        schema = json.load(f)
    keep = list(schema["buildings"])[:n_buildings]
    schema["buildings"] = {n: schema["buildings"][n] for n in keep}
    schema["root_directory"] = None   # resolved from the schema file path

    needed = set()
    for b in schema["buildings"].values():
        for key in ("energy_simulation", "weather", "carbon_intensity", "pricing"):
            if b.get(key):
                needed.add(b[key])
        needed.add(b["dynamics"]["attributes"]["filename"])
    for fname in needed:
        shutil.copy(f"{src}/{fname}", f"{out_dir}/{fname}")
    if schema.get("buildings") and "pricing" not in list(schema["buildings"].values())[0]:
        shutil.copy(f"{src}/pricing.csv", f"{out_dir}/pricing.csv")

    rng = np.random.RandomState(seed)
    for b in schema["buildings"].values():
        # the reference never puts LSTMDynamics in eval mode, so the
        # quebec dropout=0.3 applies TRAINING-mode dropout at inference
        # (dynamics.py:99-105) making its predictions nondeterministic
        # (torch global RNG). The rebuild uses standard inference
        # semantics (dropout off); zero it here so the reference trace is
        # deterministic and comparable.
        b["dynamics"]["attributes"]["dropout"] = 0.0
        pname = b["occupant"]["parameters_filename"]
        pdf = pd.read_csv(f"{src}/{pname}")
        # p(increase)=0.5 at 19.4 degC falling with T; p(decrease)=0.5 at
        # 19.9 degC rising with T -> events in both directions plus the
        # both-fire no-op (occupant.py:79-90) within the trace window
        pdf["a_increase"] = 3.0 * 19.4
        pdf["b_increase"] = -3.0
        pdf["a_decrease"] = -3.0 * 19.9
        pdf["b_decrease"] = 3.0
        pdf.to_csv(f"{out_dir}/{pname}", index=False)
        for direction in ("increase", "decrease"):
            fname = b["occupant"]["attributes"][f"setpoint_{direction}_model_filename"]
            X = np.column_stack([
                rng.uniform(16.0, 24.0, 256),   # current setpoint
                rng.uniform(16.0, 24.0, 256),   # previous setpoint
                rng.uniform(-4.0, 4.0, 256),    # prev temp - prev setpoint
            ])
            y = rng.randint(0, 2, 256)          # classes = delta_output_map keys
            clf = DecisionTreeClassifier(
                max_depth=3, random_state=int(rng.randint(1 << 30))).fit(X, y)
            with open(f"{out_dir}/{fname}", "wb") as fh:
                pickle.dump(clf, fh)
    with open(f"{out_dir}/schema.json", "w") as fh:
        json.dump(schema, fh, indent=1)
    return f"{out_dir}/schema.json"


def record_occupant():
    """Occupant-interaction golden traces (reference building.py:3160-3353,
    occupant.py:62-99) on the synthesized-tree quebec copy. Also records
    the per-building setpoint/delta series and asserts the trace actually
    contains occupant events so the parity case cannot silently assert
    nothing."""
    schema_path = build_occupant_dataset()
    for case, policy_name in (("occ_zero_168", "zero"),
                              ("occ_scripted_168", "scripted")):
        env = CityLearnEnv(schema_path, central_agent=False,
                           episode_time_steps=168, random_seed=0)
        policy = {"zero": zero_policy,
                  "scripted": make_scripted_policy(123)}[policy_name]
        np.random.seed(0)
        observations, rewards = rollout(env, policy)
        kpis = env.evaluate()
        extra = {}
        n_events = 0
        for b in env.buildings:
            es = b.energy_simulation
            deltas = np.asarray(
                b.occupant.parameters
                .occupant_interaction_indoor_dry_bulb_temperature_set_point_delta,
                np.float64)
            n_events += int((np.abs(deltas) > 0).sum())
            extra[f"b_{b.name}_hsp"] = np.asarray(
                es.indoor_dry_bulb_temperature_heating_set_point, np.float64)
            extra[f"b_{b.name}_temp"] = np.asarray(
                es.indoor_dry_bulb_temperature, np.float64)
            extra[f"b_{b.name}_delta"] = deltas
        assert n_events > 0, "occupant trace recorded no setpoint events"
        obs_arr = np.asarray([np.concatenate([np.asarray(a, np.float64) for a in o])
                              for o in observations])
        np.savez_compressed(
            f"{OUT}/{case}.npz",
            observations=obs_arr,
            rewards=np.asarray(rewards, np.float64),
            kpi_names=np.asarray([f"{r.level}|{r.name}|{r.cost_function}"
                                  for r in kpis.itertuples()]),
            kpi_values=np.asarray([np.nan if r.value is None else float(r.value)
                                   for r in kpis.itertuples()]),
            obs_names=np.asarray(["|".join(ns) for ns in env.observation_names]),
            elapsed=np.asarray([0.0]), steps=np.asarray([len(rewards)]),
            **extra)
        print(f"{case}: {len(rewards)} steps, {n_events} occupant events")


def noisy_schema_dict(schema_path, noise_std):
    """Schema dict with per-building Gaussian observation noise enabled."""
    import os

    with open(schema_path) as f:
        schema = json.load(f)
    schema["root_directory"] = os.path.dirname(schema_path)
    for b in schema["buildings"].values():
        b["noise_std"] = noise_std
    return schema


def multi_reward_schema_dict(schema_path):
    """Schema dict whose reward_function.type is a per-building dict
    (reference citylearn.py:2108-2141 -> MultiBuildingRewardFunction)."""
    import os

    with open(schema_path) as f:
        schema = json.load(f)
    schema["root_directory"] = os.path.dirname(schema_path)
    names = [n for n, b in schema["buildings"].items() if b.get("include", True)]
    schema["reward_function"] = {
        "type": {
            names[0]: "citylearn.reward_function.SolarPenaltyReward",
            names[1]: "citylearn.reward_function.RewardFunction",
            "default": "citylearn.reward_function.IndependentSACReward",
        },
        "attributes": {
            names[1]: {"exponent": 2.0},
            "default": {},
        },
    }
    return schema


def record_multi_reward(name, schema_path, seed=0):
    schema = multi_reward_schema_dict(schema_path)
    env = CityLearnEnv(schema, central_agent=False, episode_time_steps=168,
                       random_seed=seed)
    np.random.seed(seed)
    policy = make_scripted_policy(123)
    obs, _ = env.reset()
    observations = [[list(map(float, o)) for o in obs]]
    rewards = []
    steps = 0
    while not env.terminated:
        obs, r, term, trunc, _ = env.step(policy(env, steps))
        observations.append([list(map(float, o)) for o in obs])
        # MultiBuildingRewardFunction returns per-building 1-lists
        # (reward_function.py:97-103) — flatten to (B,)
        rewards.append([float(np.ravel(v)[0]) for v in r])
        steps += 1
    rew_arr = np.asarray(rewards, np.float64)
    obs_arr = np.asarray([np.concatenate([np.asarray(a, np.float64) for a in o])
                          for o in observations])
    np.savez_compressed(f"{OUT}/{name}.npz", observations=obs_arr,
                        rewards=rew_arr,
                        kpi_names=np.asarray([], dtype="U1"),
                        kpi_values=np.asarray([], np.float64),
                        elapsed=np.asarray([0.0]),
                        steps=np.asarray([len(rewards)]))
    print(f"{name}: {len(rewards)} steps (multi-building reward)")


def record_noisy(name, schema_path, noise_std=0.25, seed=0):
    """Seeded noisy run: np.random.seed immediately before construction
    makes the reference's global-RNG noise draws (utilities.py:148-171)
    reproducible; the rebuild's seeded compile-time noise stream matches."""
    schema = noisy_schema_dict(schema_path, noise_std)
    np.random.seed(seed)
    env = CityLearnEnv(schema, central_agent=False, episode_time_steps=168,
                       random_seed=seed)
    policy = make_scripted_policy(123)
    observations, rewards = rollout(env, policy)
    kpis = env.evaluate()
    obs_arr = np.asarray([np.concatenate([np.asarray(a, np.float64) for a in o])
                          for o in observations])
    np.savez_compressed(
        f"{OUT}/{name}.npz",
        observations=obs_arr,
        rewards=np.asarray(rewards, np.float64),
        kpi_names=np.asarray([f"{r.level}|{r.name}|{r.cost_function}"
                              for r in kpis.itertuples()]),
        kpi_values=np.asarray([np.nan if r.value is None else float(r.value)
                               for r in kpis.itertuples()]),
        obs_names=np.asarray(["|".join(ns) for ns in env.observation_names]),
        elapsed=np.asarray([0.0]), steps=np.asarray([len(rewards)]))
    print(f"{name}: {len(rewards)} steps (noise_std={noise_std})")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--noisy-only", action="store_true")
    parser.add_argument("--year-only", action="store_true")
    parser.add_argument("--wrappers-only", action="store_true")
    parser.add_argument("--occupant-only", action="store_true")
    args = parser.parse_args()

    if args.wrappers_only:
        record_wrappers()
        return

    if args.occupant_only:
        record_occupant()
        return

    if args.year_only:
        record("c2021_scripted_year",
               f"{DATASETS}/citylearn_challenge_2021/schema.json",
               "scripted", 8760)
        record("c2023_scripted_full",
               f"{DATASETS}/citylearn_challenge_2023_phase_1/schema.json",
               "scripted", None)
        return

    if args.noisy_only:
        record_noisy("noise_scripted_168",
                     f"{DATASETS}/citylearn_challenge_2022_phase_1/schema.json")
        record_multi_reward("multi_reward_scripted_168",
                            f"{DATASETS}/citylearn_challenge_2021/schema.json")
        return

    schema_2023 = f"{DATASETS}/citylearn_challenge_2023_phase_1/schema.json"
    record("c2023_zero_168", schema_2023, "zero", 168)
    record("c2023_scripted_168", schema_2023, "scripted", 168)

    schema_2023p2 = f"{DATASETS}/citylearn_challenge_2023_phase_2_local_evaluation/schema.json"
    record("c2023p2_scripted_168", schema_2023p2, "scripted", 168)

    schema_evs = f"{DATASETS}/citylearn_challenge_2022_phase_all_plus_evs/schema.json"
    record("evs_zero_168", schema_evs, "zero", 168)
    record("evs_scripted_168", schema_evs, "scripted", 168)

    schema_2021 = f"{DATASETS}/citylearn_challenge_2021/schema.json"
    record_multi_reward("multi_reward_scripted_168", schema_2021)
    record("c2021_zero_168", schema_2021, "zero", 168)
    record("c2021_scripted_168", schema_2021, "scripted", 168)
    record("c2021_scripted_central_720", schema_2021, "scripted", 720,
           central_agent=True)

    schema_2022 = f"{DATASETS}/citylearn_challenge_2022_phase_1/schema.json"
    record_noisy("noise_scripted_168", schema_2022)
    perf = {}
    perf["p1_zero_168"] = record("phase1_zero_168", schema_2022, "zero", 168)
    perf["p1_scripted_168"] = record("phase1_scripted_168", schema_2022, "scripted", 168)
    perf["p1_scripted_central_168"] = record(
        "phase1_scripted_central_168", schema_2022, "scripted", 168, central_agent=True)
    if not args.quick:
        perf["p1_zero_year"] = record("phase1_zero_year", schema_2022, "zero", None)
        perf["p1_scripted_year"] = record("phase1_scripted_year", schema_2022, "scripted", None)
    # merge into the existing JSON so a --quick regen never silently drops
    # the year-long keys bench.py uses as its baseline denominator
    path = f"{OUT}/reference_perf.json"
    merged = {}
    try:
        with open(path) as f:
            merged = json.load(f)
    except FileNotFoundError:
        pass
    merged.update(perf)
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)


if __name__ == "__main__":
    main()
