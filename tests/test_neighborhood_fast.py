"""The neighborhood kernel family (ops/pallas_neighborhood + the
single-district temperature/occupant post-pass, VERDICT r4 #3): the five
previously scan-only datasets — three EULP county neighborhoods (47-100
heterogeneous LSTM-dynamics buildings) and the two quebec occupant sets —
must produce the SAME full normalized KPI table as the XLA scan path.

The comparison baseline is the UNBATCHED scan (collect_episode +
kpi_table): the vmapped scan's matmul reordering can flip borderline
comfort-band crossings (discomfort KPIs count threshold crossings), a
float-noise artifact of the scan path itself, not of the kernel — the
kernel+post-pass reproduces the unbatched scan bit-tight.

With this family every one of the 25 bundled datasets classifies onto a
kernel (``test_all_25_datasets_kernel_classified``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from citylearn_tpu.compiler.schema import compile_schema
from citylearn_tpu.core import rollout_fast
from citylearn_tpu.core.evaluate import collect_episode, kpi_table
from citylearn_tpu.core.evaluate_fast import (
    ScriptedPolicy,
    evaluate_scripted,
    kernel_family,
)
from citylearn_tpu.core.params import initial_state, pack

DATASETS = "/root/reference/data/datasets"
HRS = np.arange(1, 25)
POLICY = ScriptedPolicy({
    "cooling_or_heating_device": np.where(HRS < 12, 0.6, -0.5
                                          ).astype(np.float32),
    "heating_device": np.where(HRS < 8, 0.9, 0.4).astype(np.float32),
    "electrical_storage": np.where(HRS < 9, 0.091, -0.08).astype(np.float32),
})
BASE = "_without_storage_and_partial_load"


def _compare(name, steps, policy=POLICY, data_offset=0):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spec = compile_schema(f"{DATASETS}/{name}/schema.json",
                              random_seed=0, episode_time_steps=steps)
    cfg, params, _ = pack(spec)
    assert kernel_family(cfg) == "neighborhood"
    assert rollout_fast.neighborhood_packable(cfg, params)
    S = cfg.time_steps - 1

    st0 = initial_state(cfg, params, data_offset)
    stf, coll = jax.jit(lambda p, s: collect_episode(
        cfg, p, s, policy.as_policy_fn(cfg, params, S), S))(params, st0)
    slow = jax.jit(lambda p, c: kpi_table(
        cfg, p, c, jnp.int32(data_offset), BASE,
        final_state=stf))(params, coll)

    fast = evaluate_scripted(cfg, params, policy, baseline_condition=BASE,
                             interpret=True, data_offset=data_offset)
    assert set(slow) == set(fast)
    for k in sorted(slow):
        np.testing.assert_allclose(
            np.asarray(slow[k]), np.asarray(fast[k]), rtol=5e-4, atol=5e-4,
            equal_nan=True, err_msg=f"KPI mismatch in {k}")
    return cfg, params


def test_vt_chittenden_full_table():
    _compare("vt_chittenden_county_neighborhood", 72)


def test_ca_alameda_full_table():
    """100 heterogeneous LSTM buildings — beyond any single-tile lane
    packing; the temperature sequence rides the post-pass instead."""
    _compare("ca_alameda_county_neighborhood", 60)


def test_tx_travis_full_table():
    _compare("tx_travis_county_neighborhood", 60)


def test_quebec_with_dr_full_table():
    """Occupant thermostat interaction + heating-side partial load +
    ComfortReward: overrides and the occupant-patched final row must
    flow through the post-pass into the discomfort KPIs."""
    cfg, params = _compare(
        "quebec_neighborhood_with_demand_response_set_points", 120)
    assert cfg.has_occupant


def test_quebec_without_dr_full_table():
    _compare("quebec_neighborhood_without_demand_response_set_points", 120)


def test_neighborhood_shifted_window():
    """Episode-window support extends to the new family."""
    _compare("vt_chittenden_county_neighborhood", 72, data_offset=48)


def test_all_25_datasets_kernel_classified():
    """VERDICT r4 #3 acceptance: kernel_family over every bundled schema
    returns non-None — 25/25 datasets ride a whole-episode kernel."""
    import os
    import warnings

    names = sorted(os.listdir(DATASETS))
    assert len(names) == 25
    families = {}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for name in names:
            spec = compile_schema(f"{DATASETS}/{name}/schema.json",
                                  random_seed=0)
            cfg, params, _ = pack(spec)
            fam = kernel_family(cfg)
            if fam == "lstm" and not rollout_fast.lstm_packable(cfg, params):
                fam = None
            if fam == "neighborhood" \
                    and not rollout_fast.neighborhood_packable(cfg, params):
                fam = None
            families[name] = fam
    missing = [n for n, f in families.items() if f is None]
    assert not missing, f"datasets off the kernels: {missing}"
    counts = {}
    for f in families.values():
        counts[f] = counts.get(f, 0) + 1
    assert counts.get("neighborhood", 0) == 5
