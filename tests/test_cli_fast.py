"""CLI ``simulate <schema> evaluate --fast``: the whole-episode-kernel
evaluation must agree with the host-stepped slow path — same KPI pivot
(where both produce a value) and identical exported control time series
(reference ``__main__.py:197-275`` + ``citylearn.py:1136-1323``)."""

import json
import os

import numpy as np
import pytest

from citylearn_tpu.cli import Simulator, main

SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"
WINDOW = (0, 167)


@pytest.fixture(scope="module")
def both(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli_fast"))
    slow = Simulator.evaluate(
        schema=SCHEMA, agent_name="citylearn.agents.rbc.BasicRBC",
        evaluation_episode_time_steps=WINDOW, simulation_id="slow",
        output_directory=out)
    fast = Simulator.evaluate(
        schema=SCHEMA, agent_name="citylearn.agents.rbc.BasicRBC",
        evaluation_episode_time_steps=WINDOW, simulation_id="fast",
        output_directory=out, fast=True)
    load = lambda sid: json.load(
        open(os.path.join(out, f"{sid}-evaluation.json")))
    return load("slow"), load("fast")


def test_kpi_pivot_matches(both):
    slow, fast = both
    assert fast["kpis"], "fast path produced no KPIs"
    shared = 0
    for kpi, cols in fast["kpis"].items():
        assert kpi in slow["kpis"], f"fast-only KPI {kpi}"
        for name, v in cols.items():
            w = slow["kpis"][kpi].get(name)
            if v is None or w is None:
                continue
            shared += 1
            assert abs(v - w) <= 2e-5 * max(1.0, abs(w)), \
                f"{kpi}/{name}: fast {v} vs slow {w}"
    assert shared >= 40      # the full building + district table compared


def test_time_series_match(both):
    slow, fast = both
    for bname, cols in fast["time_series"].items():
        for var, vals in cols.items():
            ref = slow["time_series"][bname].get(var)
            assert ref is not None, f"{var} missing from slow export"
            np.testing.assert_allclose(
                np.asarray(vals), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"{bname}/{var}")


def test_thermal_family_cli_fast(tmp_path):
    """2021 thermal family through the CLI fast path vs the slow path."""
    schema = "/root/reference/data/datasets/citylearn_challenge_2021/schema.json"
    out = str(tmp_path)
    for sid, fast in (("slow", False), ("fast", True)):
        Simulator.evaluate(
            schema=schema, agent_name="citylearn.agents.rbc.OptimizedRBC",
            evaluation_episode_time_steps=(0, 119), simulation_id=sid,
            output_directory=out, fast=fast)
    load = lambda sid: json.load(
        open(os.path.join(out, f"{sid}-evaluation.json")))
    slow, fast = load("slow"), load("fast")
    for kpi, cols in fast["kpis"].items():
        for name, v in cols.items():
            w = slow["kpis"][kpi].get(name)
            if v is None or w is None:
                continue
            assert abs(v - w) <= 5e-5 * max(1.0, abs(w)), \
                f"{kpi}/{name}: fast {v} vs slow {w}"
    b0 = next(iter(fast["time_series"]))
    for var, vals in fast["time_series"][b0].items():
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(slow["time_series"][b0][var]),
            rtol=5e-5, atol=5e-5, err_msg=var)


def test_lstm_family_cli_fast(tmp_path):
    """2023 LSTM-dynamics family through the CLI fast path vs slow."""
    schema = ("/root/reference/data/datasets/citylearn_challenge_2023_phase_1/"
              "schema.json")
    out = str(tmp_path)
    for sid, fast in (("slow", False), ("fast", True)):
        Simulator.evaluate(
            schema=schema, agent_name="citylearn.agents.rbc.BasicRBC",
            evaluation_episode_time_steps=(0, 119), simulation_id=sid,
            output_directory=out, fast=fast)
    load = lambda sid: json.load(
        open(os.path.join(out, f"{sid}-evaluation.json")))
    slow, fast = load("slow"), load("fast")
    for kpi, cols in fast["kpis"].items():
        for name, v in cols.items():
            w = slow["kpis"][kpi].get(name)
            if v is None or w is None:
                continue
            assert abs(v - w) <= 5e-4 * max(1.0, abs(w)), \
                f"{kpi}/{name}: fast {v} vs slow {w}"
    b0 = next(iter(fast["time_series"]))
    for var, vals in fast["time_series"][b0].items():
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(slow["time_series"][b0][var]),
            rtol=5e-4, atol=5e-3, err_msg=var)


def test_ev_family_cli_fast(tmp_path):
    """plus_evs family through the CLI fast path: per-charger RBC hour
    maps routed onto the kernel's charger plan axis."""
    schema = ("/root/reference/data/datasets/"
              "citylearn_challenge_2022_phase_all_plus_evs/schema.json")
    out = str(tmp_path)
    for sid, fast in (("slow", False), ("fast", True)):
        Simulator.evaluate(
            schema=schema,
            agent_name="citylearn.agents.rbc."
                       "BasicElectricVehicleRBC_ReferenceController",
            evaluation_episode_time_steps=(0, 119), simulation_id=sid,
            output_directory=out, fast=fast)
    load = lambda sid: json.load(
        open(os.path.join(out, f"{sid}-evaluation.json")))
    slow, fast = load("slow"), load("fast")
    shared = 0
    for kpi, cols in fast["kpis"].items():
        for name, v in cols.items():
            w = slow["kpis"][kpi].get(name)
            if v is None or w is None:
                continue
            shared += 1
            assert abs(v - w) <= 5e-4 * max(1.0, abs(w)), \
                f"{kpi}/{name}: fast {v} vs slow {w}"
    assert shared >= 40
    b0 = next(iter(fast["time_series"]))
    for var, vals in fast["time_series"][b0].items():
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(slow["time_series"][b0][var]),
            rtol=5e-4, atol=5e-3, err_msg=var)


def test_fast_shifted_window_matches_slow(tmp_path):
    """--fast on a NON-default episode window (VERDICT r4 #4): the kernel
    path slides the driver series, hour tables and KPI window to the
    offset and must agree with the host-stepped slow path on the shifted
    rows (previously --fast rejected any offset)."""
    out = str(tmp_path)
    for sid, fast in (("slow", False), ("fast", True)):
        Simulator.evaluate(
            schema=SCHEMA, agent_name="citylearn.agents.rbc.BasicRBC",
            evaluation_episode_time_steps=(24, 119), simulation_id=sid,
            output_directory=out, fast=fast)
    load = lambda sid: json.load(
        open(os.path.join(out, f"{sid}-evaluation.json")))
    slow, fast = load("slow"), load("fast")
    shared = 0
    for kpi, cols in fast["kpis"].items():
        for name, v in cols.items():
            w = slow["kpis"][kpi].get(name)
            if v is None or w is None:
                continue
            shared += 1
            assert abs(v - w) <= 2e-5 * max(1.0, abs(w)), \
                f"{kpi}/{name}: fast {v} vs slow {w}"
    assert shared >= 40
    b0 = next(iter(fast["time_series"]))
    for var, vals in fast["time_series"][b0].items():
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(slow["time_series"][b0][var]),
            rtol=2e-5, atol=2e-5, err_msg=var)


def test_fast_neighborhood_family(tmp_path):
    """The neighborhood kernel family (47-building EULP county set with
    signed cooling_or_heating partial load) through the CLI --fast
    dispatch: KPI pivot + exported control series vs the host-stepped
    slow path."""
    schema = ("/root/reference/data/datasets/"
              "vt_chittenden_county_neighborhood/schema.json")
    out = str(tmp_path)
    for sid, fast in (("slow", False), ("fast", True)):
        Simulator.evaluate(
            schema=schema, agent_name="citylearn.agents.rbc.BasicRBC",
            evaluation_episode_time_steps=(0, 71), simulation_id=sid,
            output_directory=out, fast=fast)
    load = lambda sid: json.load(
        open(os.path.join(out, f"{sid}-evaluation.json")))
    slow, fast = load("slow"), load("fast")
    shared = 0
    for kpi, cols in fast["kpis"].items():
        for name, v in cols.items():
            w = slow["kpis"][kpi].get(name)
            if v is None or w is None:
                continue
            shared += 1
            assert abs(v - w) <= 5e-4 * max(1.0, abs(w)), \
                f"{kpi}/{name}: fast {v} vs slow {w}"
    assert shared >= 40
    b0 = next(iter(fast["time_series"]))
    for var, vals in fast["time_series"][b0].items():
        ref = slow["time_series"][b0].get(var)
        if ref is None:
            continue
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref), rtol=5e-4, atol=5e-3,
            err_msg=var)


def test_fast_rejects_closed_loop_agent(tmp_path):
    with pytest.raises(ValueError, match="open-loop"):
        Simulator.evaluate(
            schema=SCHEMA, agent_name="citylearn.agents.sac.SAC",
            evaluation_episode_time_steps=(0, 47),
            simulation_id="bad", output_directory=str(tmp_path), fast=True)


def test_cli_flag_parses(tmp_path):
    main(["simulate", SCHEMA, "evaluate", "--fast",
          "-a", "citylearn.agents.rbc.BasicRBC", "-id", "cli",
          "-d", str(tmp_path),
          "-k", json.dumps({"episode_time_steps": [[0, 95]]})])
    d = json.load(open(os.path.join(str(tmp_path), "cli-evaluation.json")))
    assert "cost_total" in d["kpis"] and d["kpis"]["cost_total"]["District"]
