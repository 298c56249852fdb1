"""EnergyPlus adapter + PySAM autosize code paths under mocks
(VERDICT r2 #8): the real-toolchain seams are exercised without the
EnergyPlus binary or PySAM installed — a synthetic EnergyPlus SQLite
output drives the extraction, a captured IDF checks the OtherEquipment
injection, and a fake PySAM module checks the reference-exact model
configuration (reference ``end_use_load_profiles/simulate.py:9-166``,
``energy_model.py:490-602``)."""

import os
import sqlite3
import sys
import types

import numpy as np
import pandas as pd
import pytest

from citylearn_tpu.end_use_load_profiles import energyplus as ep

N = 48
ZONES = [("LIVING", 300.0, 1.0), ("ATTIC", 100.0, 1.0)]


def _make_sqlite(path, with_other_equipment=False):
    """Minimal EnergyPlus output database: Zones + ReportData(+Dictionary)."""
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE Zones (ZoneName TEXT, Volume REAL, Multiplier REAL)")
    con.executemany("INSERT INTO Zones VALUES (?,?,?)", ZONES)
    con.execute("""CREATE TABLE ReportDataDictionary (
        ReportDataDictionaryIndex INTEGER, Name TEXT, KeyValue TEXT)""")
    con.execute("""CREATE TABLE ReportData (
        TimeIndex INTEGER, ReportDataDictionaryIndex INTEGER, Value REAL)""")
    rows, dd, idx = [], [], 0

    def add(name, key, values):
        nonlocal idx
        idx += 1
        dd.append((idx, name, key))
        rows.extend((t + 1, idx, float(v)) for t, v in enumerate(values))

    t = np.arange(N)
    add("Zone Air Temperature", "LIVING", 20.0 + 0.1 * t)
    add("Zone Air Temperature", "ATTIC", 30.0 + 0.1 * t)
    add("Zone Air Relative Humidity", "LIVING", np.full(N, 40.0))
    add("Zone Air Relative Humidity", "ATTIC", np.full(N, 60.0))
    add("Zone Thermostat Cooling Setpoint Temperature", "LIVING", np.full(N, 23.9))
    add("Zone Thermostat Heating Setpoint Temperature", "LIVING", np.full(N, 21.1))
    add("Zone Ideal Loads Zone Sensible Cooling Rate",
        "LIVING IDEAL LOADS AIR SYSTEM", 1000.0 * (t % 3 == 0))
    add("Zone Ideal Loads Zone Sensible Heating Rate",
        "LIVING IDEAL LOADS AIR SYSTEM", 500.0 * (t % 3 == 1))
    add("Water Use Equipment Heating Rate", "DHW", np.full(N, 200.0))
    add("Zone Lights Electricity Rate", "LIVING", np.full(N, 100.0))
    add("Zone Electric Equipment Electricity Rate", "LIVING", np.full(N, 300.0))
    add("Zone People Occupant Count", "LIVING", np.full(N, 2.0))
    if with_other_equipment:
        add("Other Equipment Convective Heating Rate",
            "LIVING PARTIAL COOLING_LOAD", -800.0 * (t % 2 == 0))
        add("Other Equipment Convective Heating Rate",
            "LIVING PARTIAL HEATING_LOAD", 400.0 * (t % 2 == 1))
    con.executemany("INSERT INTO ReportDataDictionary VALUES (?,?,?)", dd)
    con.executemany("INSERT INTO ReportData VALUES (?,?,?)", rows)
    con.commit()
    con.close()


IDF = """
Zone, LIVING, 0, 0, 0, 0, 1, 1;
ZoneHVAC:IdealLoadsAirSystem,
    LIVING Ideal Loads,
    ,
    LIVING supply,
    ;
Zone, ATTIC, 0, 0, 0, 0, 1, 1;
"""


@pytest.fixture
def simulator(tmp_path):
    captured = {}

    def runner(idf_path, epw_path, out_dir):
        with open(idf_path) as f:
            captured[os.path.basename(out_dir)] = f.read()
        sql = os.path.join(out_dir, "eplusout.sql")
        _make_sqlite(sql, with_other_equipment="partial" in out_dir)
        return sql

    epw = tmp_path / "weather.epw"
    lines = ["LOCATION,x,x,x,x,x,40.0,-105.0,-7.0,1650"] + [
        ",".join(["1970", "1", "1", str(h % 24 + 1), "0", "x",
                  "15.0", "0", "0", "0", "0", "0", "0", "400", "600",
                  "150", "0", "0", "0", "0", "0", "3.0"])
        for h in range(N)]
    epw.write_text("\n".join(lines))

    sim = ep.EnergyPlusSimulator(
        model_provider=lambda bldg_id: {"idf": IDF, "epw": str(epw)},
        run_energyplus=runner, output_directory=str(tmp_path / "out"))
    sim._captured = captured
    return sim


def test_ideal_extraction(simulator):
    out = simulator.simulate_ideal(7, N)
    assert len(out) == N
    # volume-weighted zone temperature: 0.75*living + 0.25*attic
    expected_t0 = 0.75 * 20.0 + 0.25 * 30.0
    assert abs(out["indoor_dry_bulb_temperature"].iloc[0] - expected_t0) < 1e-9
    # ideal loads come from the IdealLoads variables in kW
    assert abs(out["cooling_demand"].iloc[0] - 1.0) < 1e-9
    assert abs(out["heating_demand"].iloc[1] - 0.5) < 1e-9
    # DHW / non-shiftable sums in kW
    assert abs(out["dhw_demand"].iloc[0] - 0.2) < 1e-9
    assert abs(out["non_shiftable_load"].iloc[0] - 0.4) < 1e-9
    assert out["occupant_count"].iloc[0] == 2.0


def test_partial_idf_injection(simulator):
    simulator.simulate_ideal(7, N)      # provides zone weights
    cooling = np.linspace(0, 2, N)
    heating = np.zeros(N)
    out = simulator.simulate_partial(7, cooling, heating)
    assert len(out) == N
    idf = simulator._captured["7_partial"]
    # ideal-loads system stripped (simulate.py:104)
    assert "IdealLoadsAirSystem" not in idf
    # one Schedule:File + OtherEquipment per (zone, load) with the
    # reference's exact column/rows-to-skip layout (simulate.py:130-146)
    assert idf.count("OtherEquipment,") == 4          # 2 zones x 2 loads
    assert idf.count("Schedule:File,") == 4
    assert f"{1 + 0 * N},           !- Rows to Skip at Top" in idf
    assert f"{1 + 1 * N},           !- Rows to Skip at Top" in idf
    # the loads CSV stacks zones with cooling written negative
    csv_path = os.path.join(simulator.output_directory, "7_partial",
                            "partial_load.csv")
    loads = pd.read_csv(csv_path)
    assert list(loads.columns) == ["cooling_load", "heating_load"]
    assert len(loads) == 2 * N
    assert (loads["cooling_load"] <= 0).all()
    # partial extraction returns the OtherEquipment-driven loads split by sign
    assert out["cooling_demand"].iloc[0] > 0
    assert out["heating_demand"].iloc[1] > 0


def test_multipliers_match_reference_semantics():
    """get_multipliers (reference simulate.py:168-173): seeded uniform in
    [min, max] with probability p, 1.0 otherwise."""
    m = ep.get_multipliers(10000, random_seed=3, minimum=0.3, maximum=1.7,
                           probability=0.6)
    ref = np.random.RandomState(3)
    data = ref.uniform(0.3, 1.7, 10000)
    data[ref.random(10000) > 0.6] = 1.0
    np.testing.assert_array_equal(m, data)


def test_pv_autosize_uses_pysam_when_available(monkeypatch, tmp_path):
    """autosize_pv must dispatch to PySAM's Pvwattsv8 'PVWattsNone' model
    with the reference's exact system-design fields
    (energy_model.py:538-566) whenever the package imports."""
    calls = {}

    class _Design:
        pass

    class _Solar:
        pass

    class _Outputs:
        ac = list(np.full(8760, 150.0))

    class _Model:
        SystemDesign = _Design()
        SolarResource = _Solar()
        Outputs = _Outputs()

        def execute(self):
            calls["executed"] = True
            calls["capacity"] = self.SystemDesign.system_capacity
            calls["dc_ac"] = self.SystemDesign.dc_ac_ratio
            calls["tilt"] = self.SystemDesign.tilt
            calls["azimuth"] = self.SystemDesign.azimuth
            calls["bifaciality"] = self.SystemDesign.bifaciality
            calls["epw"] = self.SolarResource.solar_resource_file

    fake_mod = types.ModuleType("PySAM.Pvwattsv8")
    fake_mod.default = lambda name: (_Model(), calls.update(model=name))[0]
    fake_pkg = types.ModuleType("PySAM")
    fake_pkg.Pvwattsv8 = fake_mod
    monkeypatch.setitem(sys.modules, "PySAM", fake_pkg)
    monkeypatch.setitem(sys.modules, "PySAM.Pvwattsv8", fake_mod)

    from citylearn_tpu.compiler.pv_autosize import (
        _synthetic_sizing_table,
        autosize_pv,
    )

    sizing = _synthetic_sizing_table(seed=0)
    nominal, ac_per_kw = autosize_pv(
        demand_kwh=10000.0, epw_filepath="weather.epw", random_seed=5,
        sizing_data=sizing)
    assert calls["model"] == "PVWattsNone"
    assert calls["executed"]
    cfg = sizing.sample(1, random_state=5).iloc[0]
    assert calls["capacity"] == cfg["nameplate_capacity_module_1"] / 1000.0
    assert calls["dc_ac"] == cfg["inverter_loading_ratio"]
    assert calls["tilt"] == cfg["tilt_1"]
    assert calls["azimuth"] == cfg["azimuth_1"]
    assert calls["bifaciality"] == cfg["bifacial_module_1"] * 0.65
    assert calls["epw"] == "weather.epw"
    assert nominal > 0 and len(ac_per_kw) == 8760
    np.testing.assert_allclose(
        ac_per_kw, 150.0 / (cfg["nameplate_capacity_module_1"] / 1000.0))
