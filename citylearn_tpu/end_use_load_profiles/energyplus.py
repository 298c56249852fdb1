"""EnergyPlus backend for the dataset-generation pipeline.

Implements the :class:`~citylearn_tpu.end_use_load_profiles.build.BuildingSimulator`
protocol against a real EnergyPlus toolchain — the reference's doe_xstock
flow (``/root/reference/citylearn/end_use_load_profiles/simulate.py:9-166``)
re-designed without the eppy/doe_xstock dependencies:

- **ideal run**: the building's IDF is simulated with its
  ``ZoneHVAC:IdealLoadsAirSystem``; loads and zone conditions are
  extracted from the EnergyPlus SQLite output with pandas equivalents of
  the reference's SQL (``misc/queries/select_ideal_loads.sql``,
  ``select_citylearn_energy_simulation.sql``).
- **partial run**: ideal-loads objects are stripped and per-zone
  ``Schedule:File`` + ``OtherEquipment`` objects are appended as IDF text
  (the reference's ``add_other_equipment``, ``simulate.py:106-166``),
  driving the zones with the prescribed (multiplier-perturbed) thermal
  loads; the free-response temperature is extracted back.

Every external seam is injectable so the full code path runs under test
without an EnergyPlus binary:

- ``model_provider(bldg_id) -> {"idf": str, "epw": str}`` supplies the
  building model (the reference gets these from doe_xstock's EULP cache);
- ``run_energyplus(idf_path, epw_path, output_directory) -> sqlite_path``
  executes the simulation (default: the ``energyplus`` CLI).
"""

from __future__ import annotations

import dataclasses
import os
import re
import sqlite3
import subprocess
import tempfile
from typing import Callable, Dict, Optional, Sequence

import numpy as np
import pandas as pd

from citylearn_tpu.end_use_load_profiles.build import get_multipliers  # noqa: F401

J_TO_KWH = 1.0 / 3.6e6

#: variables the reference's queries consume (select_citylearn_energy_simulation.sql)
WEIGHTED_VARIABLES = ("Zone Air Temperature", "Zone Air Relative Humidity")
SETPOINT_VARIABLES = ("Zone Thermostat Cooling Setpoint Temperature",
                      "Zone Thermostat Heating Setpoint Temperature")
OTHER_VARIABLES = ("Water Use Equipment Heating Rate",
                   "Zone Lights Electricity Rate",
                   "Zone Electric Equipment Electricity Rate",
                   "Zone People Occupant Count")
IDEAL_COOLING = "Zone Ideal Loads Zone Sensible Cooling Rate"
IDEAL_HEATING = "Zone Ideal Loads Zone Sensible Heating Rate"


def default_run_energyplus(idf_path: str, epw_path: str,
                           output_directory: str) -> str:
    """Run the ``energyplus`` CLI with SQLite output and return the path
    to ``eplusout.sql``."""
    subprocess.run(["energyplus", "-w", epw_path, "-d", output_directory,
                    "-r", idf_path], check=True, capture_output=True)
    return os.path.join(output_directory, "eplusout.sql")


# ----------------------------------------------------------------------
# SQLite extraction (pandas equivalents of misc/queries/*.sql)
# ----------------------------------------------------------------------

def _report_data(sqlite_path: str) -> pd.DataFrame:
    """ReportData joined to its dictionary: columns TimeIndex, Name,
    KeyValue, Value."""
    with sqlite3.connect(sqlite_path) as con:
        data = pd.read_sql("SELECT * FROM ReportData", con)
        dd = pd.read_sql("SELECT * FROM ReportDataDictionary", con)
    return data.merge(dd[["ReportDataDictionaryIndex", "Name", "KeyValue"]],
                      on="ReportDataDictionaryIndex", how="left")


def _zone_weights(sqlite_path: str) -> pd.DataFrame:
    """Conditioned-zone volume weights (the reference's
    ``create_zone_metadata.sql`` weighting: zone volume x multiplier over
    the conditioned total)."""
    with sqlite3.connect(sqlite_path) as con:
        zones = pd.read_sql("SELECT ZoneName, Volume, Multiplier FROM Zones", con)
    zones["weight"] = zones["Volume"] * zones["Multiplier"]
    zones["weight"] /= zones["weight"].sum()
    return zones


def extract_ideal_loads(sqlite_path: str) -> pd.DataFrame:
    """Per-zone ideal sensible loads (``select_ideal_loads.sql``):
    timestep, zone_name, cooling_load / heating_load in [W]."""
    df = _report_data(sqlite_path)
    out = []
    for name, col in ((IDEAL_COOLING, "cooling_load"),
                      (IDEAL_HEATING, "heating_load")):
        sub = df[df["Name"] == name].copy()
        sub["zone_name"] = sub["KeyValue"].str.replace(
            " IDEAL LOADS AIR SYSTEM", "", regex=False)
        sub = sub.rename(columns={"TimeIndex": "timestep", "Value": col})
        out.append(sub[["timestep", "zone_name", col]])
    merged = out[0].merge(out[1], on=["timestep", "zone_name"], how="outer")
    return merged.fillna(0.0).sort_values(["zone_name", "timestep"])


def extract_energy_simulation(sqlite_path: str) -> pd.DataFrame:
    """CityLearn energy-simulation frame
    (``select_citylearn_energy_simulation.sql`` semantics): volume-weighted
    zone conditions, setpoints, Other-Equipment thermal loads split by
    sign, DHW/lights/equipment/occupancy sums; loads in kWh."""
    df = _report_data(sqlite_path)
    weights = _zone_weights(sqlite_path).set_index("ZoneName")["weight"]

    frames = {}
    for name, col in (("Zone Air Temperature", "indoor_dry_bulb_temperature"),
                      ("Zone Air Relative Humidity", "indoor_relative_humidity")):
        sub = df[df["Name"] == name].copy()
        sub["w"] = sub["KeyValue"].str.upper().map(
            {k.upper(): v for k, v in weights.items()}).fillna(0.0)
        frames[col] = (sub["Value"] * sub["w"]).groupby(sub["TimeIndex"]).sum()

    for name, col in zip(SETPOINT_VARIABLES,
                         ("indoor_dry_bulb_temperature_cooling_set_point",
                          "indoor_dry_bulb_temperature_heating_set_point")):
        sub = df[df["Name"] == name]
        frames[col] = sub.groupby("TimeIndex")["Value"].mean()

    # Other Equipment thermal loads: positive = heating, negative = cooling
    oe = df[(df["Name"] == "Other Equipment Convective Heating Rate")
            & (df["KeyValue"].str.upper().str.contains("LOAD", na=False))]
    heat = oe[oe["Value"] > 0].groupby("TimeIndex")["Value"].sum()
    cool = oe[oe["Value"] <= 0].groupby("TimeIndex")["Value"].sum().abs()
    frames["heating_demand"] = heat * J_TO_KWH * 3600.0 / 1000.0
    frames["cooling_demand"] = cool * J_TO_KWH * 3600.0 / 1000.0

    dhw = df[df["Name"] == "Water Use Equipment Heating Rate"]
    frames["dhw_demand"] = dhw.groupby("TimeIndex")["Value"].sum() / 1000.0
    nsl = df[df["Name"].isin(("Zone Lights Electricity Rate",
                              "Zone Electric Equipment Electricity Rate"))]
    frames["non_shiftable_load"] = nsl.groupby("TimeIndex")["Value"].sum() / 1000.0
    occ = df[df["Name"] == "Zone People Occupant Count"]
    frames["occupant_count"] = occ.groupby("TimeIndex")["Value"].sum()

    out = pd.DataFrame(frames).sort_index().reset_index(drop=True).fillna(0.0)
    n = len(out)
    t = np.arange(n)
    out.insert(0, "month", np.minimum(t // 24 // 30 + 1, 12).astype(np.int32))
    out.insert(1, "hour", (t % 24 + 1).astype(np.int32))
    out.insert(2, "day_type", ((t // 24) % 7 + 1).astype(np.int32))
    return out


# ----------------------------------------------------------------------
# IDF text editing (the reference uses eppy; plain-text emission keeps the
# object payloads identical without the dependency)
# ----------------------------------------------------------------------

def remove_ideal_loads_air_system(idf_text: str) -> str:
    """Strip ``ZoneHVAC:IdealLoadsAirSystem`` objects (reference
    ``simulate.py:104``: the partial run replaces HVAC with prescribed
    OtherEquipment loads)."""
    pattern = re.compile(
        r"ZoneHVAC:IdealLoadsAirSystem\s*,[^;]*;", re.IGNORECASE | re.DOTALL)
    return pattern.sub("", idf_text)


def add_other_equipment(idf_text: str, zone_names: Sequence[str],
                        loads_filepath: str, n_time_steps: int,
                        minutes_per_item: int = 60) -> str:
    """Append the partial-load injection objects (reference
    ``simulate.py:110-166``): one ``Schedule:File`` + ``OtherEquipment``
    per (zone, load) with the reference's exact column/row-skip layout —
    column j+1 of the stacked per-zone loads CSV, skipping
    ``1 + i * n_time_steps`` rows for zone i."""
    blocks = ["""
ScheduleTypeLimits,
    other equipment hvac power,       !- Name
    ,                                 !- Lower Limit Value
    ,                                 !- Upper Limit Value
    Continuous,                       !- Numeric Type
    Dimensionless;                    !- Unit Type
"""]
    loads = ["cooling_load", "heating_load"]
    for i, zone_name in enumerate(zone_names):
        for j, load in enumerate(loads):
            name = f"{zone_name} partial {load}"
            blocks.append(f"""
Schedule:File,
    {name},                           !- Name
    other equipment hvac power,       !- Schedule Type Limits Name
    {loads_filepath},                 !- File Name
    {j + 1},                          !- Column Number
    {1 + i * n_time_steps},           !- Rows to Skip at Top
    8760,                             !- Number of Hours of Data
    Comma,                            !- Column Separator
    No,                               !- Interpolate to Timestep
    {minutes_per_item};               !- Minutes per Item
""")
            blocks.append(f"""
OtherEquipment,
    {name},                           !- Name
    None,                             !- Fuel Type
    {zone_name},                      !- Zone or ZoneList Name
    {name},                           !- Schedule Name
    EquipmentLevel,                   !- Design Level Calculation Method
    1.0,                              !- Design Level {{W}}
    ,                                 !- Power per Zone Floor Area
    ,                                 !- Power per Person
    0.0,                              !- Fraction Latent
    0.0,                              !- Fraction Radiant
    0.0,                              !- Fraction Lost
    ,                                 !- Carbon Dioxide Generation Rate
    partial {load};                   !- End-Use Subcategory
""")
    return idf_text + "".join(blocks)


def write_partial_loads_csv(path: str, cooling_w: np.ndarray,
                            heating_w: np.ndarray,
                            zone_weights: pd.Series) -> Sequence[str]:
    """Distribute the building-level prescribed loads across zones by the
    conditioned-volume weights and write the stacked per-zone CSV the
    Schedule:File objects read (reference ``simulate.py:119-129``:
    cooling written negative)."""
    rows = []
    names = list(zone_weights.index)
    for z in names:
        w = float(zone_weights[z])
        rows.append(pd.DataFrame({
            "cooling_load": -np.asarray(cooling_w, np.float64) * w,
            "heating_load": np.asarray(heating_w, np.float64) * w,
        }))
    pd.concat(rows, ignore_index=True).to_csv(path, index=False)
    return names


@dataclasses.dataclass
class EnergyPlusSimulator:
    """:class:`BuildingSimulator` over EnergyPlus (injectable seams for
    binary-free testing; see module docstring)."""

    model_provider: Callable[[int], Dict[str, str]]
    run_energyplus: Callable[[str, str, str], str] = None
    output_directory: Optional[str] = None
    number_of_time_steps_per_hour: int = 1

    def __post_init__(self):
        if self.run_energyplus is None:
            self.run_energyplus = default_run_energyplus
        if self.output_directory is None:
            self.output_directory = tempfile.mkdtemp(prefix="citylearn_eplus_")

    # -- protocol -------------------------------------------------------
    def weather(self, n_time_steps: int) -> pd.DataFrame:
        from citylearn_tpu.compiler.pv_autosize import read_epw
        epw = read_epw(self.model_provider(0)["epw"])
        n = min(n_time_steps, len(epw["temp_air"]))
        return pd.DataFrame({
            "outdoor_dry_bulb_temperature": epw["temp_air"][:n].astype(np.float32),
            "outdoor_relative_humidity": np.full(n, 50.0, np.float32),
            "diffuse_solar_irradiance": epw["dhi"][:n].astype(np.float32),
            "direct_solar_irradiance": epw["dni"][:n].astype(np.float32),
        })

    def _run(self, bldg_id: int, idf_text: str, tag: str) -> str:
        model = self.model_provider(bldg_id)
        out_dir = os.path.join(self.output_directory, f"{bldg_id}_{tag}")
        os.makedirs(out_dir, exist_ok=True)
        idf_path = os.path.join(out_dir, "model.idf")
        with open(idf_path, "w") as f:
            f.write(idf_text)
        return self.run_energyplus(idf_path, model["epw"], out_dir)

    def simulate_ideal(self, bldg_id: int, n_time_steps: int) -> pd.DataFrame:
        model = self.model_provider(bldg_id)
        sql = self._run(bldg_id, model["idf"], "ideal")
        ideal = extract_ideal_loads(sql)
        sim = extract_energy_simulation(sql)
        # ideal runs report loads through the IdealLoads system, not
        # OtherEquipment — overwrite the demand columns from the loads table
        per_t = ideal.groupby("timestep")[["cooling_load", "heating_load"]].sum()
        n = min(n_time_steps, len(sim))
        sim = sim.iloc[:n].copy()
        sim["cooling_demand"] = per_t["cooling_load"].to_numpy()[:n] / 1000.0
        sim["heating_demand"] = per_t["heating_load"].to_numpy()[:n] / 1000.0
        if "solar_generation" not in sim:
            sim["solar_generation"] = 0.0
        return sim.reset_index(drop=True)

    def simulate_partial(self, bldg_id: int, cooling_kwh: np.ndarray,
                         heating_kwh: np.ndarray) -> pd.DataFrame:
        model = self.model_provider(bldg_id)
        out_dir = os.path.join(self.output_directory, f"{bldg_id}_partial")
        os.makedirs(out_dir, exist_ok=True)
        # zone weights come from the ideal run's sqlite when available,
        # else a single-zone assumption
        ideal_sql = os.path.join(self.output_directory, f"{bldg_id}_ideal",
                                 "eplusout.sql")
        if os.path.exists(ideal_sql):
            weights = _zone_weights(ideal_sql).set_index("ZoneName")["weight"]
        else:
            weights = pd.Series({"ZONE 1": 1.0})
        loads_path = os.path.join(out_dir, "partial_load.csv")
        n = len(cooling_kwh)
        zone_names = write_partial_loads_csv(
            loads_path, np.asarray(cooling_kwh) * 1000.0,
            np.asarray(heating_kwh) * 1000.0, weights)
        idf = remove_ideal_loads_air_system(model["idf"])
        idf = add_other_equipment(
            idf, zone_names, loads_path, n,
            minutes_per_item=60 // self.number_of_time_steps_per_hour)
        sql = self._run(bldg_id, idf, "partial")
        sim = extract_energy_simulation(sql)
        return sim.iloc[:n].reset_index(drop=True)
