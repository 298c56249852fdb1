"""PV autosize: EPW parsing, solar model sanity, reference sizing math.

Mirrors the reference's mock-isolated device-physics test pattern
(``tests/unit/test_pv.py``): sizing math is exercised against an injected
sizing DataFrame, the solar chain against the bundled EPW files.
"""

import json
import math
import os

import numpy as np
import pandas as pd
import pytest

from citylearn_tpu.compiler import pv_autosize as pa

ALAMEDA = "/root/reference/data/datasets/ca_alameda_county_neighborhood"
EPW = os.path.join(ALAMEDA, "weather.epw")


@pytest.fixture(scope="module")
def epw():
    return pa.read_epw(EPW)


def test_read_epw_shape_and_location(epw):
    assert len(epw["ghi"]) == 8760
    assert abs(epw["latitude"] - 37.67) < 1e-6
    assert abs(epw["longitude"] - (-122.12)) < 1e-6
    assert epw["timezone"] == -8.0
    assert epw["ghi"].max() > 800          # clear summer noon exists
    assert (epw["dni"] >= 0).all() and (epw["dhi"] >= 0).all()


def test_solar_position_solstice_noon(epw):
    zen, az = pa.solar_position(epw["latitude"], epw["longitude"],
                                epw["timezone"], epw["day_of_year"],
                                epw["local_hour"])
    jun21 = epw["day_of_year"] == 172
    min_zen = math.degrees(zen[jun21].min())
    # solar-noon zenith on Jun 21 = lat - 23.45 (+/- mid-hour sampling)
    assert abs(min_zen - (37.67 - 23.45)) < 2.0
    # azimuth near 180 deg (south) at minimum zenith
    i = np.flatnonzero(jun21)[np.argmin(zen[jun21])]
    assert 150 < math.degrees(az[i]) < 210


def test_poa_physical_bounds(epw):
    poa = pa.poa_irradiance(epw, 25.0, 180.0)
    night = epw["ghi"] <= 0
    assert np.all(poa[night] == 0.0)
    assert poa.max() < 1400.0              # no transposition blow-ups
    # south-tilted beats horizontal annually at 37.7N
    assert poa.sum() > epw["ghi"].sum()


def test_pvwatts_ac_plausible_yield(epw):
    ac = pa.pvwatts_ac(epw, 1.0, 1.2, 25.0, 180.0)
    assert np.all(ac >= 0)
    assert ac.max() <= 1000.0 / 1.2 + 1e-6      # inverter clipping at pac0
    yield_kwh = ac.sum() / 1000.0
    assert 1400 < yield_kwh < 1900              # SF Bay Area band


def _sizing_row(**over):
    row = {"nameplate_capacity_module_1": 400.0, "inverter_loading_ratio": 1.2,
           "tilt_1": 25.0, "azimuth_1": 180.0, "bifacial_module_1": 0.0,
           "module_area": 2.0, "PV_system_size_DC": 6.5}
    row.update(over)
    return pd.DataFrame([row])


def test_autosize_zne_math():
    sizing = _sizing_row()
    nominal, ac_per_kw = pa.autosize_pv(
        10000.0, EPW, random_seed=7, zero_net_energy_proportion=1.0,
        safety_factor=1.0, sizing_data=sizing)
    module_kw = 0.4
    zne = 10000.0 / float(np.sum(ac_per_kw / 1000.0))
    expected = math.floor(zne / module_kw) * module_kw
    assert nominal == pytest.approx(expected)
    assert nominal >= module_kw
    # ac_per_kw is W per kW of capacity: independent of module size
    assert 1400 < ac_per_kw.sum() / 1000.0 < 1900


def test_autosize_roof_limit():
    sizing = _sizing_row(module_area=2.0)
    nominal, _ = pa.autosize_pv(
        1e9, EPW, random_seed=7, zero_net_energy_proportion=1.0,
        roof_area=10.0, safety_factor=1.0, sizing_data=sizing)
    # floor(10 / 2) * 0.4 kW = 2.0 kW
    assert nominal == pytest.approx(2.0)


def test_autosize_use_sample_target():
    sizing = _sizing_row(PV_system_size_DC=6.5)
    nominal, _ = pa.autosize_pv(
        1.0, EPW, random_seed=7, use_sample_target=True, sizing_data=sizing)
    assert nominal == pytest.approx(6.5)


def test_autosize_min_one_module():
    sizing = _sizing_row()
    nominal, _ = pa.autosize_pv(
        1.0, EPW, random_seed=7, zero_net_energy_proportion=0.7,
        sizing_data=sizing)
    assert nominal == pytest.approx(0.4)     # max(target, module) floor


def test_autosize_deterministic_per_seed():
    a = pa.autosize_pv(8000.0, EPW, random_seed=3)
    b = pa.autosize_pv(8000.0, EPW, random_seed=3)
    c = pa.autosize_pv(8000.0, EPW, random_seed=4)
    assert a[0] == b[0] and np.array_equal(a[1], b[1])
    assert a[0] != c[0] or not np.array_equal(a[1], c[1])


def test_compile_autosized_building():
    """One alameda building compiles with nonzero PV and a generation
    series (reference building.py:2426-2441 sets both)."""
    from citylearn_tpu.compiler.schema import compile_schema

    schema = json.load(open(os.path.join(ALAMEDA, "schema.json")))
    schema["root_directory"] = ALAMEDA
    keep = list(schema["buildings"])[0]
    schema["buildings"] = {keep: schema["buildings"][keep]}
    spec = compile_schema(schema)
    b = spec.buildings[0]
    assert b.pv_nominal_power > 0
    sg = b.series["solar_generation"]
    assert np.nansum(sg) > 0 and len(sg) == 8760
    # daylight only
    assert sg[0] == 0.0
