"""Battery physics unit tests (mirrors reference tests/unit/test_battery.py:
charge clamps, DoD floor, degradation, efficiency curves — without an env)."""

import numpy as np
import jax.numpy as jnp
import pytest

from citylearn_tpu.core.battery import battery_charge
from citylearn_tpu.core.types import BatteryParams
from citylearn_tpu.compiler.seeding import pad_curve


def make_battery(capacity=10.0, nominal_power=5.0, efficiency=0.9,
                 loss_coefficient=0.0, initial_soc=0.0, dod=1.0, clc=0.0,
                 pec=None, cpc=None):
    pec = pec or [[0, 0.9], [0.3, 0.9], [0.7, 0.9], [0.8, 0.9], [1, 0.9]]
    cpc = cpc or [[0.0, 1.0], [0.8, 1.0], [1.0, 1.0]]
    px, py = pad_curve(pec, 12)
    cx, cy = pad_curve(cpc, 12)
    f = lambda v: jnp.asarray([v], jnp.float32)
    return BatteryParams(
        capacity=f(capacity), nominal_power=f(nominal_power),
        efficiency=f(efficiency), loss_coefficient=f(loss_coefficient),
        initial_soc=f(initial_soc), depth_of_discharge=f(dod),
        capacity_loss_coefficient=f(clc),
        power_efficiency_curve_x=jnp.asarray(px)[None], power_efficiency_curve_y=jnp.asarray(py)[None],
        capacity_power_curve_x=jnp.asarray(cx)[None], capacity_power_curve_y=jnp.asarray(cy)[None])


def charge(bp, soc, energy, eff_prev=None, degraded=None):
    eff_prev = bp.efficiency if eff_prev is None else jnp.asarray([eff_prev])
    degraded = bp.capacity if degraded is None else jnp.asarray([degraded])
    return battery_charge(bp, jnp.asarray([soc], jnp.float32), eff_prev,
                          degraded, jnp.asarray([energy], jnp.float32), 1.0)


def test_charge_respects_capacity():
    bp = make_battery(capacity=10.0, nominal_power=100.0)
    r = charge(bp, 0.9, 50.0)
    # charge is clamped by remaining (degraded) headroom *before* the
    # round-trip split (energy_model.py:1040-1042): e = 10 - 9 = 1 kWh
    assert float(r.soc[0]) == pytest.approx((9.0 + 1.0 * np.sqrt(0.9)) / 10.0,
                                            rel=1e-5)


def test_charge_respects_nominal_power():
    bp = make_battery(capacity=100.0, nominal_power=5.0)
    r = charge(bp, 0.0, 50.0)
    # charged energy limited to nominal power * sqrt(eff)
    assert float(r.soc[0] * 100.0) == pytest.approx(5.0 * np.sqrt(0.9), rel=1e-5)


def test_discharge_respects_dod():
    bp = make_battery(capacity=10.0, nominal_power=100.0, dod=0.6)
    r = charge(bp, 0.5, -100.0)
    # cannot go below 1 - dod = 0.4
    assert float(r.soc[0]) == pytest.approx(0.4, abs=1e-5)


def test_round_trip_efficiency_split():
    bp = make_battery(capacity=100.0, nominal_power=100.0)
    r1 = charge(bp, 0.0, 10.0)
    stored = float(r1.soc[0]) * 100.0
    assert stored == pytest.approx(10.0 * np.sqrt(0.9), rel=1e-5)
    r2 = charge(bp, float(r1.soc[0]), -stored)
    # discharging divides by sqrt(eff): balance = -stored * sqrt(eff)
    assert float(r2.energy_balance[0]) == pytest.approx(-stored * np.sqrt(0.9), rel=1e-4)


def test_degradation_reduces_capacity():
    bp = make_battery(capacity=10.0, nominal_power=10.0, clc=1e-3)
    r = charge(bp, 0.0, 5.0)
    expected = 1e-3 * 10.0 * float(r.energy_balance[0]) / (2 * 10.0)
    assert float(bp.capacity[0] - r.degraded_capacity[0]) == pytest.approx(
        expected, abs=1e-5)


def test_capacity_power_curve_limits_power():
    cpc = [[0.0, 1.0], [0.8, 1.0], [1.0, 0.2]]
    bp = make_battery(capacity=10.0, nominal_power=10.0, cpc=cpc)
    # at soc 0.9, max power interpolates to 1.0 + (0.9-0.8)*(0.2-1.0)/0.2 = 0.6
    r = charge(bp, 0.9, 100.0)
    charged = float(r.soc[0]) * 10.0 - 9.0
    assert charged == pytest.approx(min(10 * 0.6, 10.0 - 9.0) * np.sqrt(0.9), rel=1e-4) \
        or charged == pytest.approx(1.0, rel=1e-4)  # capacity clamp binds first


def test_standby_loss():
    bp = make_battery(capacity=10.0, nominal_power=10.0, loss_coefficient=0.01)
    r = charge(bp, 0.5, 0.0)
    assert float(r.soc[0]) == pytest.approx(0.5 * 0.99, rel=1e-5)
