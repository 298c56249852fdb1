"""Pytree types for the TPU-native district engine.

State is struct-of-arrays with a leading building axis ``B``; the batched
API adds a district axis ``D`` in front via ``vmap``. Driver data has the
time axis first — ``(T, B)`` — so one ``lax.dynamic_index_in_dim`` per
step fetches a contiguous ``(B,)`` slab.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct


class BatteryParams(struct.PyTreeNode):
    """Per-building battery parameters, each ``(B,)`` float32 (curves ``(B, P)``).

    Mirrors resolved ``citylearn.energy_model.Battery`` construction
    (reference ``energy_model.py:872-1016``).
    """
    capacity: jnp.ndarray
    nominal_power: jnp.ndarray
    efficiency: jnp.ndarray              # base technical efficiency
    loss_coefficient: jnp.ndarray        # standby loss (already includes ratio)
    initial_soc: jnp.ndarray
    depth_of_discharge: jnp.ndarray
    capacity_loss_coefficient: jnp.ndarray
    power_efficiency_curve_x: jnp.ndarray  # (B, P)
    power_efficiency_curve_y: jnp.ndarray
    capacity_power_curve_x: jnp.ndarray
    capacity_power_curve_y: jnp.ndarray
    # parity-mode NumPy-2 scalar provenance (bool (B,)): True when the
    # reference holds the parameter as a weak Python float, making
    # ``np.float32(soc) * capacity`` round to float32 (see core/battery.py)
    capacity_weak: jnp.ndarray = None
    dod_weak: jnp.ndarray = None


class HVACParams(struct.PyTreeNode):
    """Heat pump / electric heater per building, ``(B,)`` each.

    ``is_heat_pump`` selects between Carnot-COP heat-pump math and
    constant-efficiency heater math (reference ``energy_model.py:157-451``).
    """
    is_heat_pump: jnp.ndarray            # bool (B,)
    nominal_power: jnp.ndarray
    efficiency: jnp.ndarray
    target_cooling_temperature: jnp.ndarray
    target_heating_temperature: jnp.ndarray


class StorageTankParams(struct.PyTreeNode):
    """Thermal storage tank per building (reference ``energy_model.py:603-871``)."""
    capacity: jnp.ndarray
    efficiency: jnp.ndarray
    loss_coefficient: jnp.ndarray
    initial_soc: jnp.ndarray
    max_input_power: jnp.ndarray         # +inf when unconstrained
    max_output_power: jnp.ndarray
    capacity_weak: jnp.ndarray = None    # parity-mode provenance (B,) bool
    capacity_npf32: jnp.ndarray = None   # capacity itself np.float32 (B,) bool


class SeriesData(struct.PyTreeNode):
    """Driver time series, each ``(T, B)`` float32 over the simulation range.

    ``solar_generation`` is pre-scaled PV output (``pv_nominal * W_per_kW/1000``,
    positive kWh; reference ``energy_model.py:488``)."""
    non_shiftable_load: jnp.ndarray
    cooling_demand: jnp.ndarray
    heating_demand: jnp.ndarray
    dhw_demand: jnp.ndarray
    solar_generation: jnp.ndarray
    outdoor_dry_bulb_temperature: jnp.ndarray
    electricity_pricing: jnp.ndarray
    carbon_intensity: jnp.ndarray
    power_outage: jnp.ndarray
    hvac_mode: jnp.ndarray               # int32 (T, B)
    hour: jnp.ndarray                    # int32 (T, B), 1-24 (drives RBC policies)
    indoor_dry_bulb_temperature: jnp.ndarray          # ideal (without-control) temp
    indoor_dry_bulb_temperature_cooling_set_point: jnp.ndarray
    indoor_dry_bulb_temperature_heating_set_point: jnp.ndarray
    comfort_band: jnp.ndarray
    occupant_count: jnp.ndarray


class DynamicsParams(struct.PyTreeNode):
    """Stacked LSTM temperature-dynamics weights for one *group* of
    buildings sharing identical shapes/channels (reference
    ``citylearn/dynamics.py:15-127``; weights loaded offline from the
    dataset ``.pth`` files). Districts with heterogeneous models carry a
    tuple of groups; ``member_indices`` maps group rows to building rows.
    Layer axes: ``(Bg, 4H, F_in)``, torch gate order i,f,g,o."""
    member_indices: jnp.ndarray          # (Bg,) int32 building indices
    w_ih: tuple                          # per layer: (Bg, 4H, F or H)
    w_hh: tuple                          # per layer: (Bg, 4H, H)
    bias: tuple                          # per layer: (Bg, 4H) = b_ih + b_hh
    lin_w: jnp.ndarray                   # (Bg, H)
    lin_b: jnp.ndarray                   # (Bg,)
    norm_min: jnp.ndarray                # (Bg, F)
    norm_max: jnp.ndarray                # (Bg, F)
    # Pre-normalized data-driven channel values, (T, B, F); dynamic channels
    # (cooling/heating demand, indoor temperature) are zero and overwritten
    # in-graph each step.
    static_channels: jnp.ndarray
    # per-building action-availability masks for partial-load control
    cooling_device_active: jnp.ndarray   # (B,) bool
    heating_device_active: jnp.ndarray
    cooling_or_heating_active: jnp.ndarray


class OccupantParams(struct.PyTreeNode):
    """Stochastic occupant thermostat interaction, stacked over buildings
    (reference ``occupant.py:18-99``, ``building.py:3160-3353``)."""
    a_increase: jnp.ndarray              # (T, B)
    b_increase: jnp.ndarray
    a_decrease: jnp.ndarray
    b_decrease: jnp.ndarray
    random_probability: jnp.ndarray      # (T,) seeded uniform draws
    tree_children_left: jnp.ndarray      # (B, 2, N) int32
    tree_children_right: jnp.ndarray
    tree_feature: jnp.ndarray
    tree_threshold: jnp.ndarray          # (B, 2, N)
    tree_delta: jnp.ndarray
    hold_time_steps: jnp.ndarray         # (B,) int32
    lookback: jnp.ndarray                # (B,) int32 dynamics warm-up gate


class ChargerParams(struct.PyTreeNode):
    """EV chargers stacked over a district-wide charger axis ``C``
    (reference ``electric_vehicle_charger.py``); schedule tensors are
    episode-relative ``(T, C)`` like the reference's un-windowed charger
    data."""
    efficiency: jnp.ndarray              # (C,)
    charge_eff_x: jnp.ndarray            # (C, K) interp knots at |action|
    charge_eff_y: jnp.ndarray            # (C, K)
    discharge_eff_x: jnp.ndarray         # (C, K)
    discharge_eff_y: jnp.ndarray         # (C, K)
    max_charging_power: jnp.ndarray
    min_charging_power: jnp.ndarray
    max_discharging_power: jnp.ndarray
    min_discharging_power: jnp.ndarray
    building_index: jnp.ndarray          # (C,) int32
    connected_ev: jnp.ndarray            # (T, C) int32, -1 when none
    departure_time: jnp.ndarray          # (T, C) float
    required_soc: jnp.ndarray            # (T, C)
    capacity_kwh: jnp.ndarray            # (T, C)
    # charging constraints (reference building.py:764-994); +inf = no limit
    cc_phase_index: jnp.ndarray = None   # (C,) int32 district phase id, -1 none
    cc_building_limit: jnp.ndarray = None  # (B,) float
    cc_phase_limit: jnp.ndarray = None     # (P,) float
    cc_phase_building: jnp.ndarray = None  # (P,) int32


class EVParams(struct.PyTreeNode):
    """Electric vehicles stacked over ``V`` (reference
    ``electric_vehicle.py``), plus the precompiled SOC event tensors
    (see ``compiler/events.py``)."""
    battery: "BatteryParams"             # (V,) leaves
    force_soc: jnp.ndarray               # (T, V) float, NaN = no event
    drift_mult: jnp.ndarray              # (T, V) float, NaN = no drift


class WashingMachineParams(struct.PyTreeNode):
    """Washing machines stacked over ``W`` (reference
    ``energy_model.py:1244-1398``). ``triggered_load[t]`` is the full
    truncated load-profile sum applied at the trigger step — the
    reference's scatter loop adds every profile entry to the *current*
    step (``energy_model.py:1327-1330``, the ``step`` variable is only
    bounds-checked), a shipped quirk that collapses the cycle onto the
    trigger step."""
    building_index: jnp.ndarray          # (W,) int32
    wm_start: jnp.ndarray                # (T, W) int32
    wm_end: jnp.ndarray
    triggered_load: jnp.ndarray          # (T, W) float


class DistrictParams(struct.PyTreeNode):
    """Everything the jitted step consumes (HBM-resident)."""
    series: SeriesData
    battery: BatteryParams
    cooling_device: HVACParams
    heating_device: HVACParams
    dhw_device: HVACParams
    cooling_storage: StorageTankParams
    heating_storage: StorageTankParams
    dhw_storage: StorageTankParams
    # Data-driven observation matrix (T, B, K): every active observation's
    # value when it is purely a function of the dataset; state-derived
    # columns are zero (which matches the reference's returned-observation
    # semantics at t >= 1; see envs/environment.py).
    obs_static: jnp.ndarray
    dynamics: Tuple["DynamicsParams", ...] = ()
    occupant: Optional["OccupantParams"] = None
    chargers: Optional[ChargerParams] = None
    evs: Optional[EVParams] = None
    washing_machines: Optional[WashingMachineParams] = None


@dataclasses.dataclass(frozen=True)
class StaticConfig:
    """Hashable static configuration closed over by the jitted step."""
    n_buildings: int
    time_steps: int                      # episode length T (steps = T - 1)
    central_agent: bool
    seconds_per_time_step: float
    time_step_ratio: float
    simulate_power_outage: Tuple[bool, ...]   # per building
    # Any building uses a stochastic outage model. The signal is baked at
    # compile time for the DEFAULT episode window only (rows
    # [0, episode_steps) of the sim range; core/params.py); batched paths
    # therefore require data_offset == 0 — the Gym adapter re-bakes per
    # window at reset instead (envs/environment._refresh_outage_signals).
    has_stochastic_outage: bool = False
    # Bit-exact parity mode: compute each step in float64 (like the
    # reference's Python-float arithmetic) but round to float32 exactly
    # where the reference stores into its float32 arrays (SOC,
    # energy_balance, per-device electricity_consumption, net/cost/
    # emission, demand/temperature series writes). Requires x64 enabled
    # at trace time; see envs/environment.py.
    parity_f64: bool = False
    reward_exponent: float = 1.0
    reward_type: str = "RewardFunction"
    # ComfortReward parameters (reference reward_function.py:216-340)
    reward_band: Optional[float] = None
    reward_lower_exponent: float = 2.0
    reward_higher_exponent: float = 2.0
    reward_coefficients: Tuple[float, ...] = (1.0, 1.0)  # SolarPenaltyAndComfortReward weights
    # MultiBuildingRewardFunction (reference citylearn.py:2108-2141,
    # reward_function.py:90-118): per-building (type, exponent, band,
    # lower_exponent, higher_exponent, coefficients); None = single reward
    reward_per_building: Optional[Tuple[Tuple, ...]] = None
    # LSTM dynamics groups: per group static meta
    # (lookback, num_layers, hidden, n_channels, temp_ch, cool_ch, heat_ch)
    dyn_groups: Tuple[Tuple[int, int, int, int, int, int, int], ...] = ()
    has_dynamics: bool = False
    max_lookback: int = 0
    has_occupant: bool = False
    occupant_tree_depth: int = 0
    has_charging_constraints: bool = False
    n_charging_phases: int = 0
    charging_penalty_coefficient: float = 1.0
    # static activity flags let jit prune inert subsystem blocks entirely
    any_cooling: bool = True             # any cooling demand or storage
    any_heating: bool = True
    any_dhw: bool = True
    has_evs: bool = False
    has_washing_machines: bool = False
    n_chargers: int = 0
    n_evs: int = 0
    n_washing_machines: int = 0
    # Electric_Vehicles_Reward_Function weights (reward_function.py:396-407)
    ev_reward_weights: Tuple[float, ...] = (-5.0, -2.0, -10.0, -5.0, 10.0, 5.0, 5.0)

    @property
    def any_outage(self) -> bool:
        return any(self.simulate_power_outage)


class EnvState(struct.PyTreeNode):
    """Carried episode state, leading axis ``B`` on array fields."""
    t: jnp.ndarray                       # scalar int32, episode-local step index
    data_offset: jnp.ndarray             # scalar int32, episode window start in the sim range
    battery_soc: jnp.ndarray             # (B,) fraction, soc[t-1] (raw, pre standby loss)
    battery_efficiency: jnp.ndarray      # (B,) last applied efficiency (history[-1])
    battery_degraded_capacity: jnp.ndarray
    cooling_storage_soc: jnp.ndarray
    heating_storage_soc: jnp.ndarray
    dhw_storage_soc: jnp.ndarray
    # LSTM dynamics carry per group: hidden/cell (L, Bg, H) and the
    # normalized input ring buffer (Bg, F, lookback + 1)
    lstm_h: tuple = ()
    lstm_c: tuple = ()
    dyn_input: tuple = ()
    # EV + washing machine carry ((V,) / (V,) / (V,) / (W,)); zero-sized
    # when the district has none
    ev_soc: jnp.ndarray = None           # soc[t-1] entering the step
    ev_efficiency: jnp.ndarray = None
    ev_degraded_capacity: jnp.ndarray = None
    wm_initiated: jnp.ndarray = None     # bool
    # occupant interaction carry ((B,) each; zero-sized when disabled):
    # NaN-coded setpoint overrides, -1-coded hold counter, previous-step
    # predicted temperature and effective setpoints (for the decision-tree
    # features, building.py:3280-3284)
    occ_csp_override: jnp.ndarray = None
    occ_hsp_override: jnp.ndarray = None
    occ_hold_counter: jnp.ndarray = None
    occ_prev_temp: jnp.ndarray = None
    occ_prev_csp: jnp.ndarray = None
    occ_prev_hsp: jnp.ndarray = None


class StepOutput(struct.PyTreeNode):
    """Per-step results (leading axis ``B``) used for rewards, KPI series
    and the Gym adapter's bookkeeping."""
    net_electricity_consumption: jnp.ndarray
    net_electricity_consumption_cost: jnp.ndarray
    net_electricity_consumption_emission: jnp.ndarray
    reward: jnp.ndarray                  # (B,) decentralized or (1,) central
    # storage/device detail needed for counterfactual KPI baselines
    cooling_consumption: jnp.ndarray
    heating_consumption: jnp.ndarray
    dhw_consumption: jnp.ndarray
    non_shiftable_consumption: jnp.ndarray
    battery_consumption: jnp.ndarray
    cooling_storage_consumption: jnp.ndarray   # device input power of tank balance
    heating_storage_consumption: jnp.ndarray
    dhw_storage_consumption: jnp.ndarray
    solar_generation: jnp.ndarray              # negative kWh
    battery_soc: jnp.ndarray
    cooling_storage_soc: jnp.ndarray
    heating_storage_soc: jnp.ndarray
    dhw_storage_soc: jnp.ndarray
    cooling_demand_met: jnp.ndarray            # energy_from_cooling_device
    heating_demand_met: jnp.ndarray
    dhw_demand_met: jnp.ndarray
    non_shiftable_load_met: jnp.ndarray
    cooling_storage_balance: jnp.ndarray
    heating_storage_balance: jnp.ndarray
    dhw_storage_balance: jnp.ndarray
    battery_balance: jnp.ndarray
    # controlled demand series (equals the data series for plain buildings,
    # partial-load demand for LSTM dynamics buildings)
    cooling_demand_actual: jnp.ndarray
    heating_demand_actual: jnp.ndarray
    indoor_temperature: jnp.ndarray      # predicted for dynamics buildings
    chargers_consumption: jnp.ndarray    # (B,)
    washing_machines_consumption: jnp.ndarray  # (B,)
    ev_soc: jnp.ndarray                  # (V,) soc at t after events + charges
    cooling_set_point: jnp.ndarray       # (B,) effective (occupant-mutated)
    heating_set_point: jnp.ndarray
    charging_violation_kwh: jnp.ndarray = None       # (B,)
    charging_building_headroom: jnp.ndarray = None   # (B,)
    charging_phase_headroom: jnp.ndarray = None      # (P,)
    # per-charger series (reference Charger.electricity_consumption /
    # past_charging_action_values_kwh, electric_vehicle_charger.py:320-328)
    charger_consumption: jnp.ndarray = None          # (C,)
    charger_action_kwh: jnp.ndarray = None           # (C,)
