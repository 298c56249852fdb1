"""CSV render/export channel (reference ``citylearn.py:1477-1652``).

Streams per-entity CSVs (community, building, battery, charger, pricing,
EV) with ISO timestamps derived from ``start_date``, in ``'during'``
(per-step append) or ``'end'`` (buffered flush) modes, plus the final KPI
pivot CSV. Formats keep the reference's filenames and column names so the
CityLearn UI can consume them.
"""

from __future__ import annotations

import csv
import os
from collections import defaultdict
from datetime import datetime, timedelta
from typing import Mapping, Optional


class CSVRenderer:
    def __init__(self, env, directory: str = "render_exports",
                 session_name: Optional[str] = None, mode: str = "during",
                 start_date: Optional[str] = None):
        assert mode in ("during", "end")
        self.env = env
        self.mode = mode
        self.start_date = datetime.fromisoformat(start_date) if start_date \
            else datetime(2017, 1, 1)
        session = session_name or datetime.now().strftime("session_%Y%m%d_%H%M%S")
        self.directory = os.path.join(directory, session)
        self._buffer = defaultdict(list)
        self._headers = {}

    def _timestamp(self) -> str:
        seconds = self.env.time_step * self.env.spec.seconds_per_time_step
        return (self.start_date + timedelta(seconds=seconds)).isoformat()

    # ------------------------------------------------------------------
    def render(self):
        env = self.env
        t = min(env.time_step, env.time_steps - 1)
        ep = env.episode_tracker.episode
        ts = self._timestamp()
        h = env._history

        solar = float(-h["solar"][t].sum())
        net = float(h["net"][t].sum())
        gross = net + solar
        self._emit(f"exported_data_community_ep{ep}.csv", {
            "timestamp": ts,
            "Net Electricity Consumption-kWh": net,
            "Self Consumption-kWh": max(0.0, min(solar, gross)),
            "Stored energy by community- kWh":
                float(h["battery_cons"][t].clip(min=0).sum()),
            "Total Solar Generation-kWh": solar,
            "CO2-kg_co2": float(h["emission"][t].sum()),
            "Price-$": float(h["cost"][t].sum()),
        })

        for bi, b in enumerate(env.spec.buildings):
            idx = env.episode_tracker.episode_start_time_step + t
            self._emit(f"exported_data_{b.name.lower()}_ep{ep}.csv", {
                "timestamp": ts,
                "Net Electricity Consumption-kWh": float(h["net"][t, bi]),
                "Non-shiftable Load-kWh": float(b.series["non_shiftable_load"][idx]),
                "Non-shiftable Load Electricity Consumption-kWh":
                    float(h["non_shiftable_load_met"][t, bi]),
                "Energy Production from PV-kWh": float(h["solar"][t, bi]),
            })
            self._emit(f"exported_data_{b.name.lower()}_battery_ep{ep}.csv", {
                "timestamp": ts,
                "Battery Soc-%": float(h["battery_soc"][t, bi]),
                "Battery (Dis)Charge-kWh": float(h["battery_cons"][t, bi]),
            })
            for ch in b.chargers:
                cons = float(h["chargers_cons"][t, bi])
                self._emit(
                    f"exported_data_{b.name.lower()}_{ch.charger_id}_ep{ep}.csv",
                    {"timestamp": ts,
                     "Charger Consumption-kWh": cons if cons > 0 else -1.0,
                     "Charger Production-kWh": abs(cons) if cons <= 0 else -1.0})

        b0 = env.spec.buildings[0]
        idx = env.episode_tracker.episode_start_time_step + t
        self._emit(f"exported_data_pricing_ep{ep}.csv", {
            "timestamp": ts,
            "electricity_pricing-$/kWh": float(b0.series["electricity_pricing"][idx]),
            "electricity_pricing_predicted_1-$/kWh":
                float(b0.series["electricity_pricing_predicted_1"][idx]),
            "electricity_pricing_predicted_2-$/kWh":
                float(b0.series["electricity_pricing_predicted_2"][idx]),
            "electricity_pricing_predicted_3-$/kWh":
                float(b0.series["electricity_pricing_predicted_3"][idx]),
        })
        if env.cfg.has_evs and env._state is not None:
            import numpy as np
            socs = np.asarray(env._state.ev_soc)
            for v, ev in enumerate(env.spec.electric_vehicles):
                self._emit(f"exported_data_{ev.name.lower()}_ep{ep}.csv", {
                    "timestamp": ts, "EV Soc-%": float(socs[v])})

    def _emit(self, filename: str, row: Mapping):
        if self.mode == "end":
            self._buffer[filename].append(dict(row))
        else:
            self._write(filename, [row])

    def _write(self, filename, rows):
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, filename)
        exists = os.path.exists(path)
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            if not exists:
                w.writeheader()
            w.writerows(rows)

    def flush(self):
        for filename, rows in self._buffer.items():
            if rows:
                self._write(filename, rows)
        self._buffer.clear()

    def export_final_kpis(self, filepath: str = "exported_kpis.csv"):
        """KPI pivot CSV (reference ``citylearn.py:1477-1500``)."""
        kpis = self.env.evaluate()
        pivot = kpis.pivot(index="cost_function", columns="name", values="value")
        pivot = pivot.round(3).dropna(how="all").fillna("").reset_index()
        pivot = pivot.rename(columns={"cost_function": "KPI"})
        os.makedirs(self.directory, exist_ok=True)
        pivot.to_csv(os.path.join(self.directory, filepath), index=False,
                     encoding="utf-8")
