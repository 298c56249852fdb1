"""Dataset registry (reference ``citylearn/data.py:31-293`` ``DataSet``).

Named datasets resolve to local directories: ``CITYLEARN_DATA_ROOT`` (env
var), an installed reference CityLearn's ``data/datasets``, or a user
cache. Network download from the CityLearn GitHub contents API is kept as
the reference's fetch path but is optional (zero-egress environments use
local roots)."""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import List, Optional

DEFAULT_ROOTS = [
    os.environ.get("CITYLEARN_DATA_ROOT"),
    "/root/reference/data/datasets",
    os.path.join(str(Path.home()), ".cache", "citylearn_tpu", "datasets"),
]

GITHUB_CONTENTS_URL = ("https://api.github.com/repos/intelligent-environments-lab/"
                       "CityLearn/contents/data/datasets")


MISC_ROOTS = [
    os.environ.get("CITYLEARN_MISC_ROOT"),
    "/root/reference/data/misc",
    os.path.join(str(Path.home()), ".cache", "citylearn_tpu", "misc"),
]


class DataSet:
    # reference citylearn/data.py:42-43
    BATTERY_CHOICES_FILENAME = "battery_choices.yaml"
    PV_CHOICES_FILENAME = "lbl-tracking_the_sun-res-pv.csv"

    def __init__(self, roots: Optional[List[str]] = None):
        self.roots = [r for r in (roots or DEFAULT_ROOTS) if r]

    # -- sizing-data accessors (reference data.py:191-259) ---------------
    def _misc_file(self, filename: str) -> Optional[str]:
        for root in MISC_ROOTS:
            if root and os.path.isfile(os.path.join(root, filename)):
                return os.path.join(root, filename)
        return None

    def get_battery_sizing_data(self):
        """Real-world battery manufacturer models as a DataFrame indexed by
        model (reference ``data.py:224-259``; reads the bundled
        ``battery_choices.yaml``)."""
        import pandas as pd
        import yaml

        path = self._misc_file(self.BATTERY_CHOICES_FILENAME)
        if path is None:
            raise FileNotFoundError(
                f"{self.BATTERY_CHOICES_FILENAME} not found in misc roots "
                f"{[r for r in MISC_ROOTS if r]}")
        with open(path) as f:
            data = yaml.safe_load(f)
        data = pd.DataFrame([{"model": k, **v["attributes"]}
                             for k, v in data.items()])
        return data.set_index("model")

    def get_pv_sizing_data(self):
        """LBNL Tracking-the-Sun residential-PV sample (reference
        ``data.py:191-226``). Reads a locally cached CSV when present;
        otherwise returns the documented deterministic synthetic stand-in
        with the same columns (zero-egress environments cannot download
        the LBNL file)."""
        from citylearn_tpu.compiler.pv_autosize import get_pv_sizing_data
        return get_pv_sizing_data()

    def get_dataset_names(self) -> List[str]:
        names = set()
        for root in self.roots:
            if os.path.isdir(root):
                for d in os.listdir(root):
                    if os.path.isfile(os.path.join(root, d, "schema.json")):
                        names.add(d)
        return sorted(names)

    def get_dataset(self, name: str) -> str:
        """Return the dataset directory, fetching to the cache if needed."""
        for root in self.roots:
            path = os.path.join(root, name)
            if os.path.isfile(os.path.join(path, "schema.json")):
                return path
        return self._download(name)

    def get_schema(self, name: str) -> dict:
        path = self.get_dataset(name)
        with open(os.path.join(path, "schema.json")) as f:
            schema = json.load(f)
        schema["root_directory"] = path
        return schema

    def get_schema_path(self, name: str) -> str:
        return os.path.join(self.get_dataset(name), "schema.json")

    def _download(self, name: str) -> str:  # pragma: no cover - needs egress
        import requests

        cache = self.roots[-1]
        target = os.path.join(cache, name)
        os.makedirs(target, exist_ok=True)
        r = requests.get(f"{GITHUB_CONTENTS_URL}/{name}")
        r.raise_for_status()
        for item in r.json():
            if item["type"] != "file":
                continue
            data = requests.get(item["download_url"])
            data.raise_for_status()
            with open(os.path.join(target, item["name"]), "wb") as f:
                f.write(data.content)
        if not os.path.isfile(os.path.join(target, "schema.json")):
            raise FileNotFoundError(f"dataset {name} not found")
        return target
