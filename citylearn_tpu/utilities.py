"""IO + noise utilities (reference ``citylearn/utilities.py``)."""

from __future__ import annotations

import json
import pickle
from typing import Any, Iterable, Union

import numpy as np


class FileHandler:
    @staticmethod
    def read_json(filepath: str) -> dict:
        with open(filepath) as f:
            return json.load(f)

    @staticmethod
    def write_json(filepath: str, data: dict, **kwargs):
        kwargs.setdefault("indent", 2)
        with open(filepath, "w") as f:
            json.dump(data, f, default=str, **kwargs)

    @staticmethod
    def read_yaml(filepath: str) -> dict:
        import yaml

        with open(filepath) as f:
            return yaml.safe_load(f)

    @staticmethod
    def write_yaml(filepath: str, data: dict, **kwargs):
        import yaml

        with open(filepath, "w") as f:
            yaml.safe_dump(data, f, **kwargs)

    @staticmethod
    def read_pickle(filepath: str) -> Any:
        with open(filepath, "rb") as f:
            return pickle.load(f)

    @staticmethod
    def write_pickle(filepath: str, data: Any, **kwargs):
        with open(filepath, "wb") as f:
            pickle.dump(data, f, **kwargs)


class NoiseUtils:
    """Gaussian observation noise (reference ``utilities.py:148-174``).

    The reference draws from the unseeded global RNG; we accept an optional
    seeded generator for reproducible noisy datasets."""

    @staticmethod
    def generate_gaussian_noise(input_data: Union[np.ndarray, Iterable[float]],
                                noise_std: float,
                                rng: np.random.RandomState = None) -> np.ndarray:
        arr = np.asarray(input_data)
        if noise_std <= 0:
            return np.zeros(arr.shape)
        rng = np.random if rng is None else rng
        return rng.normal(loc=0, scale=noise_std, size=arr.shape)

    @staticmethod
    def generate_scaled_noise(input_data, noise_std: float, scale: float = 1.0,
                              rng: np.random.RandomState = None) -> np.ndarray:
        return NoiseUtils.generate_gaussian_noise(input_data, noise_std, rng) * scale

    @staticmethod
    def make_noise_fn(noise_std: float, rng: np.random.RandomState = None):
        """``noise(n) -> (n,) float64`` drawing from ``rng`` when
        ``noise_std > 0``, zeros (and no stream consumption) otherwise —
        the reference's ``generate_gaussian_noise`` gating
        (``utilities.py:166-170``)."""
        def noise(n: int) -> np.ndarray:
            return NoiseUtils.generate_gaussian_noise(np.empty(n), noise_std, rng)
        return noise


class Profiler:
    """jax.profiler integration (SURVEY.md §5.1): wrap a hot region to dump
    a TensorBoard-compatible device trace.

    ::

        with Profiler("/tmp/trace"):
            episode_fn(params, states)

    ``bench.py`` activates this via ``BENCH_PROFILE=<dir>``.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False
