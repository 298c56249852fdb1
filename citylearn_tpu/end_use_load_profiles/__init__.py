from citylearn_tpu.end_use_load_profiles.neighborhood import Neighborhood  # noqa: F401
