from citylearn_tpu.envs.environment import CityLearnEnv  # noqa: F401
