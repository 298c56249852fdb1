from citylearn_tpu.core.params import initial_state, pack  # noqa: F401
from citylearn_tpu.core.step import district_step  # noqa: F401
