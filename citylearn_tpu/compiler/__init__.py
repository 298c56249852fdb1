from citylearn_tpu.compiler.schema import compile_schema  # noqa: F401
from citylearn_tpu.compiler.spec import BuildingSpec, DistrictSpec  # noqa: F401
