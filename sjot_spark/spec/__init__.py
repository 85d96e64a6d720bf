from sjot_spark.spec.registry import SpecRegistry
from sjot_spark.spec.spec import CheckSpec

__all__ = ["CheckSpec", "SpecRegistry"]
