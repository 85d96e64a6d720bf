from sjot_spark.spec.spec import CheckSpec

__all__ = ["CheckSpec"]
