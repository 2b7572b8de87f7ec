from geomesa_ray.functions.registry import FUNCTIONS, register, transform_batch

__all__ = ["FUNCTIONS", "register", "transform_batch"]
