from landscape_spark.sketch.l0 import SketchParams

__all__ = ["SketchParams"]
