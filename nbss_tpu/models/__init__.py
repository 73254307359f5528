from nbss_tpu.models.spatialnet import SpatialNet, SpatialNetLayer

__all__ = ["SpatialNet", "SpatialNetLayer"]
