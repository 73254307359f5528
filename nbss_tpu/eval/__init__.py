from nbss_tpu.eval.scale import recover_scale

__all__ = ["recover_scale"]
