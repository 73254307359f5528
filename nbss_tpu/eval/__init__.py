from nbss_tpu.eval.scale import recover_scale
from nbss_tpu.eval.metrics import cal_metrics
from nbss_tpu.eval.stoi import stoi

__all__ = ["recover_scale", "cal_metrics", "stoi"]
