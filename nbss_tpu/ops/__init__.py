from nbss_tpu.ops.metrics import si_sdr, snr, sa_sdr, sdr
from nbss_tpu.ops.pit import pit, permutate

__all__ = ["si_sdr", "snr", "sa_sdr", "sdr", "pit", "permutate"]
