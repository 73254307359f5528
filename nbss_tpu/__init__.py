"""nbss_tpu — a TPU-native multichannel speech separation / enhancement framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Audio-WestlakeU/NBSS
(narrow-band speech separation: NB-BLSTM, NBC, NBC2, SpatialNet, Online
SpatialNet), designed TPU-first:

- All compute paths are jit-compiled XLA programs with static shapes.
- Activations use the canonical ``[B, F, T, H]`` layout (hidden last = lane dim)
  so matmuls/attention land on the MXU with ``B*F`` (or ``B*T``) batching.
- Streaming paths are ``lax.scan`` state machines, never Python frame loops.
- Multi-chip scaling is `jax.sharding.Mesh` + NamedSharding data parallelism
  (gradients reduced by XLA collectives over ICI), not NCCL/DDP.

Subpackages
-----------
- ``nbss_tpu.io``       STFT/iSTFT, input normalization, cIRM, losses
- ``nbss_tpu.ops``      pure-JAX signal ops & metrics (SI-SDR, uPIT, ...)
- ``nbss_tpu.models``   network architectures (SpatialNet, NBC, NBC2, NB-BLSTM)
- ``nbss_tpu.train``    training module / loops / optimizers / checkpointing
- ``nbss_tpu.parallel`` device mesh + sharding policies
- ``nbss_tpu.data``     deterministic (index, seed) data pipeline
- ``nbss_tpu.eval``     evaluation metrics and host-side metric bridges
"""

__version__ = "0.1.0"


def _host_fingerprint() -> str:
    """Short hash of this host's CPU feature set. XLA:CPU AOT cache entries
    are machine-specific: loading entries compiled on a host with different
    CPU features makes cpu_aot_loader spam machine-feature-mismatch errors
    and can block the process outright (observed with a foreign-host cache:
    2 min CPU over 15 min wall)."""
    import hashlib
    import platform

    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            got = set()
            for line in f:
                # the model name matters independently of the flag set:
                # XLA's LLVM tuning preferences (+prefer-no-scatter/gather)
                # follow the detected CPU MODEL, so two hosts with equal
                # flags but different models still produce incompatible AOT
                # entries (observed round 5: cpu_aot_loader feature-mismatch
                # errors from same-flags entries of an earlier round's VM)
                for key in ("flags", "Features", "model name"):
                    if line.startswith(key) and key not in got:
                        got.add(key)
                        feats += " ".join(sorted(line.split(":", 1)[1].split()))
                if len(got) == 2:
                    break
    except OSError:  # pragma: no cover - non-Linux
        pass
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def _enable_persistent_compile_cache():
    """Persist compiled executables across processes (~/.cache/jax_nbss by
    default, override with JAX_COMPILATION_CACHE_DIR or disable with
    NBSS_NO_COMPILE_CACHE=1). The Pallas scan/attention kernels take minutes
    of Mosaic compile time per shape; without this every CLI / bench / test
    process pays it again.

    The cache lives in a per-host-fingerprint subdirectory: a cache
    directory that survives a machine change (or is copied between hosts)
    must never be loaded on the new machine."""
    import os

    if os.environ.get("NBSS_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        base = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "jax_nbss"))
        path = os.path.join(base, f"host-{_host_fingerprint()}")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
