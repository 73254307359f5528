"""A/B the SpatialNet-small forward under attention-path variants on the
real chip: XLA einsum attention, the fused Pallas narrow-band attention
kernel, and the fused attention-block megakernel.

Usage: python scripts/bench_attn_variants.py [B] [variants...]
Variants: xla pallas block (default: pallas block)

Methodology: params/inputs as jit ARGUMENTS, timed region inside one jitted
fori_loop with a carried data dependency, scalar fetch as the only sync
(BENCH_NOTES.md round-2 methodology notes).
"""

# run as `python scripts/<name>.py` from anywhere:
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbss_tpu.models import SpatialNet


def build(variant, B):
    kw = dict(
        dim_input=12, dim_output=4, num_layers=8, dim_hidden=96, dim_ffn=192,
        num_heads=4, kernel_size=(5, 3), conv_groups=(8, 8),
        norms=("LN", "LN", "GN", "LN", "LN", "LN"), dim_squeeze=8,
        num_freqs=129, full_share=0, dtype=jnp.bfloat16,
    )
    if variant == "xla":
        arch = SpatialNet(**kw, fused_block=False)
        import os
        os.environ["NBSS_ATTN"] = "xla"
    elif variant == "pallas":
        arch = SpatialNet(**kw, fused_block=False)
        import os
        os.environ["NBSS_ATTN"] = "pallas"
    elif variant == "block":
        arch = SpatialNet(**kw, fused_block=True)
    else:
        raise SystemExit(f"unknown variant {variant}")
    return arch


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    variants = sys.argv[2:] or ["pallas", "block"]
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, 129, 251, 12)),
                    jnp.float32)
    for variant in variants:
        arch = build(variant, B)
        params = arch.init(jax.random.PRNGKey(0), x[:1])

        @jax.jit
        def fwd_loop(params, x, n):
            def body(i, carry):
                y = arch.apply(params, x + carry * 1e-9)
                return jnp.mean(y).astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        t0 = time.monotonic()
        float(fwd_loop(params, x, 2))
        print(f"{variant}: compile+warmup {time.monotonic() - t0:.1f}s", flush=True)
        iters = 20
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fwd_loop(params, x, iters))
            dt = min(dt, (time.perf_counter() - t0) / iters)
        print(f"{variant}: fwd {dt * 1e3:.1f} ms/batch  "
              f"{B * 4.0 / dt:.1f} audio-sec/s", flush=True)


if __name__ == "__main__":
    main()
