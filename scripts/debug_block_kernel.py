"""Bisect the attention_block megakernel Mosaic compiler crash.

Compiles progressively larger fragments of the kernel on the real chip at
the bench shapes (bf16, mb=8, Tp=256, H=96). Run one variant per process:

    python scripts/debug_block_kernel.py K1|K2|K3|K4|K5|K6

K1  LN only ([2, H] param ref + lane reductions)
K2  + ones-lane concat to 97 lanes
K3  + reshape-merge and one [2048, 97] x [97, 97] dot
K4  + per-head scores + softmax + PV dot (no divide)
K5  full kernel (97-lane augmented width)
K6  full kernel with the augmented width padded to 128 lanes
"""

# run as `python scripts/<name>.py` from anywhere:
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
mb, Tp, H, nh = 8, 256, 96, 4
M = 16


def _ln(x_ref, ln_ref):
    f32 = jnp.float32
    xf = x_ref[...].astype(f32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    return xc * jax.lax.rsqrt(var + 1e-5) * ln_ref[0] + ln_ref[1]


def k1(x_ref, ln_ref, o_ref):
    o_ref[...] = _ln(x_ref, ln_ref).astype(o_ref.dtype)


def k2(x_ref, ln_ref, o_ref):
    xln = _ln(x_ref, ln_ref)
    xa = jnp.concatenate([xln, jnp.ones((mb, Tp, 1), jnp.float32)], axis=2)
    o_ref[...] = xa[:, :, :H].astype(o_ref.dtype)


def k3(x_ref, ln_ref, a_ref, o_ref):
    dt = x_ref.dtype
    xln = _ln(x_ref, ln_ref)
    xa = jnp.concatenate([xln, jnp.ones((mb, Tp, 1), jnp.float32)], axis=2).astype(dt)
    Ha = xa.shape[-1]
    xa2 = xa.reshape(mb * Tp, Ha)
    t = jax.lax.dot_general(xa2, a_ref[0].astype(dt),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = t.reshape(mb, Tp, Ha)[:, :, :H].astype(o_ref.dtype)


def _heads(x_ref, ln_ref, a_ref, w_ref, divide):
    dt = x_ref.dtype
    xln = _ln(x_ref, ln_ref)
    xa = jnp.concatenate([xln, jnp.ones((mb, Tp, 1), jnp.float32)], axis=2).astype(dt)
    Ha = xa.shape[-1]
    xa2 = xa.reshape(mb * Tp, Ha)
    acc = None
    for h in range(nh):
        t = jax.lax.dot_general(xa2, a_ref[h].astype(dt),
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(dt).reshape(mb, Tp, Ha)
        s = jax.lax.dot_general(t, xa, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(dt)
        vo = jax.lax.dot_general(xa2, w_ref[h].astype(dt),
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(dt).reshape(mb, Tp, Ha)
        pv = jax.lax.dot_general(e, vo, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        o_h = pv[:, :, :H] / pv[:, :, H:H + 1] if divide else pv[:, :, :H]
        acc = o_h if acc is None else acc + o_h
    return acc


def k4(x_ref, ln_ref, a_ref, w_ref, o_ref):
    o_ref[...] = _heads(x_ref, ln_ref, a_ref, w_ref, divide=False).astype(o_ref.dtype)


def k5(x_ref, ln_ref, a_ref, w_ref, o_ref):
    o_ref[...] = _heads(x_ref, ln_ref, a_ref, w_ref, divide=True).astype(o_ref.dtype)


def k6(x_ref, ln_ref, a_ref, w_ref, o_ref):
    """Full kernel, augmented width padded to 128 lanes."""
    dt = x_ref.dtype
    f32 = jnp.float32
    xln = _ln(x_ref, ln_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (mb, Tp, 32), 2)
    tail = jnp.where(lane == 0, 1.0, 0.0).astype(f32)
    xa = jnp.concatenate([xln, tail], axis=2).astype(dt)  # [mb, Tp, 128]
    Ha = 128
    xa2 = xa.reshape(mb * Tp, Ha)
    acc = None
    for h in range(nh):
        t = jax.lax.dot_general(xa2, a_ref[h].astype(dt),
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        s = jax.lax.dot_general(t, xa, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=f32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(dt)
        vo = jax.lax.dot_general(xa2, w_ref[h].astype(dt),
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        pv = jax.lax.dot_general(e, vo, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        o_h = pv[:, :, :H] / pv[:, :, H:H + 1]
        acc = o_h if acc is None else acc + o_h
    o_ref[...] = acc.astype(o_ref.dtype)


def k7(x_ref, ln_ref, a_ref, w_ref, o_ref):
    """k5 + the t_valid pad-mask add."""
    dt = x_ref.dtype
    f32 = jnp.float32
    xln = _ln(x_ref, ln_ref)
    xa = jnp.concatenate([xln, jnp.ones((mb, Tp, 1), f32)], axis=2).astype(dt)
    Ha = xa.shape[-1]
    xa2 = xa.reshape(mb * Tp, Ha)
    col = jax.lax.broadcasted_iota(jnp.int32, (mb, Tp, Tp), 2)
    pad_mask = jnp.where(col < 251, 0.0, NEG_INF).astype(f32)
    acc = None
    for h in range(nh):
        t = jax.lax.dot_general(xa2, a_ref[h].astype(dt),
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        s = jax.lax.dot_general(t, xa, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=f32)
        s = s + pad_mask
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(dt)
        vo = jax.lax.dot_general(xa2, w_ref[h].astype(dt),
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        pv = jax.lax.dot_general(e, vo, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        o_h = pv[:, :, :H] / pv[:, :, H:H + 1]
        acc = o_h if acc is None else acc + o_h
    o_ref[...] = acc.astype(o_ref.dtype)


def k8(x_ref, ln_ref, a_ref, w_ref, c_ref, o_ref):
    """k5 + c bias [1, H] + residual."""
    acc = _heads(x_ref, ln_ref, a_ref, w_ref, divide=True)
    o_ref[...] = (acc + c_ref[0] + x_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def main():
    variant = sys.argv[1]
    Ha = 128 if variant == "k6" else H + 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, Tp, H)), jnp.bfloat16)
    ln = jnp.asarray(rng.standard_normal((2, H)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((nh, Ha, Ha)) * 0.05, jnp.float32)
    W = jnp.asarray(rng.standard_normal((nh, Ha, Ha)) * 0.05, jnp.float32)

    xspec = pl.BlockSpec((mb, Tp, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    kern = {"k1": k1, "k2": k2, "k3": k3, "k4": k4, "k5": k5, "k6": k6,
            "k7": k7, "k8": k8}[variant]
    c = jnp.asarray(np.zeros((1, H)), jnp.float32)
    ops = {"k1": (x, ln), "k2": (x, ln), "k3": (x, ln, A),
           "k8": (x, ln, A, W, c)}.get(variant, (x, ln, A, W))
    out = pl.pallas_call(
        kern,
        grid=(M // mb,),
        in_specs=[xspec] + [full(o) for o in ops[1:]],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((M, Tp, H), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*ops)
    print(variant, "ok:", np.asarray(out[0, 0, :3], np.float32))


if __name__ == "__main__":
    main()
