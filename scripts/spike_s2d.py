"""Spike: space-to-depth (S2D) formulation of the 3x3 reflection-padded
convs in the appearance/CGNet heads.

Motivation: the conv heads cost ~10-12 ms/step at 14-25% MXU because the
channel widths (64, 128) under-fill the 128x128 systolic array
(BASELINE.md profile; the Pallas-conv and taps-matmul alternatives were
measured slower). S2D(2x2) re-expresses a 3x3 stride-1 conv on (H, W, C)
as a 2x2 VALID conv on (H/2, W/2, 4C) with a sparsity-structured
(2,2,4C,4F) kernel: contraction dim 4C (64ch -> 256) and output dim 4F.
FLOP cost is 16/9 of the original (9/16 of K2's taps are structurally
zero), so the bet is MXU utilization rising by more than 1.78x. The
known risk is the strided reshapes: the reshape-max pooling experiment
lost to exactly those transposes (models/common.py:56).

Math: with x reflect-padded by 1 (so (H+2, W+2), H, W even), output pixel
(u=2i+p, v=2j+q) reads padded rows 2i+p+dy, dy in 0..2 — for both p the
union is rows 2i..2i+3 = S2D rows i..i+1: a 2x2 S2D kernel, exactly.
K2[(r,s),(p',q',c),(p,q,f)] = K[2r+p'-p, 2s+q'-q, c, f] where the index
is in 0..2, else 0.

Run on CPU: exactness + grad checks. Run on TPU: marginal-scan timing of
fwd+bwd at the bench head shapes.
"""

from __future__ import annotations

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from crnerf_tpu.models.common import reflect_pad


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (p, q, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, i, j, p, q, c
    return x.reshape(b, h // 2, w // 2, 4 * c)


def d2s(y):
    """Inverse of s2d for the OUTPUT phase order (p, q, f)."""
    b, i, j, cf = y.shape
    f = cf // 4
    y = y.reshape(b, i, j, 2, 2, f)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # b, i, p, j, q, f
    return y.reshape(b, 2 * i, 2 * j, f)


def pack_kernel(K):
    """(3, 3, C, F) -> (2, 2, 4C, 4F) with the S2D tap layout."""
    kh, kw, c, f = K.shape
    assert kh == kw == 3
    K2 = jnp.zeros((2, 2, 2, 2, c, 2, 2, f), K.dtype)  # r s p' q' c p q f
    for r in range(2):
        for s in range(2):
            for pp in range(2):
                for qq in range(2):
                    for p in range(2):
                        for q in range(2):
                            dy = 2 * r + pp - p
                            dx = 2 * s + qq - q
                            if 0 <= dy <= 2 and 0 <= dx <= 2:
                                K2 = K2.at[r, s, pp, qq, :, p, q, :].set(
                                    K[dy, dx]
                                )
    return K2.reshape(2, 2, 4 * c, 4 * f)


def conv3x3_refl(x, K, b=None):
    """Reference path: reflect-pad + VALID 3x3 (models/common.py ConvRefl)."""
    xp = reflect_pad(x, 1)
    out = jax.lax.conv_general_dilated(
        xp, K, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out if b is None else out + b


def conv3x3_s2d(x, K, b=None):
    """S2D path: same math, 2x2 conv at 4C/4F widths."""
    xp = reflect_pad(x, 1)  # (B, H+2, W+2, C); H, W even -> dims even
    y = jax.lax.conv_general_dilated(
        s2d(xp), pack_kernel(K), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = d2s(y)
    return out if b is None else out + b


def check_exact():
    key = jax.random.PRNGKey(0)
    for (h, w, c, f) in [(8, 12, 5, 7), (160, 224, 64, 64), (80, 112, 128, 128)]:
        kx, kk, kb, kc = jax.random.split(jax.random.fold_in(key, h), 4)
        x = jax.random.normal(kx, (2, h, w, c), jnp.float32)
        K = jax.random.normal(kk, (3, 3, c, f), jnp.float32) / np.sqrt(9 * c)
        b = jax.random.normal(kb, (f,), jnp.float32)
        ref = conv3x3_refl(x, K, b)
        alt = conv3x3_s2d(x, K, b)
        err = float(jnp.max(jnp.abs(ref - alt)))
        # grads: scalar loss with a fixed cotangent pattern
        ct = jax.random.normal(kc, ref.shape, jnp.float32)
        g_ref = jax.grad(lambda k_: jnp.vdot(conv3x3_refl(x, k_, b), ct))(K)
        g_alt = jax.grad(lambda k_: jnp.vdot(conv3x3_s2d(x, k_, b), ct))(K)
        gx_ref = jax.grad(lambda x_: jnp.vdot(conv3x3_refl(x_, K, b), ct))(x)
        gx_alt = jax.grad(lambda x_: jnp.vdot(conv3x3_s2d(x_, K, b), ct))(x)
        gerr = float(jnp.max(jnp.abs(g_ref - g_alt)))
        gxerr = float(jnp.max(jnp.abs(gx_ref - gx_alt)))
        print(f"({h},{w},{c}->{f}): fwd {err:.2e}  dK {gerr:.2e}  "
              f"dx {gxerr:.2e}")
        assert err < 1e-4 and gerr < 1e-3 and gxerr < 1e-4


def _marginal_time(fn, args, k1=8, k2=16):
    """Marginal-scan timing (BASELINE.md methodology): chain K executions
    inside one jit via lax.scan on a donated carry, fetch a scalar."""

    def chain(k):
        def body(c, _):
            out = fn(*((c,) + args[1:]))
            # keep carry shape: fold output back to input shape via slice
            return c + 0.001 * out.reshape(c.shape)[: c.shape[0]], ()

        f = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=k)[0])
        x0 = args[0]
        r = f(x0)
        float(jnp.sum(r[0, 0, 0]))  # warm + fetch
        t = time.time()
        r = f(x0)
        float(jnp.sum(r[0, 0, 0]))
        return time.time() - t

    t1, t2 = chain(k1), chain(k2)
    return (t2 - t1) / (k2 - k1)


def bench():
    gshapes = [
        ("conv3 (16,160,224,64->64)", (16, 160, 224, 64), 64),
        ("conv5 (16,80,112,128->128)", (16, 80, 112, 128), 128),
    ]
    key = jax.random.PRNGKey(0)
    for name, xs, f in gshapes:
        kx, kk, kc = jax.random.split(jax.random.fold_in(key, xs[1]), 3)
        x = jax.random.normal(kx, xs, jnp.bfloat16)
        K = (jax.random.normal(kk, (3, 3, xs[-1], f), jnp.float32)
             / np.sqrt(9 * xs[-1]))
        ct = jax.random.normal(kc, xs[:-1] + (f,), jnp.bfloat16)

        for label, conv in [("refl", conv3x3_refl), ("s2d", conv3x3_s2d)]:
            def fwdbwd(x_, K_, ct_):
                out, vjp = jax.vjp(
                    lambda a, k: conv(a, k.astype(jnp.bfloat16)), x_, K_
                )
                dx, dK = vjp(ct_)
                return out + dx + 0.0 * jnp.sum(dK).astype(out.dtype)

            dt = _marginal_time(fwdbwd, (x, K, ct))
            flops = 2 * 9 * np.prod(xs) * f * 3  # fwd+dgrad+wgrad
            print(f"{name} {label}: {dt * 1e3:7.3f} ms  "
                  f"{flops / dt / 1e12:6.1f} TFLOP/s-equiv")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()
    if args.bench:
        bench()
    else:
        check_exact()
