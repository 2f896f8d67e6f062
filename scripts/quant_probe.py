"""int8-vs-bf16 conv/matmul micro-probe (quantized-inference feasibility).

Measures, on the real chip, whether XLA lowers int8 convolutions and
matmuls to the v5e's int8 MXU path (394 TOPS peak vs 197 TFLOPS bf16) and
whether the requantize epilogue fuses — the go/no-go gate for a quantized
detect path. Methodology follows scripts/profile_stages.py (everything
that burned us before): lax.scan repetition inside ONE jit so the tunnel
dispatch cost is amortized, per-iteration input perturbation so nothing is
loop-invariant-hoisted, full-sum reduction so nothing is DCE'd/sliced, and
timing by slope between two repeat counts so scan overhead cancels.

Run: python scripts/quant_probe.py

MEASURED (v5e-1, 2026-08-19, repeats (16,48)):
    res2-like 3x3  64ch @128^2: bf16 0.875 ms | int8 0.785 ms | 1.11x
    res3-like 3x3 128ch  @64^2: bf16 0.186 ms | int8 0.217 ms | 0.86x (*)
    res4-like 3x3 256ch  @32^2: bf16 0.344 ms | int8 0.178 ms | 1.93x
    res5-like 3x3 512ch  @16^2: bf16 0.266 ms | int8 0.186 ms | 1.43x
    rpn-like  3x3 256->512 @64^2: bf16 1.188 | int8 0.728 ms | 1.63x
    fpn-like  3x3 256ch  @64^2: bf16 0.515 ms | int8 0.192 ms | 2.68x (*)
    mask-like 3x3 256ch  @14^2 x800: bf16 3.76 | int8 2.01 ms | 1.87x
    fc1-like [8000,12544]@[12544,1024]: bf16 1.08 | int8 0.574 ms | 1.88x
(*) slope noise: res3 re-measured standalone at 1.78x (339 TOP/s) and the
    fpn int8 reading (402 TOP/s) sits above the 394 peak — individual rows
    jitter; the stable conclusion is int8 ~1.4-1.9x on every compute-bound
    conv/matmul and ~1.1x on the bandwidth-bound low-channel res2 stage.
VERDICT: GO — quantized detect path wired as models/backbone_int8.py +
models/heads_int8.py behind config.quant_mode.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv_chain_bf16(x, weights):
    """k back-to-back 3x3 same convs in bf16 (the backbone's hot pattern)."""
    for w in weights:
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=DIMNUMS,
            preferred_element_type=jnp.bfloat16,
        )
        x = jnp.maximum(x, 0)
    return x


def conv_chain_int8(x_i8, weights_i8, scales):
    """Same chain with int8 inputs/weights, s32 accumulation, and a fused
    requantize epilogue (scale + clip + round back to int8)."""
    x = x_i8
    for w, s in zip(weights_i8, scales):
        acc = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=DIMNUMS,
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * s
        y = jnp.maximum(y, 0.0)
        x = jnp.clip(jnp.round(y * 2.0), -127, 127).astype(jnp.int8)
    return x


def matmul_bf16(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16
    )


def matmul_int8(x_i8, w_i8, scale):
    acc = jax.lax.dot_general(
        x_i8, w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * scale


def timed(fn, args, repeats):
    """Per-iteration ms via scan-repeat slope between two repeat counts.

    Compiles ONE jitted scan per repeat count (n is a static arg) so the
    probe pays 2 compiles per case, not 2 per timing pass.
    """

    @functools.partial(jax.jit, static_argnums=0)
    def body(n, *a_in):
        def step(carry, i):
            a = [
                (x + (i % 3 + 1).astype(x.dtype)
                 if jnp.issubdtype(x.dtype, jnp.integer)
                 else x * (1.0 + 1e-6 * i.astype(jnp.float32)).astype(x.dtype))
                if hasattr(x, "dtype") else x
                for x in a_in
            ]
            out = fn(*a)
            red = jnp.sum(out.astype(jnp.float32)) + carry
            return red, ()

        total, _ = jax.lax.scan(
            step, jnp.float32(0.0), jnp.arange(n, dtype=jnp.int32)
        )
        return total

    def run(n):
        t0 = time.perf_counter()
        _ = np.asarray(body(n, *args))  # host fetch fences device work on axon
        return time.perf_counter() - t0

    n1, n2 = repeats
    _ = run(n1), run(n2)  # compile both variants (warmup)
    t1 = min(run(n1) for _ in range(3))
    t2 = min(run(n2) for _ in range(3))
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print(f"device: {dev}")
    put = functools.partial(jax.device_put, device=dev)

    cases = [
        # (name, batch, hw, cin, cout, k_layers) — production 512^2 detect shapes
        ("res2-like 3x3  64ch @128^2", 8, 128, 64, 64, 6),
        ("res3-like 3x3 128ch  @64^2", 8, 64, 128, 128, 6),
        ("res4-like 3x3 256ch  @32^2", 8, 32, 256, 256, 6),
        ("res5-like 3x3 512ch  @16^2", 8, 16, 512, 512, 6),
        ("rpn-like  3x3 256->512 @64^2", 8, 64, 256, 512, 2),
        ("fpn-like  3x3 256ch  @64^2", 8, 64, 256, 256, 2),
        ("mask-like 3x3 256ch  @14^2", 800, 14, 256, 256, 4),
    ]
    for name, b, hw, cin, cout, k in cases:
        x = rng.randn(b, hw, hw, cin).astype(np.float32)
        ws = [
            rng.randn(3, 3, cin if i == 0 else cout, cout).astype(np.float32)
            * 0.05
            for i in range(k)
        ]
        flops = (
            2 * b * hw * hw * 9
            * (cin * cout + (k - 1) * cout * cout)
        )
        xb = put(jnp.asarray(x, jnp.bfloat16))
        wsb = [put(jnp.asarray(w, jnp.bfloat16)) for w in ws]
        ms_bf16 = timed(lambda x_, *w_: conv_chain_bf16(x_, w_), (xb, *wsb), (16, 48))

        xi = put(jnp.clip(np.round(x * 20), -127, 127).astype(np.int8))
        wsi = [put(jnp.clip(np.round(w * 300), -127, 127).astype(np.int8)) for w in ws]
        scales = [put(jnp.float32(1e-4))] * k
        ms_int8 = timed(
            lambda x_, *rest: conv_chain_int8(
                x_, list(rest[:k]), list(rest[k:])
            ),
            (xi, *wsi, *scales),
            (16, 48),
        )
        tf_bf16 = flops / (ms_bf16 * 1e-3) / 1e12
        tf_int8 = flops / (ms_int8 * 1e-3) / 1e12
        print(
            f"{name}: bf16 {ms_bf16:.3f} ms ({tf_bf16:.1f} TF/s) | "
            f"int8 {ms_int8:.3f} ms ({tf_int8:.1f} TOP/s) | "
            f"speedup {ms_bf16 / ms_int8:.2f}x"
        )

    # classifier fc1-like matmul: [8000, 12544] @ [12544, 1024]
    m, kk, n = 8000, 12544, 1024
    a = rng.randn(m, kk).astype(np.float32) * 0.1
    w = rng.randn(kk, n).astype(np.float32) * 0.02
    ab = put(jnp.asarray(a, jnp.bfloat16))
    wb = put(jnp.asarray(w, jnp.bfloat16))
    ms_bf16 = timed(matmul_bf16, (ab, wb), (16, 48))
    ai = put(jnp.clip(np.round(a * 50), -127, 127).astype(np.int8))
    wi = put(jnp.clip(np.round(w * 500), -127, 127).astype(np.int8))
    ms_int8 = timed(
        lambda a_, w_: matmul_int8(a_, w_, jnp.float32(4e-5)), (ai, wi), (16, 48)
    )
    flops = 2 * m * kk * n
    print(
        f"fc1-like [{m},{kk}]@[{kk},{n}]: bf16 {ms_bf16:.3f} ms "
        f"({flops/(ms_bf16*1e-3)/1e12:.1f} TF/s) | int8 {ms_int8:.3f} ms "
        f"({flops/(ms_int8*1e-3)/1e12:.1f} TOP/s) | "
        f"speedup {ms_bf16/ms_int8:.2f}x"
    )


if __name__ == "__main__":
    main()
