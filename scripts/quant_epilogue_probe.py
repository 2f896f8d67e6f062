"""int8 inter-stage epilogue probe (VERDICT r4 item 6).

The production int8 graph (models/heads_int8.py::int8_stages) round-trips
every conv boundary through f32: conv_k dequantizes (int32 -> f32 scale +
bias), relu runs in f32, and conv_{k+1} re-quantizes (round/clip/cast to
int8). If XLA does NOT fuse that chain into the producer's epilogue, the
inter-conv HBM intermediate is f32 — 4x the bytes of an int8 intermediate
— and the measured +10.3% full-graph gain (vs 1.4-1.9x per conv) would
partly be epilogue tax.

This probe measures, at production shapes, three variants of a k-conv
chain (methodology = scripts/quant_probe.py: scan-repeat slope inside one
jit, perturbed inputs, full-sum reduction):

  A. production style — f32 in/out per conv (quantize at entry, dequant +
     relu at exit), exactly the int8_stages arithmetic;
  B. fused style — int8 intermediates: relu on the int32 accumulator,
     requant folded to a single multiply (sw/s_next), clip/round to int8;
  C. bf16 baseline.

If A ~= B: XLA already output-fuses the requant chain (int8 intermediate
in HBM) and the epilogue is not the ceiling — document and stop. If B
wins: wire chain-fusion into int8_stages for the sequential stages
(mask 4x stack, cls conv1->conv2, ResNet bottleneck interiors).

Run: python scripts/quant_epilogue_probe.py
"""

from __future__ import annotations

import functools
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quant_probe import DIMNUMS, timed  # noqa: E402


def chain_production(x_f32, weights_i8, s_in, sw):
    """A: f32 boundary per conv — int8_stages::conv arithmetic verbatim."""
    x = x_f32
    for w, si, swk in zip(weights_i8, s_in, sw):
        xq = jnp.clip(jnp.round(x / si), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, w, (1, 1), "SAME", dimension_numbers=DIMNUMS,
            preferred_element_type=jnp.int32,
        )
        x = jnp.maximum(acc.astype(jnp.float32) * swk, 0.0)
    return x


def chain_fused(x_i8, weights_i8, requant):
    """B: int8 intermediates — relu on int32, single-multiply requant."""
    x = x_i8
    for w, rq in zip(weights_i8, requant):
        acc = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=DIMNUMS,
            preferred_element_type=jnp.int32,
        )
        acc = jnp.maximum(acc, 0)  # relu commutes with positive scales
        x = jnp.clip(
            jnp.round(acc.astype(jnp.float32) * rq), -127, 127
        ).astype(jnp.int8)
    return x


def chain_bf16(x, weights):
    for w in weights:
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=DIMNUMS,
            preferred_element_type=jnp.bfloat16,
        )
        x = jnp.maximum(x, 0)
    return x


def main() -> None:
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print(f"device: {dev}")
    put = functools.partial(jax.device_put, device=dev)
    repeats = (16, 48)

    cases = [
        # (name, batch, hw, ch, k): the sequential int8 chains of the graph
        ("mask-stack 3x3 256ch @14^2 x800", 800, 14, 256, 4),
        ("res4-interior 3x3 256ch @32^2", 8, 32, 256, 6),
        ("res2-interior 3x3  64ch @128^2", 8, 128, 64, 6),
        ("rpn+fpn-like 3x3 256ch @64^2", 8, 64, 256, 2),
    ]
    print(f"{'case':36s} {'A prod f32-bound':>17s} {'B fused i8':>11s} "
          f"{'C bf16':>8s}  B/A speedup")
    for name, b, hw, ch, k in cases:
        w_f = [rng.randn(3, 3, ch, ch).astype(np.float32) * 0.05
               for _ in range(k)]
        w_i8 = [put(np.clip(np.round(w * 127), -127, 127).astype(np.int8))
                for w in w_f]
        w_bf = [put(w.astype(jnp.bfloat16)) for w in w_f]
        x_f = rng.randn(b, hw, hw, ch).astype(np.float32)
        s_in = [put(np.float32(0.05))] * k
        # per-out-channel dequant scales, as production
        sw = [put((rng.rand(ch).astype(np.float32) * 1e-3 + 1e-3))
              for _ in range(k)]
        rq = [put((rng.rand(ch).astype(np.float32) * 0.5 + 0.5))
              for _ in range(k)]
        ta = timed(lambda x, *a: chain_production(
            x, a[:k], [jnp.float32(0.05)] * k, a[k:]),
            (put(x_f), *w_i8, *sw), repeats)
        tb = timed(lambda x, *a: chain_fused(x, a[:k], a[k:]),
                   (put(np.clip(np.round(x_f / 0.05), -127, 127)
                        .astype(np.int8)), *w_i8, *rq), repeats)
        tc = timed(lambda x, *a: chain_bf16(x, a),
                   (put(x_f.astype(jnp.bfloat16)), *w_bf), repeats)
        print(f"{name:36s} {ta:14.3f} ms {tb:8.3f} ms {tc:5.3f} ms"
              f"  {ta / tb:10.2f}x")


if __name__ == "__main__":
    main()
