"""ResNet-50/101 + small "custom" backbone as flax modules.

Re-design of the reference graphs (reference: mrcnn/model.py:92-281):
bottleneck blocks with identity/projection shortcuts, stage-1 7x7 stride-2
stem, 3x3/stride-2 max-pool, stages C2-C5. ``train_bn=False`` (frozen batch
norm) is the production default (reference: mrcnn/config.py:216).

TPU notes: convs run in ``compute_dtype`` (bfloat16 by default) with float32
params and float32 BN statistics; XLA fuses BN+ReLU into the convolutions.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (stage4 identity-block count) per architecture (reference: mrcnn/model.py:199)
BLOCK_COUNTS = {"resnet50": 5, "resnet101": 22}


class FrozenableBatchNorm(nn.Module):
    """BatchNorm that acts as a fixed affine transform when frozen.

    Equivalent to the reference's ``BatchNorm(training=False)`` idiom
    (reference: mrcnn/model.py:57-72): running statistics are used and not
    updated.
    """

    train_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=(not train) or (not self.train_bn),
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Bottleneck(nn.Module):
    """1x1 -> kxk -> 1x1 bottleneck with optional projection shortcut
    (reference identity_block/conv_block: mrcnn/model.py:99-172)."""

    filters: Tuple[int, int, int]
    kernel: int = 3
    strides: int = 1
    project: bool = False
    train_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f1, f2, f3 = self.filters
        bn = lambda: FrozenableBatchNorm(self.train_bn, self.dtype)  # noqa: E731
        y = nn.Conv(f1, (1, 1), strides=self.strides, dtype=self.dtype, name="conv1")(x)
        y = bn()(y, train)
        y = nn.relu(y)
        y = nn.Conv(f2, (self.kernel, self.kernel), padding="SAME", dtype=self.dtype, name="conv2")(y)
        y = bn()(y, train)
        y = nn.relu(y)
        y = nn.Conv(f3, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = bn()(y, train)
        if self.project:
            sc = nn.Conv(f3, (1, 1), strides=self.strides, dtype=self.dtype, name="shortcut")(x)
            sc = bn()(sc, train)
        else:
            sc = x
        return nn.relu(y + sc)


class ResNet(nn.Module):
    """Backbone producing (C2, C3, C4, C5).

    architecture: resnet50 | resnet101 | custom. The custom variant is the
    reference's lightweight 5-stage net (reference: mrcnn/model.py:213-244).
    """

    architecture: str = "resnet101"
    train_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        custom = self.architecture == "custom"
        stem_f = 16 if custom else 64
        widths = (
            [(16, 16, 64), (32, 32, 128), (64, 64, 256), (128, 128, 512)]
            if custom
            else [(64, 64, 256), (128, 128, 512), (256, 256, 1024), (512, 512, 2048)]
        )
        n_stage4 = 1 if custom else BLOCK_COUNTS[self.architecture]
        x = x.astype(self.dtype)

        # Stage 1: 7x7/2 stem (explicit 3-pad like the reference's
        # ZeroPadding2D, reference: mrcnn/model.py:183-188)
        x = nn.Conv(stem_f, (7, 7), strides=2, padding=[(3, 3), (3, 3)], dtype=self.dtype, name="conv1")(x)
        x = FrozenableBatchNorm(self.train_bn, self.dtype, name="bn_conv1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        # Stage 2
        x = Bottleneck(widths[0], strides=1, project=True, train_bn=self.train_bn, dtype=self.dtype, name="res2a")(x, train)
        x = Bottleneck(widths[0], train_bn=self.train_bn, dtype=self.dtype, name="res2b")(x, train)
        c2 = x = Bottleneck(widths[0], train_bn=self.train_bn, dtype=self.dtype, name="res2c")(x, train)
        # Stage 3
        x = Bottleneck(widths[1], strides=2, project=True, train_bn=self.train_bn, dtype=self.dtype, name="res3a")(x, train)
        x = Bottleneck(widths[1], train_bn=self.train_bn, dtype=self.dtype, name="res3b")(x, train)
        x = Bottleneck(widths[1], train_bn=self.train_bn, dtype=self.dtype, name="res3c")(x, train)
        c3 = x = Bottleneck(widths[1], train_bn=self.train_bn, dtype=self.dtype, name="res3d")(x, train)
        # Stage 4
        x = Bottleneck(widths[2], strides=2, project=True, train_bn=self.train_bn, dtype=self.dtype, name="res4a")(x, train)
        for i in range(n_stage4):
            x = Bottleneck(widths[2], train_bn=self.train_bn, dtype=self.dtype, name=f"res4{chr(98 + i)}")(x, train)
        c4 = x
        # Stage 5
        x = Bottleneck(widths[3], strides=2, project=True, train_bn=self.train_bn, dtype=self.dtype, name="res5a")(x, train)
        x = Bottleneck(widths[3], train_bn=self.train_bn, dtype=self.dtype, name="res5b")(x, train)
        c5 = Bottleneck(widths[3], train_bn=self.train_bn, dtype=self.dtype, name="res5c")(x, train)
        return c2, c3, c4, c5


class FPN(nn.Module):
    """Top-down feature pyramid P2-P6 (reference: mrcnn/model.py:2003-2026).

    P6 is a stride-2 subsample of P5 used only by the RPN.
    """

    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c2, c3, c4, c5):
        def up2(x):
            b, h, w, c = x.shape
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

        p5 = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fpn_c5p5")(c5)
        p4 = up2(p5) + nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fpn_c4p4")(c4)
        p3 = up2(p4) + nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fpn_c3p3")(c3)
        p2 = up2(p3) + nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fpn_c2p2")(c2)
        p2 = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="fpn_p2")(p2)
        p3 = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="fpn_p3")(p3)
        p4 = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="fpn_p4")(p4)
        p5 = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="fpn_p5")(p5)
        # 1x1 max-pool stride 2 == stride-2 subsample (reference fpn_p6,
        # mrcnn/model.py:2022)
        p6 = p5[:, ::2, ::2, :]
        return p2, p3, p4, p5, p6
