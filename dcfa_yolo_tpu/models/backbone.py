"""ShuffleNetV2/SPPF-CBAM backbone (`nets/yolo_mul.py:252-308`), NHWC."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dcfa_yolo_tpu.ops.conv import ConvBnAct
from dcfa_yolo_tpu.models.blocks import ConvMaxpool, SPPFCBAM, ShuffleNetV2Block


class Backbone(nn.Module):
    """stem → dark2..dark5; each dark = s2 ConvBnAct + s1 ShuffleNetV2 unit;
    dark5 appends SPPF-CBAM.  Emits feats at /8, /16, /32."""

    base_channels: int
    deep_channels: int
    fold_shuffle: bool = False  # serving graph with channel_shuffles removed
    stem_backend: str = "xla"   # "pallas": fused train stem (blocks.ConvMaxpool)
    stem_interpret: Optional[bool] = None
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 stem_out: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        bc = self.base_channels
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        skw = dict(skip_shuffle=self.fold_shuffle, **kw)

        if stem_out is not None:
            # serving fast path: the fused Pallas stem (ops/pallas_stem.py)
            # already produced the pooled /2 NHWC map outside the module; the
            # stem submodules' params stay in the tree, just unread here
            x = stem_out.astype(self.dtype)
        else:
            x = ConvMaxpool(bc, backend=self.stem_backend,
                            stem_interpret=self.stem_interpret,
                            name="stem", **kw)(x, train=train)

        x = ConvBnAct(bc * 2, 3, 2, name="dark2_conv", **kw)(x, train=train)
        x = ShuffleNetV2Block(bc * 2, stride=1, name="dark2_shuffle", **skw)(x, train=train)

        x = ConvBnAct(bc * 4, 3, 2, name="dark3_conv", **kw)(x, train=train)
        x = ShuffleNetV2Block(bc * 4, stride=1, name="dark3_shuffle", **skw)(x, train=train)
        feat1 = x

        x = ConvBnAct(bc * 8, 3, 2, name="dark4_conv", **kw)(x, train=train)
        x = ShuffleNetV2Block(bc * 8, stride=1, name="dark4_shuffle", **skw)(x, train=train)
        feat2 = x

        x = ConvBnAct(self.deep_channels, 3, 2, name="dark5_conv", **kw)(x, train=train)
        x = ShuffleNetV2Block(self.deep_channels, stride=1, name="dark5_shuffle", **skw)(
            x, train=train)
        x = SPPFCBAM(self.deep_channels, pool_kernel=5, name="dark5_sppf", **kw)(
            x, train=train)
        feat3 = x
        return feat1, feat2, feat3
