"""DCFA-YOLO model assembly (`nets/yolo_mul.py:328-462`), TPU-first.

Differences from the reference, by design (SURVEY.md §7):
  * NHWC activations / HWIO kernels (XLA's preferred TPU conv layout);
  * the neck's upsample target sizes are derived from the input shape instead of
    the hardcoded (40,40)/(80,80) of `nets/yolo_mul.py:426,433`, so any input
    divisible by 32 works (320/640/1280 multi-scale sweep);
  * the neck in-channels are computed symbolically instead of the phi='n'-only
    literals at `nets/yolo_mul.py:361,364,376`, so every phi is functional
    (phi='n' remains the parity target and is numerically identical);
  * anchors/strides are static constants of the compiled program rather than
    buffers cached on the module (`nets/yolo_mul.py:455-457`);
  * outputs are (batch, anchors, channels) — anchors on the long (sublane) axis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.models.backbone import Backbone
from dcfa_yolo_tpu.models.blocks import CBAM, C2fRepGhost, ConcatBiFPN, dfl_decode
from dcfa_yolo_tpu.ops.boxes import make_anchors_np
from dcfa_yolo_tpu.ops.conv import ConvBnAct, torch_conv
from dcfa_yolo_tpu.ops.resize import resize_bilinear_align_corners


class YoloOutputs(NamedTuple):
    """Forward outputs, mirroring the reference's (dbox, cls, x, anchors, strides)
    tuple (`nets/yolo_mul.py:462`) in anchors-first layout."""

    dbox: jnp.ndarray        # (b, A, 4) DFL-decoded ltrb distances (feature units)
    cls: jnp.ndarray         # (b, A, nc) raw class logits
    feats: Tuple[jnp.ndarray, ...]  # raw per-level maps, NHWC (b, h, w, no)
    anchors: jnp.ndarray     # (A, 2) grid centers, feature units
    strides: jnp.ndarray     # (A, 1)


class DCFAYolo(nn.Module):
    """Dual-backbone (RGB+NIR) detector with CBAM cross-feature fusion, RepGhost
    PAN neck, and YOLOv8 decoupled DFL head."""

    cfg: ModelConfig
    deploy: bool = False
    # Serving graph with the backbones' channel_shuffles removed; pair with
    # `reparam.fold_shuffle_variables` (which permutes every consumer's
    # input-channel rows to compensate).  The shuffle is a pure permutation,
    # so on TPU it lowers to a relayout copy — HBM bytes for zero math.
    fold_shuffle: bool = False
    # Serving graph with BOTH backbones fused into one doubled-channel stream
    # (block-diagonal kernels; models/pairing.py).  Small-batch serving
    # option: full-pipeline −10% bytes / −41% backbone kernel launches at
    # batch 1, measured deviceless for v5e; LOSES at batch 128 (296 vs 245
    # MB/pair — the block-diagonal kernels add FLOPs).  Requires fold_shuffle
    # and variables from `pairing.pair_backbone_variables`; eval graph only.
    pair_backbones: bool = False
    # Serving graph with the neck's concat buffers eliminated: every concat
    # feeding a 1×1 conv (the three BiFPN fusions, the down-path concat, and
    # each C2fRepGhost's internal y-concat) becomes a sum of sliced-kernel
    # part convs (ops/conv.py ConvBnAct parts path).  Same parameters; exact
    # up to the K-split partial accumulation order (fold_shuffle's deviation
    # class).  XLA fuses elementwise producers into conv operands but never
    # a concatenate, so each of these concats is a real HBM round-trip —
    # measured 1.55 ms/iter for the P3 site alone at b128 640².
    split_neck_concats: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, nir: jnp.ndarray, train: bool = False,
                 stem_outs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                 ) -> YoloOutputs:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        bc, deep, depth = cfg.base_channels, cfg.deep_channels, cfg.base_depth
        kw = dict(axis_name=self.axis_name, dtype=dtype)

        rgb = rgb.astype(dtype)
        nir = nir.astype(dtype)

        if self.pair_backbones:
            # Serving-only paired stream (models/pairing.py): both backbones
            # as one doubled-channel graph with block-diagonal weights.
            if train:
                raise ValueError("pair_backbones is a serving-only graph")
            if not self.fold_shuffle:
                raise ValueError("pair_backbones requires fold_shuffle=True "
                                 "(pair_backbone_variables folds on top of "
                                 "fold_shuffle_variables)")
            from dcfa_yolo_tpu.models.pairing import (
                PairedBackbone, PairedCBAM, PairedConcatBiFPN, pair_layout)

            stem_pair = (jnp.concatenate(
                [s.astype(dtype) for s in stem_outs], axis=-1)
                if stem_outs is not None else None)
            x_pair = jnp.concatenate([rgb, nir], axis=-1)
            f1p, f2p, f3p = PairedBackbone(bc, deep, name="backbone_pair",
                                           **kw)(x_pair, train, stem_pair)
            f1p = PairedCBAM(n_blocks=4, dtype=dtype, name="cbam_pair_feat1")(f1p)
            f2p = PairedCBAM(n_blocks=4, dtype=dtype, name="cbam_pair_feat2")(f2p)
            f3p = PairedCBAM(n_blocks=2, dtype=dtype, name="cbam_pair_feat3")(f3p)

            # P5 fusion (`nets/yolo_mul.py:421`): feat3 is modality-blocked,
            # so the rgb+nir add is a fold over the modality axis.
            b_, h_, w_, cc = f3p.shape
            feat3 = f3p.reshape(b_, h_, w_, 2, cc // 2).sum(axis=-2)

            bi_fpn = PairedConcatBiFPN(dtype=dtype, name="bi_fpn")
            mask1 = pair_layout(bc * 4, 4)[0]
            mask2 = pair_layout(bc * 8, 4)[0]
            mask3 = pair_layout(deep, 2)[0]

            p4_hw = f2p.shape[1:3]
            p3_hw = f1p.shape[1:3]
            p5_up = resize_bilinear_align_corners(feat3, p4_hw)
            p4 = bi_fpn(p5_up, f2p, mask2)
            p4 = C2fRepGhost(bc * 8, n=depth, deploy=self.deploy,
                             name="conv3_for_upsample1", **kw)(p4, train=train)

            p4_up = resize_bilinear_align_corners(p4, p3_hw)
            p3 = bi_fpn(p4_up, f1p, mask1)
            p3 = C2fRepGhost(bc * 4, n=depth, deploy=self.deploy,
                             name="conv3_for_upsample2", **kw)(p3, train=train)

            p3_down = ConvBnAct(bc * 4, 3, 2, name="down_sample1", **kw)(p3, train=train)
            p4 = jnp.concatenate([p3_down, p4], axis=-1)
            p4 = C2fRepGhost(bc * 8, n=depth, deploy=self.deploy,
                             name="conv3_for_downsample1", **kw)(p4, train=train)

            p4_down = ConvBnAct(bc * 8, 3, 2, name="down_sample2", **kw)(p4, train=train)
            p5 = bi_fpn(p4_down, f3p, mask3)
            p5 = C2fRepGhost(deep, n=depth, deploy=self.deploy,
                             name="conv3_for_downsample2", **kw)(p5, train=train)
        else:
            # Optionally rematerialize the backbones (the full-resolution
            # stem/dark activations dominate train-time memory; the pyramid
            # taps are tiny).  static_argnums=(2,): arg 0 is the module
            # instance under nn.remat, arg 2 is the python-bool train flag.
            Bk = (nn.remat(Backbone, static_argnums=(2,)) if cfg.remat and train
                  else Backbone)
            stem_rgb, stem_nir = stem_outs if stem_outs is not None else (None, None)
            bkw = dict(fold_shuffle=self.fold_shuffle,
                       stem_backend=cfg.train_stem_backend,
                       stem_interpret=cfg.train_stem_interpret, **kw)
            feat1_rgb, feat2_rgb, feat3_rgb = Bk(bc, deep, name="backbone_rgb", **bkw)(
                rgb, train, stem_rgb)
            feat1_nir, feat2_nir, feat3_nir = Bk(bc, deep, name="backbone_nir", **bkw)(
                nir, train, stem_nir)

            # Per-level, per-modality CBAM before fusion (`nets/yolo_mul.py:346-353`).
            feat1_rgb = CBAM(dtype=dtype, name="cbam_rgb_feat1")(feat1_rgb)
            feat1_nir = CBAM(dtype=dtype, name="cbam_nir_feat1")(feat1_nir)
            feat2_rgb = CBAM(dtype=dtype, name="cbam_rgb_feat2")(feat2_rgb)
            feat2_nir = CBAM(dtype=dtype, name="cbam_nir_feat2")(feat2_nir)
            feat3_rgb = CBAM(dtype=dtype, name="cbam_rgb_feat3")(feat3_rgb)
            feat3_nir = CBAM(dtype=dtype, name="cbam_nir_feat3")(feat3_nir)

            # P5 fusion is an element-wise add (`nets/yolo_mul.py:421`).
            feat3 = feat3_rgb + feat3_nir

            # One ConcatBiFPN instance shared across all three fusion points, like the
            # reference's single `self.bi_fpn` (`nets/yolo_mul.py:344,428,435,443`).
            split = self.split_neck_concats
            bi_fpn = ConcatBiFPN(dtype=dtype, name="bi_fpn",
                                 return_parts=split)
            ckw = dict(deploy=self.deploy, split_concats=split, **kw)

            # ---- PAN neck ----
            p4_hw = feat2_rgb.shape[1:3]
            p3_hw = feat1_rgb.shape[1:3]

            p5_up = resize_bilinear_align_corners(feat3, p4_hw)
            p4 = bi_fpn((p5_up, feat2_rgb, feat2_nir))
            p4 = C2fRepGhost(bc * 8, n=depth,
                             name="conv3_for_upsample1", **ckw)(p4, train=train)

            p4_up = resize_bilinear_align_corners(p4, p3_hw)
            p3 = bi_fpn((p4_up, feat1_rgb, feat1_nir))
            p3 = C2fRepGhost(bc * 4, n=depth,
                             name="conv3_for_upsample2", **ckw)(p3, train=train)

            p3_down = ConvBnAct(bc * 4, 3, 2, name="down_sample1", **kw)(p3, train=train)
            p4 = ((p3_down, p4) if split
                  else jnp.concatenate([p3_down, p4], axis=-1))
            p4 = C2fRepGhost(bc * 8, n=depth,
                             name="conv3_for_downsample1", **ckw)(p4, train=train)

            p4_down = ConvBnAct(bc * 8, 3, 2, name="down_sample2", **kw)(p4, train=train)
            p5 = bi_fpn((p4_down, feat3_rgb, feat3_nir))
            p5 = C2fRepGhost(deep, n=depth,
                             name="conv3_for_downsample2", **ckw)(p5, train=train)

        # ---- Decoupled head (`nets/yolo_mul.py:387-391,452-453`) ----
        ch = cfg.feat_channels
        c2 = max(16, ch[0] // 4, cfg.reg_max * 4)
        c3 = max(ch[0], cfg.num_classes)
        feats = []
        boxes_l, clses_l = [], []
        for i, p in enumerate((p3, p4, p5)):
            box = ConvBnAct(c2, 3, name=f"cv2_{i}_0", **kw)(p, train=train)
            box = ConvBnAct(c2, 3, name=f"cv2_{i}_1", **kw)(box, train=train)
            box = torch_conv(4 * cfg.reg_max, 1, use_bias=True, dtype=dtype,
                             name=f"cv2_{i}_2")(box)
            cls = ConvBnAct(c3, 3, name=f"cv3_{i}_0", **kw)(p, train=train)
            cls = ConvBnAct(c3, 3, name=f"cv3_{i}_1", **kw)(cls, train=train)
            cls = torch_conv(cfg.num_classes, 1, use_bias=True, dtype=dtype,
                             name=f"cv3_{i}_2")(cls)
            boxes_l.append(box)
            clses_l.append(cls)
            feats.append(jnp.concatenate([box, cls], axis=-1))

        # Flatten levels to the anchor axis; row-major (y, x) per level matches the
        # reference's NCHW `.view(b, no, -1)` order (`nets/yolo_mul.py:459`).
        # Box/cls flatten straight from the per-level maps rather than slicing
        # the (B, 8400, no) level concat back apart: a channel slice of
        # `concat([box, cls])` IS the operand (bit-exact), and skipping the
        # round trip keeps the ~(B, 8400, no) buffer plus two slice reads out
        # of HBM in the serving graph (~3 MB/pair at b128 640²).  `feats`
        # still carries the concatenated maps for the loss/heatmap consumers.
        b = feats[0].shape[0]
        box_logits = jnp.concatenate(
            [f.reshape(b, -1, cfg.reg_max * 4) for f in boxes_l],
            axis=1).astype(jnp.float32)
        cls_logits = jnp.concatenate(
            [f.reshape(b, -1, cfg.num_classes) for f in clses_l],
            axis=1).astype(jnp.float32)
        dbox = dfl_decode(box_logits, cfg.reg_max)

        if stem_outs is not None:
            # rgb/nir may be dummies on the external-stem path; the stem
            # output is the /2-pooled map
            input_hw = (stem_outs[0].shape[1] * 2, stem_outs[0].shape[2] * 2)
        else:
            input_hw = (rgb.shape[1], rgb.shape[2])
        anchors_np, strides_np = make_anchors_np(input_hw, cfg.strides)
        return YoloOutputs(
            dbox=dbox,
            cls=cls_logits,
            feats=tuple(feats),
            anchors=jnp.asarray(anchors_np),
            strides=jnp.asarray(strides_np),
        )


def init_model(cfg: ModelConfig, rng, batch_size: int = 1):
    """Initialize variables for a DCFAYolo with dummy inputs of cfg.input_shape.

    The init runs under jit: on remote-dispatch platforms (axon tunnel) eager
    per-op execution costs an RPC per op, turning module init into minutes.
    """
    import jax

    model = DCFAYolo(cfg)
    h, w = cfg.input_shape
    dummy = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, dummy, dummy, train=False))(rng)
    return model, variables


def count_params(variables) -> int:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
