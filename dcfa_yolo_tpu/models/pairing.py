"""Deploy-time pairing of the dual backbones into ONE doubled-channel stream.

The reference runs two identical-architecture backbones sequentially
(`nets/yolo_mul.py:342-343,399-400`).  On TPU at small batch that is the wrong
shape: each per-modality conv is a separate small kernel launch with its own
relayout copies, and the ~halved channel width under-fills the vector lanes.
Measured deviceless for v5e at batch 1 (tools/serve_traffic_aot.py protocol,
darks only): two bc=16 streams access 500.1 MB over ~217 top-level kernels;
one doubled-channel stream accesses 361.1 MB over ~127 (−28% bytes, −41%
kernels).  Full pipeline (tools/serve_traffic_aot.py, pallas stem + u8 +
fold): b1 785.1 → 709.2 MB/pair (−10%); at b128 pairing LOSES (231.9 →
296.1 MB/pair — the block-diagonal kernels double the conv FLOPs, and the
batch-minor layouts already fill the lanes), so pairing is a small-batch
serving option, not the default.

Pairing is a pure weight transform plus a paired module graph, exact up to
floating-point summation order (tests/test_pair_backbones.py):

  * every dense conv of the two backbones becomes ONE conv on the
    concatenated stream with a block-diagonal kernel (the off-modality blocks
    are zero, so the math is unchanged; a zero addend is exact in FP);
  * depthwise convs / BN / biases concatenate per-channel — zero overhead;
  * channel layouts are chosen so ShuffleNetV2's split/concat stay contiguous:
    every paired tensor is an "alternating modality block" layout
    [R_blk0 | N_blk0 | R_blk1 | N_blk1 | ...] with equal block sizes, fully
    described by one integer n_blocks (see `pair_layout`).  With that choice
    the STANDARD ShuffleNetV2Block (skip_shuffle, doubled features) computes
    the paired math verbatim: its midpoint split is exactly the
    [R_lo|N_lo] / [R_hi|N_hi] boundary;
  * fixed permutations between a producer's layout and a consumer's are
    absorbed into the consumer's kernel rows at transform time (the same idea
    as `reparam.fold_shuffle_variables` — `pair_backbone_variables` expects
    ALREADY-FOLDED variables and composes with that fold);
  * per-modality reductions (CBAM spatial mean/max, the P5 add
    `nets/yolo_mul.py:421`, the BiFPN per-input weights
    `nets/yolo_mul.py:36-51`) become reshape-axis segment ops — no gathers.

Use: variables' = pair_backbone_variables(fold_shuffle_variables(vars)) with
DCFAYolo(cfg, fold_shuffle=True, pair_backbones=True); eval-graph only.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from dcfa_yolo_tpu.models.blocks import (ChannelAttention, ConvMaxpool,
                                         ShuffleNetV2Block)
from dcfa_yolo_tpu.ops.conv import ConvBnAct
from dcfa_yolo_tpu.ops.pool import max_pool_same


# ---------------------------------------------------------------------------
# Layout algebra: every paired tensor is alternating equal modality blocks.
# ---------------------------------------------------------------------------

def pair_layout(c: int, n_blocks: int) -> Tuple[np.ndarray, np.ndarray]:
    """Describe the paired layout with n_blocks alternating modality blocks
    over width 2c.  Returns (mod, ch): for paired position p, mod[p] ∈ {0,1}
    (0=rgb, 1=nir) and ch[p] = the per-modality channel index it carries.

    n_blocks=2 → [R(0:c) | N(0:c)] (blocked); n_blocks=4 →
    [R(0:c/2) | N(0:c/2) | R(c/2:c) | N(c/2:c)] (the ShuffleNetV2 split
    layout); n_blocks=8 → the SPPF 4-way concat of blocked pairs.
    """
    assert (2 * c) % n_blocks == 0, (c, n_blocks)
    bl = (2 * c) // n_blocks
    p = np.arange(2 * c)
    b, j = p // bl, p % bl
    return (b % 2).astype(np.int64), ((b // 2) * bl + j).astype(np.int64)


def _pair_dense(kr, kn, nb_in: int, nb_out: int):
    """Two HWIO kernels (kh,kw,ci,co) → one block-diagonal (kh,kw,2ci,2co)
    matching the given input/output layouts."""
    kh, kw, ci, co = kr.shape
    mi, chi = pair_layout(ci, nb_in)
    mo, cho = pair_layout(co, nb_out)
    out = jnp.zeros((kh, kw, 2 * ci, 2 * co), kr.dtype)
    for mod, k in ((0, kr), (1, kn)):
        rows = np.where(mi == mod)[0]
        cols = np.where(mo == mod)[0]
        out = out.at[:, :, rows[:, None], cols[None, :]].set(
            k[:, :, chi[rows][:, None], cho[cols][None, :]])
    return out


def _pair_vec(vr, vn, nb: int):
    """Per-channel vectors (C,) → paired (2C,) in the given layout."""
    mod, ch = pair_layout(vr.shape[0], nb)
    return jnp.where(jnp.asarray(mod) == 0, jnp.asarray(vr)[ch],
                     jnp.asarray(vn)[ch])


def _pair_dw(kr, kn, nb: int):
    """Depthwise HWIO kernels (kh,kw,1,C) → (kh,kw,1,2C)."""
    mod, ch = pair_layout(kr.shape[-1], nb)
    sel = jnp.asarray(mod).reshape(1, 1, 1, -1) == 0
    return jnp.where(sel, jnp.asarray(kr)[..., ch], jnp.asarray(kn)[..., ch])


def _pair_spatial(kr, kn):
    """SpatialAttention 7x7 kernels (k,k,2,1) ×2 → (k,k,4,2): per-modality
    stats arrive as [avgR, maxR, avgN, maxN] (PairedSpatialAttention)."""
    kh, kw = kr.shape[:2]
    out = jnp.zeros((kh, kw, 4, 2), kr.dtype)
    out = out.at[:, :, 0:2, 0:1].set(jnp.asarray(kr))
    out = out.at[:, :, 2:4, 1:2].set(jnp.asarray(kn))
    return out


# ---------------------------------------------------------------------------
# Paired modules (eval graph only).
# ---------------------------------------------------------------------------

class PairedSpatialAttention(nn.Module):
    """Per-modality spatial gate over a paired tensor (`nets/yolo_mul.py:76-90`
    semantics per modality): segment mean/max per block → one block-diagonal
    kxk conv → (B,H,W,2) sigmoid gates, one per modality."""

    n_blocks: int
    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, cc = x.shape
        nb = self.n_blocks
        v = x.reshape(b, h, w, nb, cc // nb)
        m = jnp.mean(v, axis=-1)   # (B,H,W,nb) block means
        mx = jnp.max(v, axis=-1)   # block maxes
        # modality of block i is i % 2; equal block sizes → mean of block
        # means is the modality mean (FP order aside), max of maxes is exact
        y = jnp.stack([jnp.mean(m[..., 0::2], axis=-1),
                       jnp.max(mx[..., 0::2], axis=-1),
                       jnp.mean(m[..., 1::2], axis=-1),
                       jnp.max(mx[..., 1::2], axis=-1)], axis=-1)
        pad = 3 if self.kernel_size == 7 else 1
        y = nn.Conv(2, (self.kernel_size, self.kernel_size),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(y)
        return nn.sigmoid(y)


class PairedCBAM(nn.Module):
    """CBAM over a paired tensor: channel attention is per-channel (the
    standard module works unchanged on block-diagonal MLP weights); spatial
    attention gates each modality's blocks by its own (H,W) map."""

    ratio: int = 8
    n_blocks: int = 2
    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x * ChannelAttention(self.ratio, dtype=self.dtype,
                                 name="channelattention")(x)
        g = PairedSpatialAttention(self.n_blocks, self.kernel_size,
                                   dtype=self.dtype, name="spatialattention")(x)
        b, h, w, cc = x.shape
        nb = self.n_blocks
        gb = g[..., jnp.asarray(np.arange(nb) % 2)]           # (B,H,W,nb)
        v = x.reshape(b, h, w, nb, cc // nb) * gb[..., None]
        return v.reshape(b, h, w, cc)


class PairedSPPFCBAM(nn.Module):
    """SPPF-CBAM (`nets/yolo_mul.py:10-32`) over the paired stream.  The inner
    CBAMs keep the reference's ratio=c_ collapse per modality: per-modality
    hidden width 1 → paired hidden width 2 (ratio = paired_c_ // 2)."""

    features: int          # paired output width (2 × per-modality features)
    pool_kernel: int = 5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = x.shape[-1] // 2  # paired c_ (2 × the per-modality c_)
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        cb = dict(ratio=c_ // 2, n_blocks=2, dtype=self.dtype)
        x = ConvBnAct(c_, 1, 1, name="cv1", **kw)(x, train=train)
        x = PairedCBAM(name="cbam1", **cb)(x)
        y1 = max_pool_same(x, self.pool_kernel, 1)
        y1 = PairedCBAM(name="cbam2", **cb)(y1)
        y2 = max_pool_same(y1, self.pool_kernel, 1)
        y2 = PairedCBAM(name="cbam3", **cb)(y2)
        y3 = max_pool_same(y2, self.pool_kernel, 1)
        y3 = PairedCBAM(name="cbam4", **cb)(y3)
        out = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBnAct(self.features, 1, 1, name="cv2", **kw)(out, train=train)


class PairedBackbone(nn.Module):
    """Both backbones (`nets/yolo_mul.py:252-308` ×2) as one doubled-channel
    stream.  Same submodule names as `models.backbone.Backbone` so
    `pair_backbone_variables` is a name-parallel walk.  The ShuffleNetV2
    blocks are the STANDARD module: in the alternating-block layout its
    midpoint split/concat are exactly the per-modality split/concat."""

    base_channels: int     # per-modality (the paired stream carries 2×)
    deep_channels: int     # per-modality
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 stem_out: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        bc2, deep2 = 2 * self.base_channels, 2 * self.deep_channels
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        skw = dict(skip_shuffle=True, **kw)

        if stem_out is not None:
            x = stem_out.astype(self.dtype)
        else:
            x = ConvMaxpool(bc2, name="stem", **kw)(x, train=train)

        x = ConvBnAct(bc2 * 2, 3, 2, name="dark2_conv", **kw)(x, train=train)
        x = ShuffleNetV2Block(bc2 * 2, stride=1, name="dark2_shuffle", **skw)(x, train=train)

        x = ConvBnAct(bc2 * 4, 3, 2, name="dark3_conv", **kw)(x, train=train)
        x = ShuffleNetV2Block(bc2 * 4, stride=1, name="dark3_shuffle", **skw)(x, train=train)
        feat1 = x

        x = ConvBnAct(bc2 * 8, 3, 2, name="dark4_conv", **kw)(x, train=train)
        x = ShuffleNetV2Block(bc2 * 8, stride=1, name="dark4_shuffle", **skw)(x, train=train)
        feat2 = x

        x = ConvBnAct(deep2, 3, 2, name="dark5_conv", **kw)(x, train=train)
        x = ShuffleNetV2Block(deep2, stride=1, name="dark5_shuffle", **skw)(x, train=train)
        x = PairedSPPFCBAM(deep2, pool_kernel=5, name="dark5_sppf", **kw)(x, train=train)
        feat3 = x
        return feat1, feat2, feat3


class PairedConcatBiFPN(nn.Module):
    """`ConcatBiFPN` (`nets/yolo_mul.py:36-51`) consuming a paired feat: the
    per-input scalar weights become a per-channel scale on the paired tensor
    (w1 on rgb channels, w2 on nir).  Same param name/shape as ConcatBiFPN, so
    the single shared `bi_fpn/w` (`nets/yolo_mul.py:344`) is reused as-is."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, up: jnp.ndarray, feat_pair: jnp.ndarray,
                 mod_mask: np.ndarray) -> jnp.ndarray:
        w = self.param("w", nn.initializers.ones, (3,), jnp.float32)
        w = w / (jnp.sum(w) + 1e-4)
        w = w.astype(up.dtype)
        scale = jnp.where(jnp.asarray(mod_mask) == 0, w[1], w[2])
        return jnp.concatenate([w[0] * up, feat_pair * scale], axis=-1)


# ---------------------------------------------------------------------------
# The weight transform.
# ---------------------------------------------------------------------------

def _pair_bn(br, bn_, nb: int):
    return {k: _pair_vec(br[k], bn_[k], nb) for k in br}


def _pair_conv_bn(nr, nn_, nb_in: int, nb_out: int):
    """A ConvBnAct params subtree ({conv:{kernel}, bn:{scale,bias}})."""
    out = {"conv": {"kernel": _pair_dense(nr["conv"]["kernel"],
                                          nn_["conv"]["kernel"],
                                          nb_in, nb_out)}}
    if "bn" in nr:
        out["bn"] = _pair_bn(nr["bn"], nn_["bn"], nb_out)
    return out


def _pair_shuffle_block(nr, nn_):
    """ShuffleNetV2Block (stride 1) params: branch convs pair at nb=2 in the
    x2-local coordinate space (the paired split renumbers contiguously)."""
    out = {
        "b2_conv1": {"kernel": _pair_dense(nr["b2_conv1"]["kernel"],
                                           nn_["b2_conv1"]["kernel"], 2, 2)},
        "b2_dwconv": {"kernel": _pair_dw(nr["b2_dwconv"]["kernel"],
                                         nn_["b2_dwconv"]["kernel"], 2),
                      "bias": _pair_vec(nr["b2_dwconv"]["bias"],
                                        nn_["b2_dwconv"]["bias"], 2)},
        "b2_conv3": {"kernel": _pair_dense(nr["b2_conv3"]["kernel"],
                                           nn_["b2_conv3"]["kernel"], 2, 2)},
    }
    for bn in ("b2_bn1", "b2_bn2", "b2_bn3"):
        out[bn] = _pair_bn(nr[bn], nn_[bn], 2)
    return out


def _pair_cbam(nr, nn_, nb: int):
    """CBAM params: fc1 rows in the tap layout → hidden blocked (nb=2); fc2
    the reverse; spatial conv block-diagonal over per-modality stats."""
    ca_r, ca_n = nr["channelattention"], nn_["channelattention"]
    return {
        "channelattention": {
            "fc1": {"kernel": _pair_dense(ca_r["fc1"]["kernel"],
                                          ca_n["fc1"]["kernel"], nb, 2)},
            "fc2": {"kernel": _pair_dense(ca_r["fc2"]["kernel"],
                                          ca_n["fc2"]["kernel"], 2, nb)},
        },
        "spatialattention": {
            "conv1": {"kernel": _pair_spatial(
                nr["spatialattention"]["conv1"]["kernel"],
                nn_["spatialattention"]["conv1"]["kernel"])},
        },
    }


def pair_backbone_variables(variables):
    """Build the paired-stream variables from fold_shuffle-folded ones.

    Consumes `backbone_rgb`/`backbone_nir`/`cbam_{rgb,nir}_feat{1,2,3}` and
    emits `backbone_pair`/`cbam_pair_feat{1,2,3}`; additionally interleaves
    the input-channel rows of the neck's `conv3_for_upsample{1,2}.cv1` (their
    concat input changes from [up | feat_rgb | feat_nir] to [up | paired
    4-block]).  `conv3_for_downsample2.cv1` is untouched: the paired feat3 is
    modality-blocked, which is exactly the [down | rgb | nir] order it already
    consumes.  Works on train-template or deploy-fused folded variables.
    """
    import flax

    var_dict = (flax.core.unfreeze(variables)
                if hasattr(variables, "unfreeze") else dict(variables))
    params = {k: v for k, v in var_dict["params"].items()}
    stats = {k: v for k, v in var_dict.get("batch_stats", {}).items()}

    pr, pn = params.pop("backbone_rgb"), params.pop("backbone_nir")
    sr, sn = stats.pop("backbone_rgb", {}), stats.pop("backbone_nir", {})

    bp, bs = {}, {}
    # stem: blocked in (raw rgb|nir channels) and out
    bp["stem"] = {"conv": {"kernel": _pair_dense(
        pr["stem"]["conv"]["kernel"], pn["stem"]["conv"]["kernel"], 2, 2)},
        "bn": _pair_bn(pr["stem"]["bn"], pn["stem"]["bn"], 2)}
    bs["stem"] = {"bn": _pair_bn(sr["stem"]["bn"], sn["stem"]["bn"], 2)}

    nb_in = 2  # stem output is blocked; every later dark consumes 4-block
    for dark in ("dark2", "dark3", "dark4", "dark5"):
        conv = f"{dark}_conv"
        bp[conv] = _pair_conv_bn(pr[conv], pn[conv], nb_in, 4)
        bs[conv] = {"bn": _pair_bn(sr[conv]["bn"], sn[conv]["bn"], 4)}
        shf = f"{dark}_shuffle"
        bp[shf] = _pair_shuffle_block(pr[shf], pn[shf])
        bs[shf] = {bn: _pair_bn(sr[shf][bn], sn[shf][bn], 2)
                   for bn in ("b2_bn1", "b2_bn2", "b2_bn3")}
        nb_in = 4

    sppf_r, sppf_n = pr["dark5_sppf"], pn["dark5_sppf"]
    sppf = {"cv1": _pair_conv_bn(sppf_r["cv1"], sppf_n["cv1"], 4, 2),
            "cv2": _pair_conv_bn(sppf_r["cv2"], sppf_n["cv2"], 8, 2)}
    for cb in ("cbam1", "cbam2", "cbam3", "cbam4"):
        sppf[cb] = _pair_cbam(sppf_r[cb], sppf_n[cb], 2)
    bp["dark5_sppf"] = sppf
    bs["dark5_sppf"] = {
        "cv1": {"bn": _pair_bn(sr["dark5_sppf"]["cv1"]["bn"],
                               sn["dark5_sppf"]["cv1"]["bn"], 2)},
        "cv2": {"bn": _pair_bn(sr["dark5_sppf"]["cv2"]["bn"],
                               sn["dark5_sppf"]["cv2"]["bn"], 2)},
    }
    params["backbone_pair"] = bp
    if sr:
        stats["backbone_pair"] = bs

    # tap CBAMs: feat1/feat2 arrive in the shuffle-block 4-block layout,
    # feat3 (post-SPPF cv2) is modality-blocked
    for tap, nb in (("feat1", 4), ("feat2", 4), ("feat3", 2)):
        cr = params.pop(f"cbam_rgb_{tap}")
        cn = params.pop(f"cbam_nir_{tap}")
        params[f"cbam_pair_{tap}"] = _pair_cbam(cr, cn, nb)

    # neck cv1 rows: [up | feat_rgb | feat_nir] → [up | paired 4-block]
    for neck, featc in (("conv3_for_upsample2",
                         bp["dark4_conv"]["conv"]["kernel"].shape[2] // 2),
                        ("conv3_for_upsample1",
                         bp["dark5_conv"]["conv"]["kernel"].shape[2] // 2)):
        node = dict(params[neck])
        cv1 = dict(node["cv1"])
        conv = dict(cv1["conv"])
        k = conv["kernel"]
        pc = k.shape[2] - 2 * featc
        mod, ch = pair_layout(featc, 4)
        rows = np.concatenate([np.arange(pc), pc + mod * featc + ch])
        conv["kernel"] = jnp.take(k, jnp.asarray(rows), axis=2)
        cv1["conv"] = conv
        node["cv1"] = cv1
        params[neck] = node

    out = dict(var_dict)
    out["params"] = params
    if "batch_stats" in var_dict or stats:
        out["batch_stats"] = stats
    return out
