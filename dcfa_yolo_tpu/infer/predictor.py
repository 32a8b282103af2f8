"""User-facing inference facade — the `YOLO` class of the reference
(`yolo_mul.py:16-257`) rebuilt around the single fused jit pipeline.

API parity: `detect_image`, `get_fps` (reference `get_FPS`), `detect_heatmap`,
`get_map_txt`.  The whole compute path (letterbox, forward, decode, NMS) runs
on device; only PIL drawing and file IO stay on host.
"""

from __future__ import annotations

import colorsys
import os
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig, PredictConfig
from dcfa_yolo_tpu.infer.pipeline import detect_batch_jit
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model


def get_classes(classes_path: str) -> Tuple[List[str], int]:
    """Read class names, one per line (`utils/utils.py:42-46`)."""
    with open(classes_path, encoding="utf-8") as f:
        names = [c.strip() for c in f.readlines()]
    return names, len(names)


def pil_to_rgb_array(image) -> np.ndarray:
    """PIL image → (H, W, 3) uint8, converting non-RGB modes
    (`cvtColor`, `utils/utils.py:14-19`)."""
    arr = np.asarray(image)
    if arr.ndim == 3 and arr.shape[2] == 3:
        return arr
    return np.asarray(image.convert("RGB"))


class YOLOPredictor:
    """Detection facade over a compiled end-to-end pipeline.

    Unlike the reference facade (which mutates class-level defaults,
    `yolo_mul.py:39`), configuration here is per-instance and immutable.
    """

    def __init__(
        self,
        model_path: Optional[str] = None,
        classes_path: Optional[str] = None,
        class_names: Optional[Sequence[str]] = None,
        input_shape: Tuple[int, int] = (640, 640),
        phi: str = "n",
        confidence: float = 0.5,
        nms_iou: float = 0.3,
        letterbox_image: bool = True,
        max_det: int = 300,
        pre_nms_topk: int = 1024,
        compute_dtype: str = "float32",
        variables=None,
        deploy: bool = False,
        nms_backend: str = "auto",
        stem_backend: str = "auto",
        fold_shuffle: bool = False,
        pair_backbones: bool = False,
        split_neck_concats: bool = False,
        cast_weights: bool = False,
    ):
        if class_names is None:
            if classes_path is None:
                raise ValueError("provide classes_path or class_names")
            class_names, _ = get_classes(classes_path)
        self.class_names = list(class_names)
        self.num_classes = len(self.class_names)
        self.confidence = confidence
        self.nms_iou = nms_iou
        self.letterbox_image = letterbox_image
        self.max_det = max_det
        self.pre_nms_topk = pre_nms_topk
        # Cap-binding counters (the reference NMS is uncapped,
        # `utils/utils_bbox.py:106-149`; these make the fixed-shape caps'
        # protocol deviation observable — get_map.py fails loud on them)
        self.cap_stats = dict(images=0, topk_bound=0, max_det_saturated=0,
                              max_candidates=0)
        # 'xla' (fori-loop) or 'pallas' (VMEM-resident TPU kernel); identical
        # keep semantics, verified on-chip (tools/perf_breakdown.py)
        self.nms_backend = nms_backend
        # 'xla' or 'pallas' (fused conv+BN+ReLU+maxpool stem kernel,
        # ops/pallas_stem.py); 'auto' is resolved by the pipeline
        self.stem_backend = stem_backend

        if pair_backbones and not fold_shuffle:
            raise ValueError("pair_backbones requires fold_shuffle=True")
        self.cfg = ModelConfig(
            num_classes=self.num_classes, phi=phi,
            input_shape=tuple(input_shape), compute_dtype=compute_dtype)
        self.model = DCFAYolo(self.cfg, deploy=deploy, fold_shuffle=fold_shuffle,
                              pair_backbones=pair_backbones,
                              split_neck_concats=split_neck_concats)
        if variables is not None:
            # caller-supplied variables must match the chosen graph (deploy
            # callers pass the output of deploy_variables; fold_shuffle callers
            # the output of fold_shuffle_variables)
            self.variables = variables
        else:
            # checkpoints live in the TRAIN-graph key space (the reference
            # never saves fused weights — switch_to_deploy is dormant,
            # SURVEY §2.1), so always build/load the train template and
            # re-parameterize afterwards when serving the deploy graph
            _, template = init_model(self.cfg, jax.random.PRNGKey(0))
            if model_path:
                from dcfa_yolo_tpu.utils.checkpoint import load_variables

                template = load_variables(model_path, template)
            if deploy:
                from dcfa_yolo_tpu.models.reparam import deploy_variables

                template = jax.jit(deploy_variables)(template)
            if fold_shuffle:
                from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables

                template = jax.jit(fold_shuffle_variables)(template)
            if pair_backbones:
                from dcfa_yolo_tpu.models.pairing import pair_backbone_variables

                template = jax.jit(pair_backbone_variables)(template)
            if cast_weights and compute_dtype != "float32":
                # bit-identical (convs cast kernels to compute_dtype at apply
                # time anyway, tests/test_cast_weights.py) and halves the
                # upload, but OFF by default: deviceless v5e attribution
                # measured bf16 kernel layouts padding small convs to MORE
                # total bytes than f32 (b1 785.1 -> 796.9 MB/pair — same
                # pathology as the int8 probe, tools/int8_conv_probe.py)
                from dcfa_yolo_tpu.models.reparam import cast_conv_kernels

                template = jax.jit(lambda v: cast_conv_kernels(
                    v, jnp.dtype(compute_dtype)))(template)
            self.variables = template

        hsv = [(x / self.num_classes, 1.0, 1.0) for x in range(self.num_classes)]
        self.colors = [tuple(int(c * 255) for c in colorsys.hsv_to_rgb(*t)) for t in hsv]

    # ------------------------------------------------------------------
    def _run(self, rgb_arr: np.ndarray, nir_arr: np.ndarray,
             confidence: Optional[float] = None):
        """Device pipeline on one image pair; returns host numpy results."""
        image_hw = np.array([rgb_arr.shape[:2]], dtype=np.float32)
        res = detect_batch_jit(
            self.model, self.variables,
            jnp.asarray(rgb_arr[None]), jnp.asarray(nir_arr[None]), image_hw,
            conf_thres=self.confidence if confidence is None else confidence,
            iou_thres=self.nms_iou, letterbox=self.letterbox_image,
            max_det=self.max_det, pre_nms_topk=self.pre_nms_topk,
            nms_backend=self.nms_backend, stem_backend=self.stem_backend)
        res = jax.tree_util.tree_map(np.asarray, res)
        self._note_caps(res)
        return res

    def _note_caps(self, res) -> None:
        """Accumulate fixed-cap binding counters from one host-side result."""
        nc = res.n_candidates
        if nc is None:
            return
        self.cap_stats["images"] += int(len(nc))
        self.cap_stats["topk_bound"] += int((nc > self.pre_nms_topk).sum())
        self.cap_stats["max_det_saturated"] += int(
            (res.valid.sum(-1) >= self.max_det).sum())
        self.cap_stats["max_candidates"] = max(
            self.cap_stats["max_candidates"], int(nc.max()))

    def detect(self, image_rgb, image_nir, confidence: Optional[float] = None):
        """Detection as arrays: (boxes_yxyx_px, scores, class_ids) for one pair."""
        rgb = pil_to_rgb_array(image_rgb)
        nir = pil_to_rgb_array(image_nir)
        res = self._run(rgb, nir, confidence)
        n = int(res.valid[0].sum())
        return res.boxes[0][:n], res.scores[0][:n], res.classes[0][:n]

    def detect_batch(self, rgb_images, nir_images,
                     confidence: Optional[float] = None):
        """Batched detection over same-sized image pairs — one device dispatch
        for the whole batch (the throughput path; `detect` is the per-image
        convenience API).  rgb/nir: lists of PIL images or an (B, H, W, 3)
        uint8 array.  Returns a list of (boxes_yxyx_px, scores, class_ids)."""
        rgb = np.stack([pil_to_rgb_array(i) for i in rgb_images]) \
            if not isinstance(rgb_images, np.ndarray) else rgb_images
        nir = np.stack([pil_to_rgb_array(i) for i in nir_images]) \
            if not isinstance(nir_images, np.ndarray) else nir_images
        image_hw = np.tile(np.asarray(rgb.shape[1:3], np.float32), (len(rgb), 1))
        res = detect_batch_jit(
            self.model, self.variables, jnp.asarray(rgb), jnp.asarray(nir),
            image_hw,
            conf_thres=self.confidence if confidence is None else confidence,
            iou_thres=self.nms_iou, letterbox=self.letterbox_image,
            max_det=self.max_det, pre_nms_topk=self.pre_nms_topk,
            nms_backend=self.nms_backend, stem_backend=self.stem_backend)
        res = jax.tree_util.tree_map(np.asarray, res)
        self._note_caps(res)
        out = []
        for b in range(len(rgb)):
            n = int(res.valid[b].sum())
            out.append((res.boxes[b][:n], res.scores[b][:n], res.classes[b][:n]))
        return out

    # ------------------------------------------------------------------
    def detect_image(self, image_rgb, image_nir):
        """Draw detections on the RGB image; returns the annotated PIL image
        (`yolo_mul.py:64-130`)."""
        boxes, scores, labels = self.detect(image_rgb, image_nir)
        return self.draw_detections(image_rgb, boxes, scores, labels)

    def draw_detections(self, image_rgb, boxes, scores, labels):
        """Reference-style box/label drawing (`yolo_mul.py:95-129`); split
        from detect_image so batched callers (predict.py --batch-size) can
        draw results produced by detect_batch."""
        from PIL import ImageDraw, ImageFont

        if len(boxes) == 0:
            return image_rgb

        try:
            font = ImageFont.truetype(
                font="model_data/simhei.ttf",
                size=int(np.floor(3e-2 * image_rgb.size[1] + 0.5)))
        except OSError:
            font = ImageFont.load_default()
        thickness = int(max(
            (image_rgb.size[0] + image_rgb.size[1]) // np.mean(self.cfg.input_shape), 1))

        draw_img = image_rgb
        for box, score, c in zip(boxes, scores, labels):
            top, left, bottom, right = box
            top = max(0, int(np.floor(top)))
            left = max(0, int(np.floor(left)))
            bottom = min(image_rgb.size[1], int(np.floor(bottom)))
            right = min(image_rgb.size[0], int(np.floor(right)))
            label = f"{self.class_names[int(c)]} {score:.2f}"
            draw = ImageDraw.Draw(draw_img)
            tl, tt, tr, tb = draw.textbbox((0, 0), label, font=font)
            label_size = (tr - tl, tb - tt)
            origin = (left, top - label_size[1]) if top - label_size[1] >= 0 else (left, top + 1)
            for i in range(thickness):
                if left + i > right - i or top + i > bottom - i:
                    break  # box smaller than the outline inset (tiny dets)
                draw.rectangle([left + i, top + i, right - i, bottom - i],
                               outline=self.colors[int(c)])
            draw.rectangle([origin, (origin[0] + label_size[0], origin[1] + label_size[1])],
                           fill=self.colors[int(c)])
            draw.text(origin, label, fill=(0, 0, 0), font=font)
            del draw
        return draw_img

    # ------------------------------------------------------------------
    def get_fps(self, image_rgb, image_nir, test_interval: int = 100) -> float:
        """Mean seconds per full pipeline iteration (`yolo_mul.py:132-166`)."""
        rgb = pil_to_rgb_array(image_rgb)
        nir = pil_to_rgb_array(image_nir)
        self._run(rgb, nir)  # warm-up/compile
        t1 = time.time()
        for _ in range(test_interval):
            # the exact configured pipeline (incl. nms_backend) — timing a
            # different static-arg combination would measure the wrong
            # program and trigger a fresh compile
            res = self._run(rgb, nir)
            jax.block_until_ready(res)
        return (time.time() - t1) / test_interval

    # ------------------------------------------------------------------
    def detect_heatmap(self, image_rgb, image_nir, heatmap_save_path: str) -> None:
        """Class-score heatmap overlay (`yolo_mul.py:168-211`)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from PIL import Image

        rgb = pil_to_rgb_array(image_rgb)
        nir = pil_to_rgb_array(image_nir)
        from dcfa_yolo_tpu.infer.pipeline import heatmap_batch_jit

        # one compiled program (letterbox + forward + score maps): eager
        # dispatch here costs an RPC per op on remote platforms
        maps = heatmap_batch_jit(self.model, self.variables,
                                 jnp.asarray(rgb[None]), jnp.asarray(nir[None]))

        plt.imshow(image_rgb, alpha=1)
        plt.axis("off")
        mask = np.zeros((image_rgb.size[1], image_rgb.size[0]))
        for m in maps:
            score = np.asarray(m[0])
            score_img = Image.fromarray((score * 255).astype(np.uint8)).resize(
                (image_rgb.size[0], image_rgb.size[1]), Image.BILINEAR)
            mask = np.maximum(mask, np.asarray(score_img))
        plt.imshow(mask, alpha=0.5, interpolation="nearest", cmap="jet")
        plt.axis("off")
        plt.subplots_adjust(top=1, bottom=0, right=1, left=0, hspace=0, wspace=0)
        plt.margins(0, 0)
        os.makedirs(os.path.dirname(os.path.abspath(heatmap_save_path)), exist_ok=True)
        plt.savefig(heatmap_save_path, dpi=200, bbox_inches="tight", pad_inches=-0.1)
        plt.close()
        print("Save to the " + heatmap_save_path)

    # ------------------------------------------------------------------
    def get_map_txt(self, image_id: str, image_rgb, image_nir,
                    class_names: Sequence[str], map_out_path: str,
                    confidence: Optional[float] = None) -> None:
        """Write `detection-results/{id}.txt` lines `cls score x1 y1 x2 y2`
        (`yolo_mul.py:213-257`)."""
        boxes, scores, labels = self.detect(image_rgb, image_nir, confidence=confidence)
        self._write_map_txt(image_id, boxes, scores, labels, class_names,
                            map_out_path)

    def get_map_txt_batch(self, image_ids: Sequence[str], rgb_images,
                          nir_images, class_names: Sequence[str],
                          map_out_path: str,
                          confidence: Optional[float] = None) -> None:
        """Batched `get_map_txt`: one device dispatch for a stack of
        SAME-SIZED pairs, identical txt outputs (the eval protocol is about
        conf/NMS parameters and the txt format, not the dispatch shape).

        Byte-identity vs the per-image protocol holds at a FIXED stem
        backend.  Under stem_backend='auto' a full-128-lane batch resolves
        the v5 stem whose letterbox canvas can differ from the per-image
        path by 1 uint8 LSB on ~7e-6 of pixels (FP-sum-order at PIL-round
        ties, ops/resize.letterbox_batch_cf5) — borderline detections may
        shift imperceptibly (mAP-invisible).  Pass stem_backend='pallas_e'
        (or 'xla') for strict cross-dispatch-shape byte parity."""
        dets = self.detect_batch(rgb_images, nir_images, confidence=confidence)
        for image_id, (boxes, scores, labels) in zip(image_ids, dets):
            self._write_map_txt(image_id, boxes, scores, labels, class_names,
                                map_out_path)

    def _write_map_txt(self, image_id, boxes, scores, labels, class_names,
                       map_out_path) -> None:
        os.makedirs(os.path.join(map_out_path, "detection-results"), exist_ok=True)
        with open(os.path.join(map_out_path, "detection-results", image_id + ".txt"),
                  "w", encoding="utf-8") as f:
            for box, score, c in zip(boxes, scores, labels):
                name = self.class_names[int(c)]
                if name not in class_names:
                    continue
                top, left, bottom, right = box
                f.write(f"{name} {str(score)[:6]} {int(left)} {int(top)} "
                        f"{int(right)} {int(bottom)}\n")
