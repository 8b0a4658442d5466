"""Distillator meta-architectures: student + DynamicTeacher + adapter.

Re-implements the orchestration of the reference BaseDistillator
(models/base_distillator.py:11-77) and DistillatorRetinaNet
(models/distillator.py:23-114) as a single Flax module whose
``train_forward`` computes the full LGD loss dict inside one jitted step:

    student fwd -> student losses
    teacher fwd (from GT + student FPN feats) -> teacher feats scored by the
        *student's own head* + student loss fn, keys suffixed '.tea'
    distill loss: adapter(stu) & tea -> InstanceNorm -> lambda * MSE

Detach rules (base_distillator.py:52-55): teacher features are always
detached in the distill loss; student features are detached iff distilling
is OFF. The OFF/ON phase flag is a *traced* scalar so one compiled program
serves all phases: x_eff = stop_grad(x) + flag * (x - stop_grad(x)).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.cfg import FrozenCfg
from ..ops.normalization import instance_norm_2d
from ..structures import BatchedInstances
from .heads.atss import ATSSCT, atss_ground_truth, atss_inference, atss_losses
from .heads.fcos import (
    FCOSCT,
    build_shifts,
    fcos_ground_truth,
    fcos_inference,
    fcos_losses,
)
from .heads.poto import (
    POTOCT,
    poto_ground_truth,
    poto_inference,
    poto_losses,
)
from .heads.retinanet import (
    RetinaNetCT,
    build_anchors,
    label_anchors,
    retinanet_inference,
    retinanet_losses,
)
from .lgd.adapters import build_adapter
from .lgd.dynamic_teacher import DynamicTeacher
from .rcnn.rcnn import RCNNCT

META_ARCHS = {}


def register_meta_arch(name):
    def deco(cls):
        META_ARCHS[name] = cls
        return cls

    return deco


def build_model(cfg, dtype=jnp.bfloat16):
    """META_ARCH_REGISTRY equivalent (reference train.py:262 /
    distillator.py registrations)."""
    name = cfg.MODEL.META_ARCHITECTURE
    if name not in META_ARCHS:
        raise KeyError(f"Unknown META_ARCHITECTURE {name!r}; have {sorted(META_ARCHS)}")
    return META_ARCHS[name](cfg=FrozenCfg(cfg), dtype=dtype)


def _gate_gradient(x, flag):
    """Value-preserving gradient gate: d/dx = flag (0.0 or 1.0 traced)."""
    sg = jax.lax.stop_gradient(x)
    return sg + flag * (x - sg)


class BaseDistillator(nn.Module):
    """Common construction + the distill loss (base_distillator.py:14-64)."""

    cfg: Any
    dtype: Any = jnp.bfloat16

    def _setup_common(self):
        cfg = self.cfg
        t = cfg.MODEL.DISTILLATOR.TEACHER
        self.teacher = DynamicTeacher(
            num_classes=cfg.NUM_CLASSES,
            channels=cfg.MODEL.FPN.OUT_CHANNELS,
            num_heads=t.NR_TRANSFORMER_HEADS,
            interact_pattern=t.INTERACT_PATTERN,
            add_context_box=t.ADD_CONTEXT_BOX,
            detach_appearance_embed=t.DETACH_APPEARANCE_EMBED,
            use_seg_map=cfg.MODEL.DISTILLATOR.LABEL_ENCODER.LOAD_LABELMAP,
            attn_impl=cfg.TPU.ATTENTION_IMPL,
            dtype=jnp.float32,
            name="teacher",
        )
        self.adapter = build_adapter(cfg, dtype=self.dtype)
        self.distill_lambda = float(cfg.MODEL.DISTILLATOR.LAMBDA)

    def _predict_pair(self, feats, tea_feats):
        """Student head over the student and teacher feature pyramids
        (reference: student.predict in forward_student and again in
        forward_teacher, distillator.py:88,107).

        Measured on the v5e chip (flagship, batch 16, 640^2): a single
        batch-stacked 2B pass compiles ~11% faster but runs 4% SLOWER
        (160.2 vs 154.1 ms/step) — the 5 per-level concats are pure HBM
        copies that outweigh the dispatch savings — so the two passes are
        kept separate."""
        a = self.student.predict(self._head_features(feats))
        b = self.student.predict(self._head_features(tea_feats))
        return a, b

    def distill_loss(self, stu_feats: Dict[str, jax.Array],
                     tea_feats: Dict[str, jax.Array], distill_flag):
        """lambda * MSE over InstanceNorm'd, adapter-mapped features
        (base_distillator.py:34-64). MSE is the mean over ALL elements of the
        per-image flattened concat, matching F.mse_loss."""
        keys = sorted(set(stu_feats) & set(tea_feats))
        total_se = 0.0
        total_count = 0
        for k in keys:
            s = _gate_gradient(stu_feats[k].astype(jnp.float32), distill_flag)
            t = jax.lax.stop_gradient(tea_feats[k].astype(jnp.float32))
            s = self.adapter(s.astype(self.dtype)).astype(jnp.float32)
            s = instance_norm_2d(s)
            t = instance_norm_2d(t)
            total_se = total_se + jnp.sum((s - t) ** 2)
            total_count += int(s.size // s.shape[0])
        bs = stu_feats[keys[0]].shape[0]
        return self.distill_lambda * total_se / (bs * total_count)


@register_meta_arch("DistillatorRetinaNet")
class DistillatorRetinaNet(BaseDistillator):
    """reference models/distillator.py:23-114."""

    def setup(self):
        self.student = RetinaNetCT(cfg=self.cfg, dtype=self.dtype,
                                   name="student")
        self._setup_common()

    # -- pieces reused by both train and eval paths ----------------------

    def _head_features(self, feats: Dict[str, jax.Array]):
        return [feats[f] for f in self.cfg.MODEL.RETINANET.IN_FEATURES]

    def train_forward(self, images, image_sizes, gt: BatchedInstances,
                      distill_flag, loss_normalizer):
        """One full LGD training forward. Returns (loss dict incl. '.tea'
        and 'loss_distill', new loss_normalizer)."""
        cfg = self.cfg
        padded_hw = (images.shape[1], images.shape[2])
        anchors, _ = build_anchors(cfg, padded_hw)

        # student fwd; dynamic teacher from GT + student FPN feats; then the
        # student's own head scores BOTH pyramids via _predict_pair (two
        # separate passes; see its docstring for why stacking lost)
        raw, feats = self.student(images, image_sizes, train=True)
        tea_feats, _, _ = self.teacher(gt, feats, padded_hw)
        (logits, deltas), (logits_tea, deltas_tea) = self._predict_pair(
            feats, tea_feats)
        gt_labels, gt_boxes = label_anchors(cfg, anchors, gt)
        losses, loss_normalizer = retinanet_losses(
            cfg, logits, deltas, gt_labels, gt_boxes, anchors, loss_normalizer
        )
        losses_tea, loss_normalizer = retinanet_losses(
            cfg, logits_tea, deltas_tea, gt_labels, gt_boxes, anchors,
            loss_normalizer,
        )
        losses.update({k + ".tea": v for k, v in losses_tea.items()})

        losses["loss_distill"] = self.distill_loss(feats, tea_feats,
                                                   distill_flag)
        return losses, loss_normalizer

    def inference(self, images, image_sizes, gt: BatchedInstances = None,
                  eval_teacher: bool = False):
        """Eval path (distillator.py:70-86): student features, optionally
        substituted by teacher features, through the student head + NMS."""
        cfg = self.cfg
        padded_hw = (images.shape[1], images.shape[2])
        anchors, counts = build_anchors(cfg, padded_hw)
        raw, feats = self.student(images, image_sizes)
        if eval_teacher:
            assert gt is not None, "eval_teacher needs GT annotations"
            feats, _, _ = self.teacher(gt, feats, padded_hw)
        logits, deltas = self.student.predict(self._head_features(feats))
        return retinanet_inference(cfg, logits, deltas, anchors, counts,
                                   image_sizes)


@register_meta_arch("DistillatorGeneralizedRCNN")
class DistillatorGeneralizedRCNN(BaseDistillator):
    """reference models/distillator.py:117-198: the teacher loss re-runs the
    full RPN + ROI pipeline on teacher features (frcnn.py:59-76)."""

    def setup(self):
        self.student = RCNNCT(cfg=self.cfg, dtype=self.dtype, name="student")
        self._setup_common()

    def train_forward(self, images, image_sizes, gt: BatchedInstances,
                      distill_flag, loss_normalizer):
        padded_hw = (images.shape[1], images.shape[2])
        raw, feats = self.student(images, image_sizes, train=True)
        losses = self.student.predict(feats, image_sizes, gt)

        tea_feats, _, _ = self.teacher(gt, feats, padded_hw)
        losses_tea = self.student.predict(tea_feats, image_sizes, gt)
        losses.update({k + ".tea": v for k, v in losses_tea.items()})
        losses["loss_distill"] = self.distill_loss(feats, tea_feats,
                                                   distill_flag)
        return losses, loss_normalizer

    def inference(self, images, image_sizes, gt: BatchedInstances = None,
                  eval_teacher: bool = False):
        padded_hw = (images.shape[1], images.shape[2])
        raw, feats = self.student(images, image_sizes)
        if eval_teacher:
            feats, _, _ = self.teacher(gt, feats, padded_hw)
        dets, mask_probs = self.student.infer_boxes(feats, image_sizes)
        return dets if mask_probs is None else (dets, mask_probs)


class _ShiftBasedDistillator(BaseDistillator):
    """Shared plumbing for the anchor-free distillators
    (reference distillator.py:201-494): students expose predict over
    MODEL.FCOS.IN_FEATURES; GT targets are computed once and reused for the
    teacher-feature pass (the reference passes gt_targets through
    forward_teacher)."""

    def _head_features(self, feats):
        return [feats[f] for f in self.cfg.MODEL.FCOS.IN_FEATURES]


@register_meta_arch("DistillatorFCOS")
class DistillatorFCOS(_ShiftBasedDistillator):
    """reference models/distillator.py:201-297."""

    def setup(self):
        self.student = FCOSCT(cfg=self.cfg, dtype=self.dtype, name="student")
        self._setup_common()

    def train_forward(self, images, image_sizes, gt: BatchedInstances,
                      distill_flag, loss_normalizer):
        cfg = self.cfg
        padded_hw = (images.shape[1], images.shape[2])
        shifts, counts, strides, soi_lo, soi_hi = build_shifts(cfg, padded_hw)

        raw, feats = self.student(images, image_sizes, train=True)
        tea_feats, _, _ = self.teacher(gt, feats, padded_hw)
        (logits, deltas, ctr), (lt, dt, ct) = self._predict_pair(
            feats, tea_feats)
        gt_cls, gt_deltas, gt_ctr = fcos_ground_truth(
            cfg, shifts, strides, soi_lo, soi_hi, gt)
        losses = fcos_losses(cfg, gt_cls, gt_deltas, gt_ctr,
                             logits, deltas, ctr)
        losses_tea = fcos_losses(cfg, gt_cls, gt_deltas, gt_ctr, lt, dt, ct)
        losses.update({k + ".tea": v for k, v in losses_tea.items()})
        losses["loss_distill"] = self.distill_loss(feats, tea_feats,
                                                   distill_flag)
        return losses, loss_normalizer

    def inference(self, images, image_sizes, gt: BatchedInstances = None,
                  eval_teacher: bool = False):
        cfg = self.cfg
        padded_hw = (images.shape[1], images.shape[2])
        shifts, counts, *_ = build_shifts(cfg, padded_hw)
        raw, feats = self.student(images, image_sizes)
        if eval_teacher:
            feats, _, _ = self.teacher(gt, feats, padded_hw)
        logits, deltas, ctr = self.student.predict(self._head_features(feats))
        return fcos_inference(cfg, logits, deltas, ctr, shifts, counts,
                              image_sizes)


@register_meta_arch("DistillatorATSS")
class DistillatorATSS(_ShiftBasedDistillator):
    """reference models/distillator.py:397-494."""

    def setup(self):
        self.student = ATSSCT(cfg=self.cfg, dtype=self.dtype, name="student")
        self._setup_common()

    def train_forward(self, images, image_sizes, gt: BatchedInstances,
                      distill_flag, loss_normalizer):
        cfg = self.cfg
        padded_hw = (images.shape[1], images.shape[2])
        shifts, counts, strides, *_ = build_shifts(cfg, padded_hw)

        raw, feats = self.student(images, image_sizes, train=True)
        tea_feats, _, _ = self.teacher(gt, feats, padded_hw)
        (logits, deltas, ctr), (lt, dt, ct) = self._predict_pair(
            feats, tea_feats)
        gt_cls, gt_deltas, gt_ctr = atss_ground_truth(
            cfg, shifts, counts, strides, gt)
        losses = atss_losses(cfg, gt_cls, gt_deltas, gt_ctr,
                             logits, deltas, ctr)
        losses_tea = atss_losses(cfg, gt_cls, gt_deltas, gt_ctr, lt, dt, ct)
        losses.update({k + ".tea": v for k, v in losses_tea.items()})
        losses["loss_distill"] = self.distill_loss(feats, tea_feats,
                                                   distill_flag)
        return losses, loss_normalizer

    def inference(self, images, image_sizes, gt: BatchedInstances = None,
                  eval_teacher: bool = False):
        cfg = self.cfg
        padded_hw = (images.shape[1], images.shape[2])
        shifts, counts, *_ = build_shifts(cfg, padded_hw)
        raw, feats = self.student(images, image_sizes)
        if eval_teacher:
            feats, _, _ = self.teacher(gt, feats, padded_hw)
        logits, deltas, ctr = self.student.predict(self._head_features(feats))
        return atss_inference(cfg, logits, deltas, ctr, shifts, counts,
                              image_sizes)


@register_meta_arch("DistillatorPOTO")
class DistillatorPOTO(_ShiftBasedDistillator):
    """reference models/distillator.py:299-395. NOTE: like the reference
    (gt_targets computed from the *student* forward and reused for the
    teacher pass), the one-to-one assignment uses student predictions."""

    def setup(self):
        self.student = POTOCT(cfg=self.cfg, dtype=self.dtype, name="student")
        self._setup_common()

    def train_forward(self, images, image_sizes, gt: BatchedInstances,
                      distill_flag, loss_normalizer):
        cfg = self.cfg
        padded_hw = (images.shape[1], images.shape[2])
        shifts, counts, strides, *_ = build_shifts(cfg, padded_hw)

        raw, feats = self.student(images, image_sizes, train=True)
        tea_feats, _, _ = self.teacher(gt, feats, padded_hw)
        (logits, deltas), (lt, dt) = self._predict_pair(feats, tea_feats)
        gt_cls, gt_deltas = poto_ground_truth(cfg, shifts, strides, gt,
                                              logits, deltas)
        losses = poto_losses(cfg, gt_cls, gt_deltas, logits, deltas)
        losses_tea = poto_losses(cfg, gt_cls, gt_deltas, lt, dt)
        losses.update({k + ".tea": v for k, v in losses_tea.items()})
        losses["loss_distill"] = self.distill_loss(feats, tea_feats,
                                                   distill_flag)
        return losses, loss_normalizer

    def inference(self, images, image_sizes, gt: BatchedInstances = None,
                  eval_teacher: bool = False):
        cfg = self.cfg
        padded_hw = (images.shape[1], images.shape[2])
        shifts, counts, *_ = build_shifts(cfg, padded_hw)
        raw, feats = self.student(images, image_sizes)
        if eval_teacher:
            feats, _, _ = self.teacher(gt, feats, padded_hw)
        logits, deltas = self.student.predict(self._head_features(feats))
        return poto_inference(cfg, logits, deltas, shifts, counts,
                              image_sizes)
