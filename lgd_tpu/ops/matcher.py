"""Vectorized anchor<->GT matcher (detectron2 ``Matcher`` semantics).

Used by RetinaNet (IOU_THRESHOLDS [0.4, 0.5], IOU_LABELS [0, -1, 1],
allow_low_quality_matches=True), RPN and ROI heads (SURVEY.md §2.2).
Operates on a padded IoU matrix where invalid GT columns are masked to -1
so they can never win an argmax against a real GT.
"""

from __future__ import annotations

import jax.numpy as jnp


class Matcher:
    def __init__(self, thresholds, labels, allow_low_quality_matches: bool = False):
        thresholds = list(thresholds)
        assert all(low <= high for low, high in zip(thresholds[:-1], thresholds[1:]))
        assert len(labels) == len(thresholds) + 1
        self.thresholds = [-float("inf")] + thresholds + [float("inf")]
        self.labels = list(labels)
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(self, match_quality_matrix, gt_valid):
        """
        Args:
            match_quality_matrix: (..., M, R) IoU of M (padded) GT rows vs
                R predicted elements (anchors / proposals).
            gt_valid: (..., M) bool.
        Returns:
            matches: (..., R) int32 index into the M GT rows (argmax; 0 when
                there is no valid GT — callers must gate on labels).
            match_labels: (..., R) int8 in {-1, 0, 1} per detectron2 labels.
        """
        neg = jnp.full_like(match_quality_matrix, -1.0)
        quality = jnp.where(gt_valid[..., :, None], match_quality_matrix, neg)

        matched_vals = jnp.max(quality, axis=-2)
        matches = jnp.argmax(quality, axis=-2).astype(jnp.int32)

        match_labels = jnp.zeros(matched_vals.shape, jnp.int8)
        for label, low, high in zip(
            self.labels, self.thresholds[:-1], self.thresholds[1:]
        ):
            in_range = (matched_vals >= low) & (matched_vals < high)
            match_labels = jnp.where(in_range, jnp.int8(label), match_labels)

        if self.allow_low_quality_matches:
            # For each valid GT, the predictions achieving its max quality are
            # promoted to foreground (keeping their own argmax assignment) —
            # detectron2 set_low_quality_matches_.
            highest_per_gt = jnp.max(quality, axis=-1, keepdims=True)  # (..., M, 1)
            is_best = (quality >= highest_per_gt) & (quality > 0) & gt_valid[
                ..., :, None
            ]
            promote = jnp.any(is_best, axis=-2)  # (..., R)
            match_labels = jnp.where(promote, jnp.int8(1), match_labels)

        # no-valid-GT edge case: all matched_vals are -1 -> label 0 already.
        return matches, match_labels
