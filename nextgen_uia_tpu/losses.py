"""Loss functions, matching reference semantics on TPU.

  - InfoNCE: /root/reference/src/losses/losses.py:10-47 (T=0.07, symmetric CE
    over the cosine-similarity matrix with diagonal labels).
  - FocalLoss(to_onehot_y=True): MONAI semantics with defaults gamma=2,
    include_background=True, sigmoid-free (softmax over logits is NOT applied —
    MONAI focal uses softmax=False default → BCE-with-logits per class), as
    instantiated at e.g. src/models/biomedclip/classification.py.
  - DiceCELoss(to_onehot_y=True, softmax=True, squared_pred=True,
    smooth_nr=1e-8, smooth_dr=1e-8): MONAI semantics, as instantiated at e.g.
    src/models/biomedclip/segmentation.py.

All losses take logits and integer labels and reduce to a scalar (f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def info_nce(image_features, text_features, temperature: float = 0.07):
    """Symmetric InfoNCE over a batch of paired embeddings [B, D]."""
    img = image_features.astype(jnp.float32)
    txt = text_features.astype(jnp.float32)
    img = img / jnp.maximum(jnp.linalg.norm(img, axis=1, keepdims=True), 1e-12)
    txt = txt / jnp.maximum(jnp.linalg.norm(txt, axis=1, keepdims=True), 1e-12)
    logits = img @ txt.T / temperature
    labels = jnp.arange(logits.shape[0])
    loss_i2t = _cross_entropy_int(logits, labels)
    loss_t2i = _cross_entropy_int(logits.T, labels)
    return (loss_i2t + loss_t2i) / 2.0


def _cross_entropy_int(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def cross_entropy(logits, labels):
    """torch.nn.CrossEntropyLoss equivalent: logits [B, C], labels [B] int."""
    return _cross_entropy_int(logits, labels)


def focal_loss(logits, labels, *, gamma: float = 2.0, num_classes: int | None = None):
    """MONAI FocalLoss(to_onehot_y=True) equivalent.

    MONAI treats each class channel as an independent binary problem with
    BCE-with-logits focal weighting: loss = mean over (B, C, ...) of
    BCE(p_c, y_c) * (1 - p_t)^gamma, p_t = p if y==1 else 1-p.
    logits: [B, C] or [B, C, H, W]; labels: [B] or [B, 1, H, W] int.
    """
    logits = logits.astype(jnp.float32)
    if num_classes is None:
        num_classes = logits.shape[1]
    onehot = _to_onehot_channels(labels, num_classes, logits.ndim)
    p = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, onehot)
    p_t = p * onehot + (1.0 - p) * (1.0 - onehot)
    return jnp.mean(ce * (1.0 - p_t) ** gamma)


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _to_onehot_channels(labels, num_classes, target_ndim):
    """labels [B] -> [B, C]; labels [B, 1, H, W] -> [B, C, H, W]."""
    labels = labels.astype(jnp.int32)
    if labels.ndim == 1:
        return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if labels.ndim == target_ndim and labels.shape[1] == 1:
        oh = jax.nn.one_hot(labels[:, 0], num_classes, dtype=jnp.float32)  # [B, H, W, C]
        return jnp.moveaxis(oh, -1, 1)
    raise ValueError(f"Unsupported label shape {labels.shape} for logits ndim {target_ndim}")


def dice_ce_loss(logits, labels, *, squared_pred: bool = True,
                 smooth_nr: float = 1e-8, smooth_dr: float = 1e-8,
                 include_background: bool = True):
    """MONAI DiceCELoss(to_onehot_y=True, softmax=True) equivalent.

    logits: [B, C, H, W]; labels: [B, 1, H, W] int. Returns dice + ce.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[1]
    onehot = _to_onehot_channels(labels, num_classes, logits.ndim)  # [B, C, H, W]
    probs = jax.nn.softmax(logits, axis=1)

    if not include_background:
        probs_d, onehot_d = probs[:, 1:], onehot[:, 1:]
    else:
        probs_d, onehot_d = probs, onehot

    reduce_axes = tuple(range(2, logits.ndim))
    intersection = jnp.sum(onehot_d * probs_d, axis=reduce_axes)
    if squared_pred:
        ground = jnp.sum(onehot_d ** 2, axis=reduce_axes)
        pred = jnp.sum(probs_d ** 2, axis=reduce_axes)
    else:
        ground = jnp.sum(onehot_d, axis=reduce_axes)
        pred = jnp.sum(probs_d, axis=reduce_axes)
    dice = 1.0 - (2.0 * intersection + smooth_nr) / (ground + pred + smooth_dr)
    dice = jnp.mean(dice)

    logp = jax.nn.log_softmax(logits, axis=1)
    ce = -jnp.mean(jnp.sum(onehot * logp, axis=1))
    return dice + ce
