"""Device-side augmentation — jittable, fixed-shape, batched.

The reference plumbs an ``augment`` flag but implements NO augmentation
(SURVEY.md §3.5: it only gates the image buffer). Mosaic/letterbox/HSV are
named in BASELINE.json's north star ("image preprocessing compiles to fused
XLA ops on device"), so they are first-class here:

* ``hsv_jitter``    — Ultralytics-style random HSV gains (RGB inputs).
* ``gray_jitter``   — brightness/contrast analog for 1-channel imagery.
* ``random_hflip``  / ``random_vflip`` — with box remapping.
* ``mosaic4``       — batched 4-image mosaic: 2Sx2S quadrant canvas,
  random SxS crop (shape-static via dynamic_slice), boxes remapped,
  clipped, and compacted back to the static max-GT capacity.
* ``mixup``         — detection mixup (YOLOX recipe): Beta-blend with a
  batch partner, union of box sets, compacted to capacity.

Everything takes/returns the standard padded batch dict and composes under
jit; ``augment_batch`` is the one-call pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugmentConfig(NamedTuple):
    hflip_p: float = 0.5
    vflip_p: float = 0.0
    mosaic_p: float = 0.0
    mixup_p: float = 0.0
    mixup_alpha: float = 8.0  # Beta(a, a) blend ratio (YOLOX recipe value)
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    color_p: float = 1.0
    min_box_size: float = 2e-3  # drop boxes smaller than this (normalized)


# ----------------------------------------------------------------- color ops


def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    diff = mx - mn + 1e-12
    h = jnp.where(
        mx == r, (g - b) / diff % 6.0, jnp.where(mx == g, (b - r) / diff + 2.0, (r - g) / diff + 4.0)
    ) / 6.0
    s = diff / (mx + 1e-12)
    return jnp.stack([h % 1.0, s, mx], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter(img: jnp.ndarray, key: jax.Array, cfg: AugmentConfig) -> jnp.ndarray:
    """Random HSV gain per image. img (B, H, W, 3) in [0, 1]."""
    B = img.shape[0]
    kh, ks, kv, kp = jax.random.split(key, 4)
    gains = jnp.stack(
        [
            jax.random.uniform(kh, (B,), minval=-cfg.hsv_h, maxval=cfg.hsv_h),
            1.0 + jax.random.uniform(ks, (B,), minval=-cfg.hsv_s, maxval=cfg.hsv_s),
            1.0 + jax.random.uniform(kv, (B,), minval=-cfg.hsv_v, maxval=cfg.hsv_v),
        ],
        axis=-1,
    )[:, None, None, :]
    hsv = _rgb_to_hsv(img)
    hsv = jnp.stack(
        [
            (hsv[..., 0] + gains[..., 0]) % 1.0,
            jnp.clip(hsv[..., 1] * gains[..., 1], 0, 1),
            jnp.clip(hsv[..., 2] * gains[..., 2], 0, 1),
        ],
        axis=-1,
    )
    out = _hsv_to_rgb(hsv)
    apply = jax.random.uniform(kp, (B, 1, 1, 1)) < cfg.color_p
    return jnp.where(apply, out, img)


def gray_jitter(img: jnp.ndarray, key: jax.Array, cfg: AugmentConfig) -> jnp.ndarray:
    """Brightness/contrast jitter for single-channel imagery."""
    B = img.shape[0]
    kb, kc, kp = jax.random.split(key, 3)
    bright = 1.0 + jax.random.uniform(kb, (B, 1, 1, 1), minval=-cfg.hsv_v, maxval=cfg.hsv_v)
    contrast = 1.0 + jax.random.uniform(kc, (B, 1, 1, 1), minval=-cfg.hsv_s / 2, maxval=cfg.hsv_s / 2)
    mean = img.mean(axis=(1, 2, 3), keepdims=True)
    out = jnp.clip((img - mean) * contrast + mean * bright, 0, 1)
    apply = jax.random.uniform(kp, (B, 1, 1, 1)) < cfg.color_p
    return jnp.where(apply, out, img)


# ------------------------------------------------------------------ geometry


def random_hflip(batch: dict, key: jax.Array, p: float) -> dict:
    B = batch["img"].shape[0]
    flip = jax.random.uniform(key, (B,)) < p
    img = jnp.where(flip[:, None, None, None], batch["img"][:, :, ::-1, :], batch["img"])
    bb = batch["gt_bboxes"]
    flipped = jnp.stack([1.0 - bb[..., 2], bb[..., 1], 1.0 - bb[..., 0], bb[..., 3]], axis=-1)
    bb = jnp.where(flip[:, None, None], flipped, bb)
    return {**batch, "img": img, "gt_bboxes": bb}


def random_vflip(batch: dict, key: jax.Array, p: float) -> dict:
    B = batch["img"].shape[0]
    flip = jax.random.uniform(key, (B,)) < p
    img = jnp.where(flip[:, None, None, None], batch["img"][:, ::-1, :, :], batch["img"])
    bb = batch["gt_bboxes"]
    flipped = jnp.stack([bb[..., 0], 1.0 - bb[..., 3], bb[..., 2], 1.0 - bb[..., 1]], axis=-1)
    bb = jnp.where(flip[:, None, None], flipped, bb)
    return {**batch, "img": img, "gt_bboxes": bb}


# -------------------------------------------------------------------- mosaic


def _compact_boxes(bboxes, labels, valid, G: int):
    """Keep up to G valid rows, stably ordered. (A,4),(A,),(A,) -> (G, ...)."""
    order = jnp.argsort(~valid, stable=True)[:G]
    v = valid[order]
    return (
        jnp.where(v[:, None], bboxes[order], 0.0),
        jnp.where(v, labels[order], 0),
        v,
    )


def mosaic4(batch: dict, key: jax.Array, p: float, min_box: float = 2e-3) -> dict:
    """Batched 4-image mosaic.

    For each output image i: partners are drawn from the batch, tiled into a
    2x2 canvas (each tile = one full image), and a random SxS window of the
    2Sx2S canvas is cropped. Equivalent to the classic YOLO mosaic with a
    fixed 0.5 scale: objects shrink 2x and up to 4 images mix.
    """
    img = jnp.asarray(batch["img"])
    bb = jnp.asarray(batch["gt_bboxes"])
    lbl = jnp.asarray(batch["gt_labels"])
    msk = jnp.asarray(batch["gt_mask"])
    B, H, W, C = img.shape
    G = bb.shape[1]
    k_sel, k_off, k_apply = jax.random.split(key, 3)
    partners = jax.random.randint(k_sel, (B, 3), 0, B)
    offsets = jax.random.uniform(k_off, (B, 2))  # crop offset in [0, 1] -> [0, S]
    apply = jax.random.uniform(k_apply, (B,)) < p

    def one(i, parts, off):
        ids = jnp.concatenate([i[None], parts])  # (4,)
        tiles = img[ids]  # (4, H, W, C)
        canvas = jnp.concatenate(
            [
                jnp.concatenate([tiles[0], tiles[1]], axis=1),
                jnp.concatenate([tiles[2], tiles[3]], axis=1),
            ],
            axis=0,
        )  # (2H, 2W, C)
        oy = (off[1] * H).astype(jnp.int32)
        ox = (off[0] * W).astype(jnp.int32)
        out_img = jax.lax.dynamic_slice(canvas, (oy, ox, 0), (H, W, C))

        # boxes: quadrant q at offset (qx, qy) in canvas-normalized halves
        qoff = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])  # (4, 2) x,y
        b4 = bb[ids]  # (4, G, 4) normalized per tile
        l4 = lbl[ids]
        m4 = msk[ids]
        # canvas coords in units of S (output size): tile spans [qoff, qoff+1]
        cx1 = b4[..., 0] + qoff[:, None, 0]
        cy1 = b4[..., 1] + qoff[:, None, 1]
        cx2 = b4[..., 2] + qoff[:, None, 0]
        cy2 = b4[..., 3] + qoff[:, None, 1]
        # crop: subtract offset (in units of S: ox/W, oy/H), output spans [0,1]
        fx = ox.astype(jnp.float32) / W
        fy = oy.astype(jnp.float32) / H
        x1 = jnp.clip(cx1 - fx, 0.0, 1.0)
        y1 = jnp.clip(cy1 - fy, 0.0, 1.0)
        x2 = jnp.clip(cx2 - fx, 0.0, 1.0)
        y2 = jnp.clip(cy2 - fy, 0.0, 1.0)
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(4 * G, 4)
        labels = l4.reshape(4 * G)
        valid = (
            m4.reshape(4 * G)
            & ((boxes[:, 2] - boxes[:, 0]) > min_box)
            & ((boxes[:, 3] - boxes[:, 1]) > min_box)
        )
        cb, cl, cm = _compact_boxes(boxes, labels, valid, G)
        return out_img, cb, cl, cm

    m_img, m_bb, m_lbl, m_msk = jax.vmap(one)(jnp.arange(B), partners, offsets)

    return {
        **batch,
        "img": jnp.where(apply[:, None, None, None], m_img, img),
        "gt_bboxes": jnp.where(apply[:, None, None], m_bb, bb),
        "gt_labels": jnp.where(apply[:, None], m_lbl, lbl),
        "gt_mask": jnp.where(apply[:, None], m_msk, msk),
    }


# --------------------------------------------------------------------- mixup


def mixup(batch: dict, key: jax.Array, p: float, alpha: float = 8.0) -> dict:
    """Detection mixup (YOLOX recipe: applied after mosaic).

    Each image blends with a random batch partner at ratio
    ``lam ~ Beta(alpha, alpha)``; the box sets take their UNION (detection
    mixup keeps both images' objects unweighted — the standard YOLO
    formulation, unlike classification mixup's soft labels). The 2G union
    compacts back to the static max-GT capacity, mosaic-style.
    """
    img = jnp.asarray(batch["img"])
    bb = jnp.asarray(batch["gt_bboxes"])
    lbl = jnp.asarray(batch["gt_labels"])
    msk = jnp.asarray(batch["gt_mask"])
    B, G = bb.shape[:2]
    k_sel, k_lam, k_apply = jax.random.split(key, 3)
    # partner is always a DIFFERENT image: self-mixup would be a pixel
    # no-op that still duplicates every GT box after the union
    partner = (jnp.arange(B) + jax.random.randint(k_sel, (B,), 1, B)) % B
    lam = jax.random.beta(k_lam, alpha, alpha, (B,)).astype(img.dtype)
    apply = jax.random.uniform(k_apply, (B,)) < p

    m_img = lam[:, None, None, None] * img + (1 - lam)[:, None, None, None] * img[partner]
    u_bb = jnp.concatenate([bb, bb[partner]], axis=1)  # (B, 2G, 4)
    u_lbl = jnp.concatenate([lbl, lbl[partner]], axis=1)
    u_msk = jnp.concatenate([msk, msk[partner]], axis=1)
    c_bb, c_lbl, c_msk = jax.vmap(partial(_compact_boxes, G=G))(u_bb, u_lbl, u_msk)

    return {
        **batch,
        "img": jnp.where(apply[:, None, None, None], m_img, img),
        "gt_bboxes": jnp.where(apply[:, None, None], c_bb, bb),
        "gt_labels": jnp.where(apply[:, None], c_lbl, lbl),
        "gt_mask": jnp.where(apply[:, None], c_msk, msk),
    }


# ---------------------------------------------------------------- letterbox


@partial(jax.jit, static_argnames=("out_size", "pad_value"))
def letterbox_batch(imgs: jnp.ndarray, out_size: int, pad_value: float = 114.0 / 255.0):
    """Device-side letterbox for a uniform-size batch (B, H, W, C) float.

    Aspect-preserving resize to fit ``out_size`` then centered pad — the
    jittable preproc of the streaming-inference path (BASELINE config 5)
    for fixed-shape sources (e.g. a camera stream). Returns
    (out (B, S, S, C), scale, (pad_x, pad_y)); scale/pads are Python floats
    derived from static shapes, usable to unmap boxes.
    """
    B, H, W, C = imgs.shape
    r = min(out_size / W, out_size / H)
    nw, nh = int(round(W * r)), int(round(H * r))
    resized = jax.image.resize(imgs, (B, nh, nw, C), method="bilinear")
    px, py = (out_size - nw) // 2, (out_size - nh) // 2
    out = jnp.full((B, out_size, out_size, C), pad_value, imgs.dtype)
    out = jax.lax.dynamic_update_slice(out, resized.astype(imgs.dtype), (0, py, px, 0))
    return out, r, (px, py)


# ------------------------------------------------------------------ pipeline


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(batch: dict, key: jax.Array, cfg: AugmentConfig = AugmentConfig()) -> dict:
    """Full device-side pipeline: mosaic -> mixup -> flips -> color."""
    k_m, k_x, k_h, k_v, k_c = jax.random.split(key, 5)
    if cfg.mosaic_p > 0:
        batch = mosaic4(batch, k_m, cfg.mosaic_p, cfg.min_box_size)
    if cfg.mixup_p > 0:
        batch = mixup(batch, k_x, cfg.mixup_p, cfg.mixup_alpha)
    if cfg.hflip_p > 0:
        batch = random_hflip(batch, k_h, cfg.hflip_p)
    if cfg.vflip_p > 0:
        batch = random_vflip(batch, k_v, cfg.vflip_p)
    if cfg.color_p > 0:
        if batch["img"].shape[-1] == 3:
            batch = {**batch, "img": hsv_jitter(batch["img"], k_c, cfg)}
        else:
            batch = {**batch, "img": gray_jitter(batch["img"], k_c, cfg)}
    return batch
