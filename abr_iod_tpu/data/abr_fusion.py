"""On-device Augmented Box Replay fusion (mixup + mosaic).

The reference does this per sample in Python/PIL inside DataLoader
worker processes (voc_abr.py:555-858): with probability 1/4 mixup, 1/4
mosaic, 1/2 untouched.  On a 1-core TPU VM host that CPU path would
starve the chip, so here fusion is a jit-compiled compositing program
over the whole batch: crops live in a device-resident padded bank and
are pasted with ``jax.image.scale_and_translate`` (continuous scale +
position with static shapes).

Faithfully reproduced semantics (per voc_abr.py):
  * mixup: λ ~ Beta(2,5) (:590), 2 fusion attempts (:591,687-691),
    placement in the top-left [0,0.6w]×[0,0.4h] region with retries
    re-anchored bottom-right (:613-637), candidate rejected when overlap
    with any existing GT exceeds 0.3 of either area (compute_overlap,
    :932-954), pixel blend λ·img + (1−λ)·crop with edge clipping
    (:659-678), abandoned when a single GT covers ≳75% (:580-585)
  * crop rescale rule: keep when crop mean-size ∈ [0.2,0.7]·image
    mean-size, else rescale to U[0.4,0.6]·image-mean (:540-547) —
    computed in ORIGINAL pixel units then mapped through the image's
    resize ratio
  * mosaic: gray-114 square canvas with side = mean image size (:712),
    center jittered in [0.4,0.6]² (:718-719), 4 crops in 4 quadrants
    (:739-762), GTs shifted/clipped, boxes ≤2px dropped (:797-801);
    the current image is NOT included (its targets are discarded —
    transform_current_data_with_ABR:846 passes an empty target list)

Deliberate statistical deviations (SURVEY.md §7 "statistical
equivalence, not exact replay"): the sequential ≤20-retry loop becomes
K=20 candidate positions scored in parallel (first acceptable wins);
crops are sampled with replacement instead of a consumable shuffled
pool.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

MOSAIC_FILL = 114.0


class CropBank(NamedTuple):
    pixels: jnp.ndarray  # [N, BH, BW, 3] RGB 0-255, content top-left aligned
    content_hw: jnp.ndarray  # [N, 2] float — content size inside the bank slot
    orig_hw: jnp.ndarray  # [N, 2] float — crop size in original image pixels
    labels: jnp.ndarray  # [N] int32


def _paste(canvas, crop_px, content_hw, dest_xyxy, clip_xyxy):
    """Scale `crop_px`'s content to fill dest rect, masked to clip rect.
    Returns (pasted_pixels, mask [H,W,1])."""
    h, w = canvas.shape[:2]
    x1, y1, x2, y2 = dest_xyxy
    sy = (y2 - y1) / jnp.maximum(content_hw[0], 1.0)
    sx = (x2 - x1) / jnp.maximum(content_hw[1], 1.0)
    out = jax.image.scale_and_translate(
        crop_px,
        shape=(h, w, 3),
        spatial_dims=(0, 1),
        scale=jnp.array([sy, sx]),
        translation=jnp.array([y1, x1]),
        method="linear",
    )
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    cx1, cy1, cx2, cy2 = clip_xyxy
    mask = (xx >= cx1) & (xx < cx2) & (yy >= cy1) & (yy < cy2)
    return out, mask[..., None]


def _overlap_reject(cand_xyxy, gt_boxes, gt_mask):
    """True where a candidate overlaps any valid gt by >0.3 of either area
    (voc_abr.py compute_overlap:932-954, +1 convention)."""
    gx1, gy1, gx2, gy2 = (gt_boxes[:, i] for i in range(4))
    cx1, cy1, cx2, cy2 = (cand_xyxy[:, i] for i in range(4))
    iw = jnp.minimum(gx2[None, :], cx2[:, None]) - jnp.maximum(gx1[None, :], cx1[:, None]) + 1
    ih = jnp.minimum(gy2[None, :], cy2[:, None]) - jnp.maximum(gy1[None, :], cy1[:, None]) + 1
    inter = jnp.maximum(iw, 0) * jnp.maximum(ih, 0)
    area_g = (gx2 - gx1 + 1) * (gy2 - gy1 + 1)
    area_c = (cx2 - cx1 + 1) * (cy2 - cy1 + 1)
    bad = (inter / area_g[None, :] > 0.3) | (inter / area_c[:, None] > 0.3)
    return jnp.any(bad & gt_mask[None, :], axis=1)  # [K]


def _append_box(boxes, labels, mask, new_box, new_label, enable):
    n = jnp.sum(mask.astype(jnp.int32))
    m = boxes.shape[0]
    slot = jnp.where(enable & (n < m), n, m)  # m → dropped
    boxes = boxes.at[slot].set(new_box, mode="drop")
    labels = labels.at[slot].set(new_label, mode="drop")
    mask = mask.at[slot].set(True, mode="drop")
    return boxes, labels, mask


def _crop_scale(key, bank_orig_hw, im_mean_orig):
    """The reference's rescale rule in original pixel units
    (voc_abr.py:540-547). Returns the scale to apply to the crop."""
    box_mean = jnp.mean(bank_orig_hw)
    keep = (box_mean >= 0.2 * im_mean_orig) & (box_mean <= 0.7 * im_mean_orig)
    rnd = jax.random.uniform(key, (), minval=0.4 * im_mean_orig, maxval=0.6 * im_mean_orig)
    return jnp.where(keep, 1.0, rnd / jnp.maximum(box_mean, 1.0))


def _draw_crop_indices(key, n_bank: int):
    """Pre-draw the bank indices every fusion branch COULD consume (2 for
    the mixup attempts, 4 for the mosaic quadrants) with exactly the key
    derivation the branches use.  Hoisting the draws lets the caller
    gather the ≤6 needed crops per image in ONE batched gather outside
    the vmap — vmapping ``bank.pixels[idx]`` itself makes XLA broadcast
    the whole bank per batch element (~900 MB of HBM traffic per step on
    the bench shapes).
    """
    _, k_fuse = jax.random.split(key)
    # mixup stream (must mirror _mixup_one)
    _, k_rest = jax.random.split(k_fuse)
    mix_keys = jax.random.split(k_rest, 2)
    mix_idx = jnp.stack(
        [jax.random.randint(jax.random.split(mk, 3)[0], (), 0, n_bank) for mk in mix_keys]
    )
    # mosaic stream (must mirror _mosaic_one)
    _, k_crops = jax.random.split(k_fuse)
    mos_keys = jax.random.split(k_crops, 4)
    mos_idx = jnp.stack(
        [jax.random.randint(jax.random.split(mk)[0], (), 0, n_bank) for mk in mos_keys]
    )
    return jnp.concatenate([mix_idx, mos_idx])  # [6]


def _mixup_one(img, size_hw, orig_hw, gt_boxes, gt_labels, gt_mask, bank: CropBank, key):
    h_valid = size_hw[0].astype(jnp.float32)
    w_valid = size_hw[1].astype(jnp.float32)
    ratio = jnp.mean(size_hw.astype(jnp.float32)) / jnp.maximum(
        jnp.mean(orig_hw.astype(jnp.float32)), 1.0
    )  # orig px → canvas px
    im_mean_orig = jnp.mean(orig_hw.astype(jnp.float32))

    k_lambda, k_rest = jax.random.split(key)
    lam = jax.random.beta(k_lambda, 2.0, 5.0)

    # abandon if a single gt covers ~75% of the image (voc_abr.py:580-585)
    n_gt = jnp.sum(gt_mask.astype(jnp.int32))
    gw = gt_boxes[0, 2] - gt_boxes[0, 0]
    gh = gt_boxes[0, 3] - gt_boxes[0, 1]
    dominated = (
        (n_gt == 1)
        & ((w_valid - gw) < 0.25 * w_valid)
        & ((h_valid - gh) < 0.25 * h_valid)
    )

    state = (img, gt_boxes, gt_labels, gt_mask)

    def attempt(state, xs):
        k, idx = xs  # idx: pre-drawn slot in the per-image selected bank
        img, boxes, labels, mask = state
        _, k_scale, k_pos = jax.random.split(k, 3)
        scale = _crop_scale(k_scale, bank.orig_hw[idx], im_mean_orig)
        # crop size on the canvas
        ch = bank.orig_hw[idx, 0] * scale * ratio
        cw = bank.orig_hw[idx, 1] * scale * ratio

        # K candidate positions: first 10 top-left region, next 10 anchored
        # bottom-right (voc_abr.py:613-637)
        kk = 20
        u = jax.random.uniform(k_pos, (kk, 2))
        tl_x = u[:, 0] * 0.6 * w_valid
        tl_y = u[:, 1] * 0.4 * h_valid
        br_x = (0.4 + 0.6 * u[:, 0]) * w_valid
        br_y = (0.6 + 0.4 * u[:, 1]) * h_valid
        first = jnp.arange(kk) < 10
        x1 = jnp.where(first, tl_x, br_x - cw)
        y1 = jnp.where(first, tl_y, br_y - ch)
        cand = jnp.stack([x1, y1, x1 + cw, y1 + ch], axis=1)  # [K, 4]

        reject = _overlap_reject(cand, boxes, mask)
        any_ok = jnp.any(~reject)
        pick = jnp.argmax(~reject)  # first acceptable
        sel = cand[pick]

        # clip to the valid region (voc_abr.py:640-657)
        clipped = jnp.array(
            [
                jnp.clip(sel[0], 0.0, w_valid),
                jnp.clip(sel[1], 0.0, h_valid),
                jnp.clip(sel[2], 0.0, w_valid),
                jnp.clip(sel[3], 0.0, h_valid),
            ]
        )
        pasted, m = _paste(
            img,
            bank.pixels[idx],
            bank.content_hw[idx],
            (sel[0], sel[1], sel[2], sel[3]),
            (clipped[0], clipped[1], clipped[2], clipped[3]),
        )
        blended = jnp.where(m, lam * img + (1.0 - lam) * pasted, img)
        img = jnp.where(any_ok, blended, img)
        boxes, labels, mask = jax.lax.cond(
            any_ok,
            lambda b, l, mk: _append_box(b, l, mk, clipped, bank.labels[idx], True),
            lambda b, l, mk: (b, l, mk),
            boxes, labels, mask,
        )
        return (img, boxes, labels, mask), None

    def do_mixup(state):
        keys = jax.random.split(k_rest, 2)  # 2 fusion attempts (:687-691)
        out, _ = jax.lax.scan(attempt, state, (keys, jnp.arange(2)))
        return out

    img, boxes, labels, mask = jax.lax.cond(
        dominated, lambda s: s, do_mixup, state
    )
    return img, size_hw, boxes, labels, mask


def _mosaic_one(img, size_hw, orig_hw, gt_boxes, gt_labels, gt_mask,
                bank: CropBank, key, mosaic_side: int):
    """Mosaic replaces the sample: 4 crops on a gray square
    (voc_abr.py:700-816)."""
    h, w = img.shape[:2]
    s = float(mosaic_side)
    im_mean_orig = jnp.mean(orig_hw.astype(jnp.float32))
    s_orig = im_mean_orig  # square side in original units (:712)
    to_canvas = s / jnp.maximum(s_orig, 1.0)

    k_center, k_crops = jax.random.split(key)
    cu = jax.random.uniform(k_center, (2,), minval=0.4, maxval=0.6)
    xc = cu[0] * s
    yc = cu[1] * s

    canvas = jnp.full((h, w, 3), MOSAIC_FILL, dtype=img.dtype)
    boxes = jnp.zeros_like(gt_boxes)
    labels = jnp.zeros_like(gt_labels)
    mask = jnp.zeros_like(gt_mask)

    def place(i, state, k):
        canvas, boxes, labels, mask = state
        idx = 2 + i  # pre-drawn slot in the per-image selected bank
        _, k_scale = jax.random.split(k)
        scale = _crop_scale(k_scale, bank.orig_hw[idx], im_mean_orig)
        ch = bank.orig_hw[idx, 0] * scale * to_canvas
        cw = bank.orig_hw[idx, 1] * scale * to_canvas

        # quadrants: 0 top-right, 1 bottom-left, 2 bottom-right, 3 top-left
        # (voc_abr.py:739-762)
        x1 = jnp.select(
            [i == 0, i == 1, i == 2], [xc, xc - cw, xc], xc - cw
        )
        y1 = jnp.select(
            [i == 0, i == 1, i == 2], [yc - ch, yc, yc], yc - ch
        )
        dest = (x1, y1, x1 + cw, y1 + ch)
        clip = (
            jnp.clip(x1, 0.0, s),
            jnp.clip(y1, 0.0, s),
            jnp.clip(x1 + cw, 0.0, s),
            jnp.clip(y1 + ch, 0.0, s),
        )
        pasted, m = _paste(canvas, bank.pixels[idx], bank.content_hw[idx], dest, clip)
        canvas = jnp.where(m, pasted, canvas)

        new_box = jnp.array([clip[0], clip[1], clip[2], clip[3]])
        big_enough = ((clip[2] - clip[0]) > 2.0) & ((clip[3] - clip[1]) > 2.0)
        boxes, labels, mask = _append_box(
            boxes, labels, mask, new_box, bank.labels[idx], big_enough
        )
        return canvas, boxes, labels, mask

    state = (canvas, boxes, labels, mask)
    keys = jax.random.split(k_crops, 4)
    for i in range(4):
        state = place(i, state, keys[i])
    canvas, boxes, labels, mask = state
    new_size = jnp.array([mosaic_side, mosaic_side], dtype=size_hw.dtype)
    return canvas, new_size, boxes, labels, mask


def abr_fuse_batch(pixels, sizes, orig_sizes, gt_boxes, gt_labels, gt_mask,
                   bank: CropBank, key, mosaic_side: int):
    """Apply per-image ABR fusion: p=1/4 mixup, 1/4 mosaic, 1/2 untouched
    (voc_abr.py transform_current_data_with_ABR:821-858).

    pixels: RAW RGB canvas [B,H,W,3] float 0-255 (pre-normalization).
    Returns (pixels, sizes, gt_boxes, gt_labels, gt_mask).
    """

    def one(img, size_hw, orig_hw, boxes, labels, mask, k, sel: CropBank):
        k_mode, k_fuse = jax.random.split(k)
        mode = jax.random.choice(
            k_mode, jnp.array([0, 0, 1, 2]), ()
        )  # 2:1:1 untouched:mixup:mosaic

        def untouched(_):
            return img, size_hw, boxes, labels, mask

        def mixup(_):
            return _mixup_one(img, size_hw, orig_hw, boxes, labels, mask, sel, k_fuse)

        def mosaic(_):
            return _mosaic_one(
                img, size_hw, orig_hw, boxes, labels, mask, sel, k_fuse, mosaic_side
            )

        return jax.lax.switch(mode, [untouched, mixup, mosaic], None)

    bsz = pixels.shape[0]
    keys = jax.random.split(key, bsz)
    # ONE batched gather of the ≤6 crops each image can consume; the
    # vmapped body then only touches its tiny per-image selection (see
    # _draw_crop_indices for why this is hoisted)
    idx = jax.vmap(lambda k: _draw_crop_indices(k, bank.labels.shape[0]))(keys)
    selected = jax.tree_util.tree_map(lambda a: a[idx], bank)  # [B, 6, ...]
    return jax.vmap(one)(
        pixels, sizes, orig_sizes, gt_boxes, gt_labels, gt_mask, keys, selected
    )


def make_abr_batch_fn(cfg, bank: CropBank):
    """jit-compiled (raw host batch, key) → normalized engine Batch:
    fusion + the reference's Normalize transform fused on device.

    The crop bank is passed as a jit ARGUMENT (device-resident), not a
    closure constant — closing over it would embed the whole pixel bank
    (potentially hundreds of MB) into the compiled program as literals.
    """
    from ..engine.train import Batch

    canvas = tuple(cfg.TPU.CANVAS_TRAIN)
    mosaic_side = int(min(int(cfg.INPUT.MIN_SIZE_TRAIN[0]), canvas[0], canvas[1]))
    pixel_mean = jnp.asarray(cfg.INPUT.PIXEL_MEAN, jnp.float32)
    to_bgr = bool(cfg.INPUT.TO_BGR255)
    # emit pixels in the compute dtype: the model's first op casts to it
    # anyway, and bf16's ~1-level quantization at intensity 255 matches the
    # reference's uint8 PIL compositing; halves the fused batch's HBM
    # traffic.  f32 compute keeps f32 pixels.
    out_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                 "float16": jnp.float16}[str(cfg.TPU.COMPUTE_DTYPE)]
    bank_on_device = jax.device_put(bank)

    @jax.jit
    def fuse_impl(bank_arg, pixels, sizes, orig_sizes, gt_boxes, gt_labels,
                  gt_mask, key):
        # the loader ships raw canvases as uint8 (4x less host→device
        # traffic); blending happens in f32 either way
        pixels = pixels.astype(jnp.float32)
        px, sz, bx, lb, mk = abr_fuse_batch(
            pixels, sizes, orig_sizes, gt_boxes, gt_labels, gt_mask,
            bank_arg, key, mosaic_side,
        )
        if to_bgr:
            px = px[..., ::-1]
        px = (px - pixel_mean).astype(out_dtype)
        return Batch(px, sz, bx, lb, mk)

    def fuse(pixels, sizes, orig_sizes, gt_boxes, gt_labels, gt_mask, key):
        return fuse_impl(bank_on_device, pixels, sizes, orig_sizes, gt_boxes,
                         gt_labels, gt_mask, key)

    return fuse
