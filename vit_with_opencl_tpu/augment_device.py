"""Device-side DeiT augmentation — the whole pixel pipeline as ONE jitted
batched TPU program.

Why this exists: the host pipeline (`augment.augmented_dataset`) costs
~4 ms/image of GIL-bound NumPy on one producer core (measured, BENCH.md
round 5); a ViT-B step consumes 1000 img/s and Tiny 6000+, so a TPU-VM
host needs 4–26 producer cores just to keep the chip fed — and the bench
host has one. The TPU-native answer is to move the *pixels* work onto the
chip: the host loader only shuffles indices and ships raw **uint8** HWC
batches (3× less PCIe/tunnel traffic than fp32), and RandomResizedCrop →
flip → RandAugment → normalize run as one fused static-shape XLA program
whose cost is noise next to a training step (elementwise VPU work plus a
handful of gathers; zero MXU contention).

Semantics mirror the host ops in :mod:`..augment` one-for-one (same
RandAugment op set, magnitude mapping, PIL blend/quantization rules —
each device op is unit-tested against its host twin on fixed arguments in
``tests/test_augment_device.py``), with two documented conventions:

- Random *draws* come from ``jax.random`` instead of NumPy Generators, so
  a device-augmented stream is not bit-identical to the host stream (the
  distributions match; parity across worker counts is a host-pipeline
  concept).
- Geometric resampling (RRC resize, affine warps) follows the pure-NumPy
  bilinear convention (``io.preprocess._resize_bilinear_np`` /
  ``augment._affine``'s NumPy path, align_corners=False), not PIL's
  half-pixel C sampler that the host prefers for uint8 speed. Rotation is
  a Paeth 3-shear decomposition (three exact single-axis bilinear passes
  instead of one 2-D resample — see :func:`_rotate`). Reference behavior
  contract: the reference consumes *pre-augmented* tensors (SURVEY §2.4 —
  its inputs are offline torchvision preprocessing), so augmentation
  backends are free as long as train-time statistics match.

TPU shaping (the round-5 rewrite; all numbers bs128 224px on chip): under
``vmap``, ``lax.switch`` lowers to "run EVERY branch, select", so the
per-op cost model is "sum of all ops", not "cost of the drawn op" — the
naive port (2-D gather warps per affine op, scatter-add histograms) ran
the full RandAugment table at 3.28 s/batch, 6x worse than the host
pipeline it replaces. Three rewrites fix the three hot spots and are
exact-parity against the originals:

- affine warps: all five geometric ops are unit-diagonal inverse maps
  (rotate after Paeth factoring), i.e. separable single-axis warps with a
  per-row/column constant integer shift + 2-tap blend. One fused 3-pass
  two-level shift-basis warp (:func:`_warp_x`/:func:`_warp_y`, selected
  by traced per-image parameters in :func:`_geom_apply`) replaces five
  vmapped 2-D gathers: 2501 -> 17 ms (substitution table, incl. shell).
- equalize: two-level 16x16 one-hot nibble planes — histogram and LUT
  application as tiny MXU matmuls (see :func:`_equalize`) instead of
  `.at[].add` scatter: 761 -> 23.6 ms, parity 0.0.
- RRC resize: the bilinear gather becomes two one-hot matmuls riding the
  MXU (:func:`_crop_resize`): exact up to fp32 dot order.

Net: the full DeiT pipeline runs at 43.6 ms/batch standalone (75x the
naive port) and costs +40.0 ms/step fused into the ViT-B bs128 train
step — 313 us/img vs the 4 ms/img host producer CPU it replaces. All
numbers recorded in BENCH.md ("Device-side pixel pipeline").

The reference project has no training at all; this module is
beyond-reference capability paired with `augment.device_mixup_cutmix`.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .io.preprocess import IMAGENET_MEAN, IMAGENET_STD

_GRAY = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)  # PIL L weights


def _q8(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 quantization in float: the device twin of ``augment._to_u8``
    (every host op rounds through uint8; mirroring it keeps device output
    within 1 lsb of the host op chain)."""
    return jnp.clip(jnp.round(x), 0.0, 255.0)


def _blend(img: jnp.ndarray, other: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL ImageEnhance blend: other + factor*(img-other), u8-rounded."""
    return _q8(other + factor * (img - other))


# ---------------------------------------------------------------------------
# RandAugment op twins (img: f32 HWC in [0,255], already u8-quantized)
# ---------------------------------------------------------------------------


def _autocontrast(img, _v):
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    scaled = _q8((img - lo) * (255.0 / jnp.maximum(hi - lo, 1.0)))
    return jnp.where(hi <= lo, img, scaled)


def _equalize(img, _v):
    """PIL ImageOps.equalize per channel: 256-bin histogram → PIL's
    step/offset LUT (integer arithmetic) → LUT lookup.

    TPU-shaped, two-level: a pixel value v = 16·c + f is one-hot encoded
    as TWO [H, W, 16] compare planes (coarse nibble c, fine nibble f)
    instead of one [H, W, 256] plane. The histogram is then a [HW,16]ᵀ ·
    [HW,16] matmul (hist16[c, f] = count of value 16c+f, MXU-shaped) and
    the LUT application is oh_hi · lut16 followed by a masked sum over
    the fine plane — 8× less VPU compare/sum work than the flat plane
    (itself 30× faster than the `.at[].add` scatter both replace). All
    sums are exact in fp32 (0/1 products, counts < 2²⁴); parity vs the
    scatter formulation is exactly 0.0."""
    nib = jnp.arange(16, dtype=jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)

    def one_channel(ch):
        idx = ch.astype(jnp.int32)
        oh_hi = (idx[..., None] // 16 == nib).astype(jnp.float32)
        oh_lo = (idx[..., None] % 16 == nib).astype(jnp.float32)
        hist16 = jnp.einsum("hwc,hwf->cf", oh_hi, oh_lo,
                            precision=jax.lax.Precision.HIGHEST)
        hist = hist16.reshape(-1).astype(jnp.int32)         # value order
        nz = hist > 0
        n_nz = nz.sum()
        # value of the LAST nonzero bin
        last_nz = hist[jnp.argmax(jnp.where(nz, bins, -1))]
        step = (hist.sum() - last_nz) // 255
        lut = jnp.clip(
            (jnp.cumsum(hist) - hist + step // 2)
            // jnp.maximum(step, 1), 0, 255).astype(jnp.float32)
        seg = jnp.einsum("hwc,cf->hwf", oh_hi, lut.reshape(16, 16),
                         precision=jax.lax.Precision.HIGHEST)
        out = (seg * oh_lo).sum(-1)
        return jnp.where((n_nz <= 1) | (step == 0), ch, out)

    return jnp.stack([one_channel(img[..., c]) for c in range(3)], axis=-1)


def _posterize(img, bits):
    # host: img & uint8(256 - (1 << (8-b))), b = round(bits), identity b>=8
    b = jnp.clip(jnp.round(bits).astype(jnp.int32), 0, 8)
    mask = jnp.bitwise_and(256 - jnp.left_shift(1, 8 - b), 0xFF)
    out = jnp.bitwise_and(img.astype(jnp.int32), mask).astype(jnp.float32)
    return jnp.where(b >= 8, img, out)


def _solarize(img, threshold):
    return jnp.where(img >= threshold, 255.0 - img, img)


def _brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def _contrast(img, factor):
    gray = img @ _GRAY
    mean = _q8(gray.mean())
    return _blend(img, jnp.full_like(img, mean), factor)


def _color(img, factor):
    gray = _q8(img @ _GRAY)[..., None]
    return _blend(img, jnp.broadcast_to(gray, img.shape), factor)


def _sharpness(img, factor):
    """PIL SMOOTH kernel ([[1,1,1],[1,5,1],[1,1,1]]/13), borders kept."""
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    sm = (pad[:-2, :-2] + pad[:-2, 1:-1] + pad[:-2, 2:]
          + pad[1:-1, :-2] + 5.0 * img + pad[1:-1, 2:]
          + pad[2:, :-2] + pad[2:, 1:-1] + pad[2:, 2:]) / 13.0
    h, w = img.shape[:2]
    ys = jnp.arange(h)[:, None, None]
    xs = jnp.arange(w)[None, :, None]
    border = (ys == 0) | (ys == h - 1) | (xs == 0) | (xs == w - 1)
    sm = jnp.where(border, img, sm)
    return _blend(img, _q8(sm), factor)


def _affine(img, mat, fill: float = 128.0):
    """Bilinear inverse affine warp — twin of the host ``augment._affine``
    NumPy path: center (w-1)/2, out-of-bounds filled with gray.

    This is the general 2-D point-gather form, kept as the correctness
    reference; it lowers to a gather that costs ~256 ms/batch at bs128
    under vmap, so the production RandAugment path never calls it — all
    five geometric ops route through the separable :func:`_warp_x` /
    :func:`_warp_y` basis warps instead (exact for unit-diagonal maps)."""
    h, w = img.shape[:2]
    a, b, c, d, e, f = mat
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    xo, yo = xs - cx, ys - cy
    xi = a * xo + b * yo + c + cx
    yi = d * xo + e * yo + f + cy
    x0 = jnp.floor(xi).astype(jnp.int32)
    y0 = jnp.floor(yi).astype(jnp.int32)
    wx = (xi - x0)[..., None]
    wy = (yi - y0)[..., None]

    def sample(yy, xx):
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        v = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(inside[..., None], v, fill)

    top = sample(y0, x0) * (1 - wx) + sample(y0, x0 + 1) * wx
    bot = sample(y0 + 1, x0) * (1 - wx) + sample(y0 + 1, x0 + 1) * wx
    return _q8(top * (1 - wy) + bot * wy)


# -- separable shift-basis warps (the TPU-shaped affine backend) -----------

_GRANULE = 16  # coarse-shift stride of the two-level basis (G ~ sqrt(2S))
_TAN15 = math.tan(math.pi / 12.0)   # Paeth alpha reach at the 30 deg cap
_SIN30 = 0.5                        # Paeth beta reach at the 30 deg cap


def _s_bound(reach: float) -> int:
    """Shift budget covering |offset| <= reach, rounded up to a multiple
    of the granule so the coarse-pass slice bounds tile the pad exactly."""
    return -(-int(math.ceil(reach + 1.0)) // _GRANULE) * _GRANULE


def _concrete_reach(v, default: float) -> float:
    """Widen a static shift bound when the op argument is a concrete
    number outside the production magnitude range (traced arguments keep
    the table bound; offsets beyond the budget saturate)."""
    if isinstance(v, (int, float, np.integer, np.floating)):
        return max(default, abs(float(v)))
    return default


def _warp_x(img, slope, const, S: int):
    """``out[y, x] = bilinear_x(img[y], x + off(y))`` with
    ``off(y) = slope*(y - cy) + const`` clipped to [-S, S-1] and taps
    outside the image filled with gray — the exact single-axis
    specialization of :func:`_affine` for maps with no x-scale
    (a=1: shears, translations, Paeth rotation passes).

    TPU-shaped: the per-row integer shift is *selected*, not gathered — a
    coarse pass of static stride-16 slices picks the shift granule, a fine
    pass of 16 static slices applies the remainder plus the 2-tap bilinear
    blend. ceil(2S/16)+16 fused mask-multiply-adds replace a 2-D point
    gather (measured 2501 -> ~30 ms/batch for the full affine table at
    bs128/224px, exact parity vs the gather on in-budget offsets)."""
    h, w = img.shape[:2]
    cy = (h - 1) / 2.0
    yo = jnp.arange(h, dtype=jnp.float32) - cy
    off = jnp.clip(slope * yo + const, float(-S), float(S - 1))
    s0f = jnp.floor(off)
    f = (off - s0f)[:, None, None]
    s0 = s0f.astype(jnp.int32)                    # in [-S, S-1]
    coarse = (s0 + S) // _GRANULE                 # in [0, 2S/G - 1]
    fine = (s0 + S) - coarse * _GRANULE           # in [0, G-1]
    pad = jnp.pad(img, ((0, 0), (S + 1, S + 1), (0, 0)),
                  constant_values=128.0)
    mid = jnp.zeros((h, w + _GRANULE + 1) + img.shape[2:], img.dtype)
    for c in range(2 * S // _GRANULE):
        hit = (coarse == c).astype(img.dtype)[:, None, None]
        start = c * _GRANULE + 1                  # pad col of shift c*G-S
        mid = mid + hit * jax.lax.slice_in_dim(
            pad, start, start + w + _GRANULE + 1, axis=1)
    acc = jnp.zeros_like(img)
    for s in range(_GRANULE):
        hit = (fine == s).astype(img.dtype)[:, None, None]
        lo = jax.lax.slice_in_dim(mid, s, s + w, axis=1)
        hi = jax.lax.slice_in_dim(mid, s + 1, s + 1 + w, axis=1)
        acc = acc + hit * ((1.0 - f) * lo + f * hi)
    return acc


def _warp_y(img, slope, const, S: int):
    """y-axis twin of :func:`_warp_x`:
    ``out[y, x] = bilinear_y(img[:, x], y + off(x))``,
    ``off(x) = slope*(x - cx) + const``."""
    h, w = img.shape[:2]
    cx = (w - 1) / 2.0
    xo = jnp.arange(w, dtype=jnp.float32) - cx
    off = jnp.clip(slope * xo + const, float(-S), float(S - 1))
    s0f = jnp.floor(off)
    f = (off - s0f)[None, :, None]
    s0 = s0f.astype(jnp.int32)
    coarse = (s0 + S) // _GRANULE
    fine = (s0 + S) - coarse * _GRANULE
    pad = jnp.pad(img, ((S + 1, S + 1), (0, 0), (0, 0)),
                  constant_values=128.0)
    mid = jnp.zeros((h + _GRANULE + 1, w) + img.shape[2:], img.dtype)
    for c in range(2 * S // _GRANULE):
        hit = (coarse == c).astype(img.dtype)[None, :, None]
        start = c * _GRANULE + 1
        mid = mid + hit * jax.lax.slice_in_dim(
            pad, start, start + h + _GRANULE + 1, axis=0)
    acc = jnp.zeros_like(img)
    for s in range(_GRANULE):
        hit = (fine == s).astype(img.dtype)[None, :, None]
        lo = jax.lax.slice_in_dim(mid, s, s + h, axis=0)
        hi = jax.lax.slice_in_dim(mid, s + 1, s + 1 + h, axis=0)
        acc = acc + hit * ((1.0 - f) * lo + f * hi)
    return acc


def _shear_x(img, v):
    S = _s_bound(_concrete_reach(v, 0.3) * (img.shape[0] - 1) / 2.0)
    return _q8(_warp_x(img, -v, 0.0, S))


def _shear_y(img, v):
    S = _s_bound(_concrete_reach(v, 0.3) * (img.shape[1] - 1) / 2.0)
    return _q8(_warp_y(img, -v, 0.0, S))


def _translate_x(img, v):
    S = _s_bound(_concrete_reach(v, 0.45) * img.shape[1])
    return _q8(_warp_x(img, 0.0, -v * img.shape[1], S))


def _translate_y(img, v):
    S = _s_bound(_concrete_reach(v, 0.45) * img.shape[0])
    return _q8(_warp_y(img, 0.0, -v * img.shape[0], S))


def _rotate(img, deg):
    """Paeth 3-shear rotation: R(θ) = Sx(α)·Sy(β)·Sx(α) with
    α = -tan(θ/2), β = sin θ — three exact single-axis bilinear passes
    (each u8-rounded, i.e. equivalent to composing the three host
    ``_affine`` shears) instead of one 2-D resample.

    Documented deviation from the host's single-resample ``_rotate``: the
    geometry is identical (the matrices compose to exactly [co,-si;si,co])
    but interpolation happens per pass, so pixel values differ the way two
    classic rotation algorithms differ. The reference consumes offline-
    preprocessed tensors (SURVEY §2.4), so resampling backends are free;
    this one runs ~15x faster under vmap than the gather warp."""
    d = min(max(_concrete_reach(deg, 30.0), 1e-3), 80.0)
    r = jnp.asarray(deg, jnp.float32) * (math.pi / 180.0)
    alpha, beta = -jnp.tan(r / 2.0), jnp.sin(r)
    h, w = img.shape[:2]
    rad = math.radians(d)
    sx = _s_bound(math.tan(rad / 2.0) * (h - 1) / 2.0)
    sy = _s_bound(math.sin(rad) * (w - 1) / 2.0)
    out = _q8(_warp_x(img, alpha, 0.0, sx))
    out = _q8(_warp_y(out, beta, 0.0, sy))
    return _q8(_warp_x(out, alpha, 0.0, sx))


def _identity(img, _v):
    return img


def _lvl(lo, hi):
    return lambda m: lo + (hi - lo) * (m / 10.0)


# Same table as augment.RAND_AUGMENT_OPS (timm rand-m9-mstd0.5 ranges);
# order must match the host's dict order so op indices mean the same thing.
DEVICE_RAND_AUGMENT_OPS = (
    ("identity", _identity, _lvl(0, 0), False),
    ("autocontrast", _autocontrast, _lvl(0, 0), False),
    ("equalize", _equalize, _lvl(0, 0), False),
    ("posterize", _posterize, _lvl(8, 4), False),
    ("solarize", _solarize, _lvl(256, 0), False),
    ("brightness", _brightness, _lvl(1.0, 1.9), True),
    ("contrast", _contrast, _lvl(1.0, 1.9), True),
    ("color", _color, _lvl(1.0, 1.9), True),
    ("sharpness", _sharpness, _lvl(1.0, 1.9), True),
    ("shear_x", _shear_x, _lvl(0.0, 0.3), True),
    ("shear_y", _shear_y, _lvl(0.0, 0.3), True),
    ("translate_x", _translate_x, _lvl(0.0, 0.45), True),
    ("translate_y", _translate_y, _lvl(0.0, 0.45), True),
    ("rotate", _rotate, _lvl(0.0, 30.0), True),
)
_ENHANCE_IDX = {5, 6, 7, 8}  # brightness/contrast/color/sharpness
_GEOM_BASE = 9  # table rows [9:] are geometric — fused warp, not switch


def _geom_apply(img, op_idx, m, sign):
    """All five geometric RandAugment ops as ONE shared 3-pass separable
    warp, selected by traced per-image *parameters* instead of branches.

    Why: under vmap, ``lax.switch`` runs every branch for every image, so
    five warp branches cost five warps. Shears and translations are
    single-axis maps; Paeth-factored rotation is xpass·ypass·xpass — so
    one (xpass, ypass, xpass) chain with op-selected (slope, const) per
    pass covers all five (unused passes get zero parameters = exact
    identity, and u8 re-rounding an already-u8 image is a no-op, so pure
    shears/translations still match host ``_affine`` exactly)."""
    h, w = img.shape[:2]
    g = op_idx - _GEOM_BASE  # 0 shear_x, 1 shear_y, 2 tx, 3 ty, 4 rotate
    lv = [DEVICE_RAND_AUGMENT_OPS[_GEOM_BASE + i][2](m) for i in range(5)]

    def sgn(v):
        return jnp.where(sign, -v, v)

    shx, shy = sgn(lv[0]), sgn(lv[1])
    txv, tyv = sgn(lv[2]), sgn(lv[3])
    r = sgn(lv[4]) * (math.pi / 180.0)
    alpha, beta = -jnp.tan(r / 2.0), jnp.sin(r)
    is_ = [g == i for i in range(5)]
    k1 = jnp.where(is_[0], -shx, 0.0) + jnp.where(is_[4], alpha, 0.0)
    t1 = jnp.where(is_[2], -txv * w, 0.0)
    k2 = jnp.where(is_[1], -shy, 0.0) + jnp.where(is_[4], beta, 0.0)
    t2 = jnp.where(is_[3], -tyv * h, 0.0)
    k3 = jnp.where(is_[4], alpha, 0.0)
    s1 = _s_bound(max(0.3 * (h - 1) / 2.0, _TAN15 * (h - 1) / 2.0,
                      0.45 * w))
    s2 = _s_bound(max(0.3 * (w - 1) / 2.0, _SIN30 * (w - 1) / 2.0,
                      0.45 * h))
    s3 = _s_bound(_TAN15 * (h - 1) / 2.0)
    out = _q8(_warp_x(img, k1, t1, s1))
    out = _q8(_warp_y(out, k2, t2, s2))
    return _q8(_warp_x(out, k3, 0.0, s3))


def _rand_augment_one(img, key, num_ops: int, magnitude: float,
                      magnitude_std: float):
    """Apply ``num_ops`` randomly drawn ops to one f32 [0,255] image:
    pointwise ops via ``lax.switch`` (all branches static-shape and cheap
    — vmap runs them ALL, see :func:`_geom_apply`), geometric ops via the
    shared parameter-selected warp."""
    n = len(DEVICE_RAND_AUGMENT_OPS)

    branches = []
    for i, (_, op, lvl, signed) in enumerate(
            DEVICE_RAND_AUGMENT_OPS[:_GEOM_BASE]):
        def branch(img, m, sign, op=op, lvl=lvl, signed=signed, i=i):
            v = lvl(m)
            if signed:
                if i in _ENHANCE_IDX:
                    # timm mirrors enhance factors around identity 1.0
                    v = jnp.where(sign, 2.0 - v, v)
                else:
                    v = jnp.where(sign, -v, v)
            return op(img, v)
        branches.append(branch)

    for j in range(num_ops):
        k_op, k_m, k_sign, key = jax.random.split(key, 4)
        op_idx = jax.random.randint(k_op, (), 0, n)
        m = jnp.asarray(magnitude, jnp.float32)
        if magnitude_std > 0:
            m = jnp.clip(
                magnitude + magnitude_std * jax.random.normal(k_m), 0.0, 10.0)
        sign = jax.random.bernoulli(k_sign)
        pw = jax.lax.switch(jnp.minimum(op_idx, _GEOM_BASE - 1), branches,
                            img, m, sign)
        geo = _geom_apply(img, op_idx, m, sign)
        img = jnp.where(op_idx >= _GEOM_BASE, geo, pw)
    return img


# ---------------------------------------------------------------------------
# RandomResizedCrop: traced crop box + coordinate-gather bilinear resize
# ---------------------------------------------------------------------------


def _rrc_box(key, h: int, w: int, scale, ratio, attempts: int = 10):
    """torchvision RandomResizedCrop box sampling, vectorized over the 10
    attempts (draw all, take the FIRST valid; fall back to the host's
    center crop — for the square sources this loader ships, the full
    image). Returns traced (top, left, ch, cw) int32."""
    k_area, k_aspect, k_top, k_left = jax.random.split(key, 4)
    area = float(h * w)
    ta = area * jax.random.uniform(
        k_area, (attempts,), minval=scale[0], maxval=scale[1])
    log_r = (math.log(ratio[0]), math.log(ratio[1]))
    aspect = jnp.exp(jax.random.uniform(
        k_aspect, (attempts,), minval=log_r[0], maxval=log_r[1]))
    cw = jnp.round(jnp.sqrt(ta * aspect)).astype(jnp.int32)
    ch = jnp.round(jnp.sqrt(ta / aspect)).astype(jnp.int32)
    valid = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
    first = jnp.argmax(valid)  # first True (0 if none — guarded below)
    any_valid = valid.any()
    cw_s, ch_s = cw[first], ch[first]
    u_t = jax.random.uniform(k_top, (attempts,))[first]
    u_l = jax.random.uniform(k_left, (attempts,))[first]
    top = jnp.floor(u_t * (h - ch_s + 1).astype(jnp.float32)).astype(
        jnp.int32)
    left = jnp.floor(u_l * (w - cw_s + 1).astype(jnp.float32)).astype(
        jnp.int32)
    # Host fallback (center crop at nearest in-range ratio); square inputs
    # make it the full image, but compute the general form statically.
    in_ratio = w / h
    if in_ratio < ratio[0]:
        fw, fh = w, min(h, int(round(w / ratio[0])))
    elif in_ratio > ratio[1]:
        fw, fh = min(w, int(round(h * ratio[1]))), h
    else:
        fw, fh = w, h
    ftop, fleft = (h - fh) // 2, (w - fw) // 2
    top = jnp.where(any_valid, top, ftop)
    left = jnp.where(any_valid, left, fleft)
    ch_s = jnp.where(any_valid, ch_s, fh)
    cw_s = jnp.where(any_valid, cw_s, fw)
    return top, left, ch_s, cw_s


def _cr_weights(start, c, out_size: int, n: int):
    """[out_size, n] bilinear resampling matrix for one axis of a (traced)
    crop box: row u holds (1-f) at clip(start + floor(s), ...) and f at
    the next source sample — align_corners=False, coords clipped to the
    crop interior exactly like the gather formulation it replaces."""
    u = jnp.arange(out_size, dtype=jnp.float32)
    s = (u + 0.5) * c.astype(jnp.float32) / out_size - 0.5
    s0 = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, c - 1)
    s1 = jnp.clip(s0 + 1, 0, c - 1)
    f = jnp.clip(s - s0, 0.0, 1.0)[:, None]
    i = jnp.arange(n, dtype=jnp.int32)[None, :]
    a0 = jnp.clip(start + s0, 0, n - 1)[:, None]
    a1 = jnp.clip(start + s1, 0, n - 1)[:, None]
    return (i == a0) * (1.0 - f) + (i == a1) * f


def _crop_resize(img, top, left, ch, cw, out_size: int):
    """Bilinear resize of the (traced) crop box to ``out_size`` — the
    device twin of host crop-slice + ``_resize_bilinear_np``
    (align_corners=False; sample coords clipped to the crop interior).

    TPU-shaped: the resample is two one-hot matmuls over the FULL source
    axes (rows then columns) riding the MXU — identical arithmetic to the
    4-tap gather up to fp32 dot order, ~1.5x faster under vmap and immune
    to the point-gather lowering."""
    h, w = img.shape[:2]
    img = img.astype(jnp.float32)
    wy = _cr_weights(top, ch, out_size, h)
    wx = _cr_weights(left, cw, out_size, w)
    t = jnp.einsum("oh,hwc->owc", wy, img,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,owc->opc", wx, t,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# The composed per-image pipeline + the public batched entry point
# ---------------------------------------------------------------------------


def _augment_one(img, key, *, img_size, rrc_scale, rrc_ratio, hflip,
                 randaugment, magnitude_std):
    k_box, k_flip, k_ra = jax.random.split(key, 3)
    h, w = img.shape[:2]
    top, left, ch, cw = _rrc_box(k_box, h, w, rrc_scale, rrc_ratio)
    out = _crop_resize(img, top, left, ch, cw, img_size)
    if hflip > 0.0:
        do = jax.random.uniform(k_flip) < hflip
        out = jnp.where(do, out[:, ::-1], out)
    if randaugment is not None:
        out = _rand_augment_one(_q8(out), k_ra, int(randaugment[0]),
                                float(randaugment[1]), magnitude_std)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("img_size", "rrc_scale", "rrc_ratio", "hflip",
                     "randaugment", "magnitude_std", "mean", "std"))
def device_augment(
    images: jnp.ndarray,
    key: jax.Array,
    *,
    img_size: int = 224,
    rrc_scale: Tuple[float, float] = (0.08, 1.0),
    rrc_ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    hflip: float = 0.5,
    randaugment: Optional[Tuple[int, float]] = (2, 9.0),
    magnitude_std: float = 0.5,
    mean: Optional[Tuple[float, ...]] = None,
    std: Optional[Tuple[float, ...]] = None,
) -> jnp.ndarray:
    """RandomResizedCrop → flip → RandAugment → normalize for a whole
    **uint8 HWC batch** [B, H, W, 3] on device → NCHW fp32 [B, 3, S, S].

    One jitted program, vmapped over the batch with per-image key folds;
    pair with :func:`..augment.device_mixup_cutmix` for the full on-chip
    DeiT recipe. ``Trainer(device_augment=...)`` fuses it into the
    training step so the host loader ships only raw uint8 pixels.
    """
    if images.dtype != jnp.uint8 or images.ndim != 4 \
            or images.shape[-1] != 3:
        raise ValueError(
            "device_augment takes raw uint8 HWC batches [B, H, W, 3]; got "
            f"{images.dtype} {images.shape}")
    keys = jax.random.split(key, images.shape[0])
    fn = functools.partial(
        _augment_one, img_size=img_size, rrc_scale=rrc_scale,
        rrc_ratio=rrc_ratio, hflip=hflip, randaugment=randaugment,
        magnitude_std=magnitude_std)
    out = jax.vmap(fn)(images, keys)  # [B, S, S, 3] f32 in [0, 255]
    mean_v = jnp.asarray(mean if mean is not None else IMAGENET_MEAN,
                         jnp.float32) * 255.0
    std_v = jnp.asarray(std if std is not None else IMAGENET_STD,
                        jnp.float32) * 255.0
    out = (out - mean_v) / std_v
    return out.transpose(0, 3, 1, 2)


def raw_batches(
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    *,
    epochs: Optional[int] = 1,
    seed: int = 0,
    drop_last: bool = True,
):
    """The loader that pairs with :func:`device_augment`: shuffle + slice
    only — the host's entire per-step cost is one uint8 gather (~0.1
    ms/batch vs ~4 ms/IMAGE for the host pixel pipeline). Yields
    ``(uint8 HWC batch, int labels)``; feed through ``DevicePrefetcher``
    and a Trainer configured with ``device_augment=``/``mixup=``."""
    n = images.shape[0]
    if images.dtype != np.uint8:
        raise ValueError(f"raw_batches ships uint8 (got {images.dtype}); "
                         "3x less host->device traffic than fp32")
    epoch = 0
    while epochs is None or epoch < epochs:
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(n)
        stop = n - batch_size + 1 if drop_last else n
        for lo in range(0, max(stop, 0), batch_size):
            idx = order[lo:lo + batch_size]
            yield images[idx], labels[idx]
        epoch += 1
