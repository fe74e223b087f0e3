"""Severity-graded distortion bank (x_distortion parity).

Counterpart of the reference's data/degradation_toolkit/x_distortion/ package
(~1133 LoC over blur/noise/compression/brightness/contrast/saturate/
oversharpen/pixelate/quantization/spatter modules): 36 distortion subtypes,
each parameterized by a severity-1..5 table, grouped into the 13 family keys
the training data synthesizer draws from (ref x_distortion/__init__.py:50-113
``distortions_dict``; draw protocol ref degradation_utils.py:83-97).

The SEVERITY_TABLES values are interop constants copied number-for-number
from the reference tables (which themselves cite KADID-10K / Imagecorruptions
/ PieAPP) — restoration-task training parity requires the same severity
spread. The *implementations* are this package's own: vectorized numpy + cv2
+ PIL, no skimage/numba, and randomness always flows through an explicit
np.random.Generator so the data pipeline stays deterministic and resumable.

All functions take/return uint8 RGB (H, W, 3).
"""

from __future__ import annotations

import io

import cv2
import numpy as np
from PIL import Image, ImageEnhance

Array = np.ndarray

# ------------------------------------------------------------------
# severity tables — one entry per reference table, in source order
# (multi-table subtypes keep one row per table; tests compare these
# against the reference modules' AST, key-for-key)
# ------------------------------------------------------------------

SEVERITY_TABLES: dict[str, list[list]] = {
    # blur.py
    "blur_gaussian": [[1, 2, 3, 4, 5]],
    "blur_motion": [[(5, 3), (10, 5), (15, 7), (15, 9), (20, 12)]],
    "blur_glass": [[(0.7, 1, 1), (0.9, 2, 1), (1.2, 2, 2), (1.4, 3, 2), (1.6, 4, 2)]],
    "blur_lens": [[2, 3, 4, 6, 8]],
    "blur_zoom": [[
        np.arange(1, 1.03, 0.02),
        np.arange(1, 1.06, 0.02),
        np.arange(1, 1.10, 0.02),
        np.arange(1, 1.15, 0.02),
        np.arange(1, 1.21, 0.02),
    ]],
    "blur_jitter": [[1, 2, 3, 4, 5]],
    # noise.py
    "noise_gaussian_RGB": [[0.05, 0.1, 0.15, 0.2, 0.25]],
    "noise_gaussian_YCrCb": [
        [0.05, 0.06, 0.07, 0.08, 0.09],
        [1, 1.45, 1.9, 2.35, 2.8],
        [1, 1.45, 1.9, 2.35, 2.8],
    ],
    "noise_speckle": [[0.14, 0.21, 0.28, 0.35, 0.42]],
    "noise_spatially_correlated": [[0.08, 0.11, 0.14, 0.18, 0.22]],
    "noise_poisson": [[80, 60, 40, 25, 15]],
    "noise_impulse": [[0.01, 0.03, 0.05, 0.07, 0.10]],
    # compression.py
    "compression_jpeg": [[25, 18, 12, 8, 5]],
    "compression_jpeg_2000": [[29, 27.5, 26, 24.5, 23]],
    # brightness.py (the "shfit" spelling is the reference's registry key)
    "brightness_brighten_shfit_HSV": [[0.1, 0.2, 0.3, 0.4, 0.5]],
    "brightness_brighten_shfit_RGB": [[0.1, 0.15, 0.2, 0.27, 0.35]],
    "brightness_brighten_gamma_RGB": [[0.8, 0.7, 0.6, 0.45, 0.3]],
    "brightness_brighten_gamma_HSV": [[0.7, 0.58, 0.47, 0.36, 0.25]],
    "brightness_darken_shfit_HSV": [[0.1, 0.2, 0.3, 0.4, 0.5]],
    "brightness_darken_shfit_RGB": [[0.1, 0.15, 0.2, 0.27, 0.35]],
    "brightness_darken_gamma_RGB": [[1.4, 1.7, 2.1, 2.6, 3.2]],
    "brightness_darken_gamma_HSV": [[1.5, 1.8, 2.2, 2.7, 3.5]],
    # contrast.py
    "contrast_weaken_scale": [[0.75, 0.6, 0.45, 0.3, 0.2]],
    "contrast_weaken_stretch": [[1.0, 0.9, 0.8, 0.6, 0.4]],
    "contrast_strengthen_scale": [[1.4, 1.7, 2.1, 2.6, 4.0]],
    "contrast_strengthen_stretch": [[2.0, 4.0, 6.0, 8.0, 10.0]],
    # saturate.py
    "saturate_weaken_HSV": [[0.7, 0.55, 0.4, 0.2, 0.0]],
    "saturate_weaken_YCrCb": [[0.6, 0.4, 0.2, 0.1, 0.0]],
    "saturate_strengthen_HSV": [[3.0, 6.0, 12.0, 20.0, 64.0]],
    "saturate_strengthen_YCrCb": [[2.0, 3.0, 5.0, 8.0, 16.0]],
    # oversharpen.py / pixelate.py
    "oversharpen": [[2, 2.8, 4, 6, 8]],
    "pixelate": [[0.5, 0.4, 0.3, 0.25, 0.2]],
    # quantization.py
    "quantization_otsu": [[15, 11, 8, 5, 3]],
    "quantization_median": [[20, 15, 10, 6, 3]],
    "quantization_hist": [[24, 16, 8, 6, 4]],
    # spatter.py — (loc, scale, blur_sigma, threshold, mix, mud_mode)
    "spatter": [[
        (0.65, 0.3, 4, 0.69, 0.6, 0),
        (0.65, 0.3, 3, 0.68, 0.6, 0),
        (0.65, 0.3, 2, 0.68, 0.5, 0),
        (0.65, 0.3, 1, 0.65, 1.5, 1),
        (0.67, 0.4, 1, 0.65, 1.5, 1),
    ]],
}

# family key -> subtype names (ref x_distortion/__init__.py:50-113)
DISTORTION_FAMILIES: dict[str, list[str]] = {
    "blur": [
        "blur_gaussian", "blur_motion", "blur_glass",
        "blur_lens", "blur_zoom", "blur_jitter",
    ],
    "noise": [
        "noise_gaussian_RGB", "noise_gaussian_YCrCb", "noise_speckle",
        "noise_spatially_correlated", "noise_poisson", "noise_impulse",
    ],
    "compression": ["compression_jpeg", "compression_jpeg_2000"],
    "brighten": [
        "brightness_brighten_shfit_HSV", "brightness_brighten_shfit_RGB",
        "brightness_brighten_gamma_HSV", "brightness_brighten_gamma_RGB",
    ],
    "darken": [
        "brightness_darken_shfit_HSV", "brightness_darken_shfit_RGB",
        "brightness_darken_gamma_HSV", "brightness_darken_gamma_RGB",
    ],
    "contrast_strengthen": ["contrast_strengthen_scale", "contrast_strengthen_stretch"],
    "contrast_weaken": ["contrast_weaken_scale", "contrast_weaken_stretch"],
    "saturate_strengthen": ["saturate_strengthen_HSV", "saturate_strengthen_YCrCb"],
    "saturate_weaken": ["saturate_weaken_HSV", "saturate_weaken_YCrCb"],
    "oversharpen": ["oversharpen"],
    "pixelate": ["pixelate"],
    "quantization": ["quantization_otsu", "quantization_median", "quantization_hist"],
    "spatter": ["spatter"],
}


def _tab(name: str, severity: int, which: int = 0):
    return SEVERITY_TABLES[name][which][severity - 1]


def _u8(x) -> Array:
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def _u8f(x01) -> Array:
    """float [0,1] -> uint8."""
    return _u8(np.asarray(x01, np.float64) * 255.0)


def _f01(img: Array) -> Array:
    return np.asarray(img, np.float64) / 255.0


def _gauss3(img01: Array, sigma: float) -> Array:
    """Per-channel gaussian filter on a float image, reflect borders (the
    skimage.filters.gaussian contract the reference tables were tuned on)."""
    k = 2 * int(4.0 * sigma + 0.5) + 1  # skimage's truncate=4.0 kernel extent
    return cv2.GaussianBlur(img01, (k, k), sigma, borderType=cv2.BORDER_REFLECT)


# ------------------------------------------------------------------
# blur family
# ------------------------------------------------------------------

def blur_gaussian(img: Array, severity: int = 1, rng=None) -> Array:
    return _u8f(_gauss3(_f01(img), _tab("blur_gaussian", severity)))


def blur_motion(img: Array, severity: int = 1, rng=None) -> Array:
    """Directional blur: a 1-D gaussian-weighted chain of shifted copies
    along a random angle in [-90, 90] (ref blur.py:53-70 + helper.py:139-156)."""
    rng = rng or np.random.default_rng()
    radius, sigma = _tab("blur_motion", severity)
    angle = float(rng.uniform(-90, 90))
    width = radius * 2 + 1
    taps = np.exp(-np.arange(width) ** 2 / (2.0 * sigma**2))
    taps /= taps.sum()
    dy_unit, dx_unit = np.sin(np.deg2rad(angle)), np.cos(np.deg2rad(angle))
    h, w = img.shape[:2]
    acc = np.zeros(img.shape, np.float64)
    ys, xs = np.arange(h), np.arange(w)
    for i, t in enumerate(taps):
        # edge-replicated integer shift along the motion direction
        dy = -int(np.ceil(i * dy_unit - 0.5))
        dx = -int(np.ceil(i * dx_unit - 0.5))
        if abs(dy) >= h or abs(dx) >= w:
            break
        acc += t * img[np.clip(ys - dy, 0, h - 1)][:, np.clip(xs - dx, 0, w - 1)]
    return _u8(acc)


def _local_shuffle(img: Array, shift: int, iterations: int, rng) -> Array:
    """Locally permute pixels by random offsets in [-shift, shift] (the
    glass-blur primitive; ref helper.py:160-171 does sequential swaps — a
    vectorized gather has the same local-scramble statistics)."""
    out = img
    h, w = img.shape[:2]
    for _ in range(iterations):
        dy = rng.integers(-shift, shift + 1, (h, w))
        dx = rng.integers(-shift, shift + 1, (h, w))
        ys = np.clip(np.arange(h)[:, None] + dy, 0, h - 1)
        xs = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
        out = out[ys, xs]
    return out


def blur_glass(img: Array, severity: int = 1, rng=None) -> Array:
    rng = rng or np.random.default_rng()
    sigma, shift, iters = _tab("blur_glass", severity)
    x = _gauss3(_f01(img), sigma)
    x = _local_shuffle(x, int(shift), int(iters), rng)
    return _u8f(_gauss3(x, sigma))


def blur_lens(img: Array, severity: int = 1, rng=None) -> Array:
    radius = _tab("blur_lens", severity)
    extent = max(radius, 8)  # ref helper.gen_disk pads small disks to 17x17
    g = np.arange(-extent, extent + 1)
    disk = ((g[:, None] ** 2 + g[None, :] ** 2) <= radius**2).astype(np.float32)
    disk /= disk.sum()
    return _u8f(np.clip(cv2.filter2D(_f01(img), -1, disk), 0, 1))


def blur_zoom(img: Array, severity: int = 1, rng=None) -> Array:
    factors = _tab("blur_zoom", severity)
    h, w = img.shape[:2]
    x = _f01(img)
    acc = x.copy()
    for f in factors:
        ch, cw = int(np.ceil(h / f)), int(np.ceil(w / f))
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        crop = x[y0 : y0 + ch, x0 : x0 + cw]
        z = cv2.resize(crop, (int(round(cw * f)), int(round(ch * f))),
                       interpolation=cv2.INTER_LINEAR)
        acc += z[:h, :w]
    return _u8f(np.clip(acc / (len(factors) + 1), 0, 1))


def blur_jitter(img: Array, severity: int = 1, rng=None) -> Array:
    rng = rng or np.random.default_rng()
    return _local_shuffle(img, int(_tab("blur_jitter", severity)), 1, rng)


# ------------------------------------------------------------------
# noise family
# ------------------------------------------------------------------

def noise_gaussian_RGB(img: Array, severity: int = 1, rng=None) -> Array:
    rng = rng or np.random.default_rng()
    sigma = _tab("noise_gaussian_RGB", severity)
    return _u8f(np.clip(_f01(img) + rng.normal(0, sigma, img.shape), 0, 1))


def noise_gaussian_YCrCb(img: Array, severity: int = 1, rng=None) -> Array:
    rng = rng or np.random.default_rng()
    sigma_l = _tab("noise_gaussian_YCrCb", severity, 0)
    ratio = _tab("noise_gaussian_YCrCb", severity, 1)
    h, w = img.shape[:2]
    ycc = cv2.cvtColor(np.float32(_f01(img)), cv2.COLOR_RGB2YCR_CB)
    sig = np.array([sigma_l, sigma_l * ratio, sigma_l * ratio])
    ycc = np.float32(ycc + rng.normal(0, 1, (h, w, 3)) * sig)
    return _u8f(np.clip(cv2.cvtColor(ycc, cv2.COLOR_YCR_CB2RGB), 0, 1))


def noise_speckle(img: Array, severity: int = 1, rng=None) -> Array:
    rng = rng or np.random.default_rng()
    sigma = _tab("noise_speckle", severity)
    x = _f01(img)
    return _u8f(np.clip(x * (1.0 + rng.normal(0, sigma, img.shape)), 0, 1))


def noise_spatially_correlated(img: Array, severity: int = 1, rng=None) -> Array:
    rng = rng or np.random.default_rng()
    sigma = _tab("noise_spatially_correlated", severity)
    x = _f01(img) + rng.normal(0, sigma, img.shape)
    return _u8f(np.clip(cv2.blur(x, (3, 3)), 0, 1))


def noise_poisson(img: Array, severity: int = 1, rng=None) -> Array:
    rng = rng or np.random.default_rng()
    c = _tab("noise_poisson", severity)
    return _u8f(np.clip(rng.poisson(_f01(img) * c) / float(c), 0, 1))


def noise_impulse(img: Array, severity: int = 1, rng=None) -> Array:
    rng = rng or np.random.default_rng()
    amount = _tab("noise_impulse", severity)
    out = img.copy()
    u = rng.random(img.shape[:2])
    out[u < amount / 2] = 0
    out[(u >= amount / 2) & (u < amount)] = 255
    return out


# ------------------------------------------------------------------
# compression family
# ------------------------------------------------------------------

def _pil_roundtrip(img: Array, fmt: str, **save_kwargs) -> Array:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, fmt, **save_kwargs)
    buf.seek(0)
    return np.array(Image.open(buf).convert("RGB"))


def compression_jpeg(img: Array, severity: int = 1, rng=None) -> Array:
    return _pil_roundtrip(img, "JPEG", quality=int(_tab("compression_jpeg", severity)))


def compression_jpeg_2000(img: Array, severity: int = 1, rng=None) -> Array:
    q = _tab("compression_jpeg_2000", severity)
    return _pil_roundtrip(img, "JPEG2000", quality_mode="dB", quality_layers=[q])


# ------------------------------------------------------------------
# brighten / darken family
# ------------------------------------------------------------------

def _v_shift(img: Array, delta: float) -> Array:
    hsv = cv2.cvtColor(np.float32(_f01(img)), cv2.COLOR_RGB2HSV)
    hsv[:, :, 2] += delta
    return _u8f(np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0, 1))


def _v_gamma(img: Array, gamma: float) -> Array:
    hsv = _f01(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    hsv[:, :, 2] = hsv[:, :, 2] ** gamma
    return cv2.cvtColor(_u8f(hsv), cv2.COLOR_HSV2RGB)


def brightness_brighten_shfit_HSV(img, severity=1, rng=None):
    return _v_shift(img, _tab("brightness_brighten_shfit_HSV", severity))


def brightness_brighten_shfit_RGB(img, severity=1, rng=None):
    return _u8f(np.clip(_f01(img) + _tab("brightness_brighten_shfit_RGB", severity), 0, 1))


def brightness_brighten_gamma_RGB(img, severity=1, rng=None):
    return _u8f(_f01(img) ** _tab("brightness_brighten_gamma_RGB", severity))


def brightness_brighten_gamma_HSV(img, severity=1, rng=None):
    return _v_gamma(img, _tab("brightness_brighten_gamma_HSV", severity))


def brightness_darken_shfit_HSV(img, severity=1, rng=None):
    return _v_shift(img, -_tab("brightness_darken_shfit_HSV", severity))


def brightness_darken_shfit_RGB(img, severity=1, rng=None):
    return _u8f(np.clip(_f01(img) - _tab("brightness_darken_shfit_RGB", severity), 0, 1))


def brightness_darken_gamma_RGB(img, severity=1, rng=None):
    return _u8f(_f01(img) ** _tab("brightness_darken_gamma_RGB", severity))


def brightness_darken_gamma_HSV(img, severity=1, rng=None):
    return _v_gamma(img, _tab("brightness_darken_gamma_HSV", severity))


# ------------------------------------------------------------------
# contrast family
# ------------------------------------------------------------------

def _contrast_scale(img: Array, factor: float) -> Array:
    return np.array(ImageEnhance.Contrast(Image.fromarray(img)).enhance(factor))


def _contrast_stretch(img: Array, c: float) -> Array:
    x = _f01(img)
    mean = x.mean(axis=(0, 1), keepdims=True)
    return _u8f(np.clip(1.0 / (1.0 + (mean / (x + 1e-12)) ** c), 0, 1))


def contrast_weaken_scale(img, severity=1, rng=None):
    return _contrast_scale(img, _tab("contrast_weaken_scale", severity))


def contrast_weaken_stretch(img, severity=1, rng=None):
    return _contrast_stretch(img, _tab("contrast_weaken_stretch", severity))


def contrast_strengthen_scale(img, severity=1, rng=None):
    return _contrast_scale(img, _tab("contrast_strengthen_scale", severity))


def contrast_strengthen_stretch(img, severity=1, rng=None):
    return _contrast_stretch(img, _tab("contrast_strengthen_stretch", severity))


# ------------------------------------------------------------------
# saturate family
# ------------------------------------------------------------------

def _sat_hsv(img: Array, scale: float) -> Array:
    hsv = np.float32(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    hsv[:, :, 1] *= scale
    return cv2.cvtColor(_u8(hsv), cv2.COLOR_HSV2RGB)


def _sat_ycrcb(img: Array, scale: float) -> Array:
    ycc = np.float32(cv2.cvtColor(img, cv2.COLOR_RGB2YCR_CB))
    ycc[:, :, 1:] = 128 + (ycc[:, :, 1:] - 128) * scale
    return cv2.cvtColor(_u8(ycc), cv2.COLOR_YCR_CB2RGB)


def saturate_weaken_HSV(img, severity=1, rng=None):
    return _sat_hsv(img, _tab("saturate_weaken_HSV", severity))


def saturate_weaken_YCrCb(img, severity=1, rng=None):
    return _sat_ycrcb(img, _tab("saturate_weaken_YCrCb", severity))


def saturate_strengthen_HSV(img, severity=1, rng=None):
    return _sat_hsv(img, _tab("saturate_strengthen_HSV", severity))


def saturate_strengthen_YCrCb(img, severity=1, rng=None):
    return _sat_ycrcb(img, _tab("saturate_strengthen_YCrCb", severity))


# ------------------------------------------------------------------
# oversharpen / pixelate
# ------------------------------------------------------------------

def oversharpen(img: Array, severity: int = 1, rng=None) -> Array:
    amount = _tab("oversharpen", severity)
    blurred = cv2.GaussianBlur(img, (5, 5), 0)
    return cv2.addWeighted(img, 1 + amount, blurred, -amount, 0)


def pixelate(img: Array, severity: int = 1, rng=None) -> Array:
    c = _tab("pixelate", severity)
    h, w = img.shape[:2]
    small = Image.fromarray(img).resize((int(w * c), int(h * c)), Image.BOX)
    return np.array(small.resize((w, h), Image.NEAREST))


# ------------------------------------------------------------------
# quantization family
# ------------------------------------------------------------------

def _multi_otsu_thresholds(gray: Array, classes: int, nbins: int = 30) -> Array:
    """Multi-class Otsu: choose classes-1 bin boundaries maximizing
    between-class variance (sum of w_k * mu_k^2), via dynamic programming
    over the histogram. Stands in for skimage.threshold_multiotsu."""
    hist, edges = np.histogram(gray, bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2
    p = hist / max(hist.sum(), 1)
    cw = np.concatenate([[0.0], np.cumsum(p)])  # cumulative weight
    cm = np.concatenate([[0.0], np.cumsum(p * centers)])  # cumulative mass

    def seg_score(i, j):  # bins [i, j)
        w = cw[j] - cw[i]
        return 0.0 if w <= 0 else (cm[j] - cm[i]) ** 2 / w

    # best[k][j]: max score splitting bins [0, j) into k segments
    neg = -np.inf
    best = np.full((classes + 1, nbins + 1), neg)
    back = np.zeros((classes + 1, nbins + 1), np.int32)
    best[0, 0] = 0.0
    for k in range(1, classes + 1):
        for j in range(k, nbins + 1):
            scores = [best[k - 1, i] + seg_score(i, j) for i in range(k - 1, j)]
            i_best = int(np.argmax(scores)) + (k - 1)
            best[k, j] = scores[i_best - (k - 1)]
            back[k, j] = i_best
    cuts = []
    j = nbins
    for k in range(classes, 0, -1):
        j = int(back[k, j])
        if k > 1:
            cuts.append(edges[j])
    return np.array(sorted(cuts))


def quantization_otsu(img: Array, severity: int = 1, rng=None) -> Array:
    c = _tab("quantization_otsu", severity)
    x = np.asarray(img, np.float64)
    out = np.empty_like(x)
    for i in range(3):
        ch = x[:, :, i]
        th = _multi_otsu_thresholds(ch, classes=c, nbins=30)
        lo, hi = ch.min(), ch.max()
        out[:, :, i] = np.digitize(ch, bins=th) * (hi - lo) / c + lo
    return _u8(out)


def quantization_median(img: Array, severity: int = 1, rng=None) -> Array:
    c = _tab("quantization_median", severity)
    out = img.copy()
    for i in range(3):
        ch = Image.fromarray(img[:, :, i])
        q = ch.quantize(colors=c, method=Image.Quantize.MEDIANCUT).convert("L")
        out[:, :, i] = np.array(q)
    return out


def quantization_hist(img: Array, severity: int = 1, rng=None) -> Array:
    c = _tab("quantization_hist", severity)
    hist, _ = np.histogram(img.ravel(), bins=c, range=[0, 255])
    cdf = hist.cumsum().astype(np.float64)
    nz = cdf[cdf > 0]
    if nz.size == 0 or nz.max() == nz.min():
        lut = np.zeros(c, np.uint8)
    else:
        lut = _u8((cdf - nz.min()) * 255 / (nz.max() - nz.min()))
        lut[cdf == 0] = 0
    # NOTE: the round(v/255*(c-1)) lookup law does not match np.histogram's
    # floor binning — this mirrors the reference exactly (ref x_distortion/
    # quantization.py:60-66 uses the same mismatched pair), because the
    # synthesized training distribution must match, warts and all.
    idx = np.uint8(np.round(np.asarray(img, np.float64) / 255 * (c - 1)))
    return lut[idx]


# ------------------------------------------------------------------
# spatter
# ------------------------------------------------------------------

def spatter(img: Array, severity: int = 1, rng=None) -> Array:
    """Water droplets (mode 0) or mud splotches (mode 1) composited from a
    thresholded gaussian random field (ref spatter.py:8-73)."""
    rng = rng or np.random.default_rng()
    loc, scale, sigma, thresh, mix, mud = _tab("spatter", severity)
    x = _f01(img)
    field = rng.normal(loc, scale, img.shape[:2])
    field = _gauss3(field, sigma)
    if not mud:
        field[field < thresh] = 0
        f8 = _u8f(field)
        dist = cv2.distanceTransform(255 - cv2.Canny(f8, 50, 150), cv2.DIST_L2, 5)
        dist = cv2.blur(np.minimum(dist, 20), (3, 3)).astype(np.uint8)
        dist = cv2.equalizeHist(dist)
        emboss = np.array([[-2, -1, 0], [-1, 1, 1], [0, 1, 2]], np.float32)
        dist = cv2.blur(cv2.filter2D(dist, cv2.CV_8U, emboss), (3, 3)).astype(np.float64)
        m = field * dist
        m /= max(m.max(), 1e-12)
        m *= mix
        water = np.array([175, 238, 238]) / 255.0  # pale turquoise
        return _u8f(np.clip(x + m[:, :, None] * water, 0, 1))
    m = (field > thresh).astype(np.float64)
    m = _gauss3(m, mix)
    m[m < 0.8] = 0
    mud_color = np.array([63, 42, 20]) / 255.0  # mud brown
    out = x * (1 - m[:, :, None]) + m[:, :, None] * mud_color
    return _u8f(np.clip(out, 0, 1))


# ------------------------------------------------------------------
# dispatch
# ------------------------------------------------------------------

SUBTYPES = {name: globals()[name] for fam in DISTORTION_FAMILIES.values() for name in fam}

# compression/quantization severities are capped at 3 when synthesizing
# training pairs (ref degradation_utils.py:86-88)
_SEVERITY_CAP = {"compression": 3, "quantization": 3}


def add_x_distortion(
    img: Array, family: str, rng: np.random.Generator | None = None,
    severity: int | None = None, subtype: str | None = None,
) -> Array:
    """Draw (severity, subtype) like the reference and apply the distortion
    (ref degradation_utils.add_x_distortion_single_images:83-97)."""
    rng = rng or np.random.default_rng()
    if family not in DISTORTION_FAMILIES:
        raise KeyError(f"unknown x_distortion family {family!r}")
    if severity is None:
        severity = int(rng.integers(1, 6))
    severity = min(severity, _SEVERITY_CAP.get(family, 5))
    if subtype is None:
        names = DISTORTION_FAMILIES[family]
        subtype = names[int(rng.integers(0, len(names)))]
    return SUBTYPES[subtype](img, severity, rng)
