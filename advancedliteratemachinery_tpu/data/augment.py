"""STR training augmentation suite (host-side).

Behavioral parity target: MGP-STR's augmentation package
(reference OCR/MGP-STR/augmentation/{warp,geometry,pattern,noise,blur,
camera,weather,process}.py and the DataAugment selector dataset.py:261-345):
the same 8 op groups with the same names and the same magnitude convention
(mag ∈ {0,1,2}), and a `RandAugment` mirroring `rand_aug` (pick N groups
without replacement, one op per group, random magnitude).

Ops take and return PIL images (the reference's convention); the batch
pipeline converts once at collate time.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image, ImageEnhance, ImageOps


def _np(img: Image.Image) -> np.ndarray:
    return np.asarray(img).astype(np.float32) / 255.0


def _pil(arr: np.ndarray) -> Image.Image:
    return Image.fromarray(np.uint8(np.clip(arr, 0, 1) * 255))


def _rng(rng):
    return rng if rng is not None else np.random.default_rng()


class _Op:
    def __call__(self, img: Image.Image, mag: int = -1,
                 rng: Optional[np.random.Generator] = None) -> Image.Image:
        raise NotImplementedError


# ---------------- warp ----------------


def _tps_fit(ctrl: np.ndarray, target: np.ndarray) -> tuple:
    """Fit a thin-plate spline f with f(ctrl_i) = target_i (per axis).
    Kernel U(r) = r^2 log r^2 (OpenCV ThinPlateSplineShapeTransformer
    convention; any constant scaling of U yields the same interpolant)."""
    N = len(ctrl)
    d2 = ((ctrl[:, None, :] - ctrl[None, :, :]) ** 2).sum(-1)
    K = np.where(d2 > 0, d2 * np.log(np.maximum(d2, 1e-12)), 0.0)
    P = np.concatenate([np.ones((N, 1)), ctrl], axis=1)
    L = np.zeros((N + 3, N + 3))
    L[:N, :N] = K
    L[:N, N:] = P
    L[N:, :N] = P.T
    Y = np.zeros((N + 3, 2))
    Y[:N] = target
    Wmat = np.linalg.solve(L + 1e-9 * np.eye(N + 3), Y)
    return Wmat[:N], Wmat[N:]


def _tps_backward_warp(arr: np.ndarray, dst_pts, src_pts) -> np.ndarray:
    """Reference warp.py semantics: tps.estimateTransformation(dst, src) +
    warpImage — each output pixel p samples the input at f(p) where
    f(dst_i) = src_i; bilinear, zero border (cv2 warpImage default)."""
    dst = np.asarray(dst_pts, np.float64)
    src = np.asarray(src_pts, np.float64)
    w_coef, a_coef = _tps_fit(dst, src)
    H, W = arr.shape[:2]
    ys, xs = np.mgrid[0:H, 0:W]
    pts = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float64)
    d2 = ((pts[:, None, :] - dst[None, :, :]) ** 2).sum(-1)
    U = np.where(d2 > 0, d2 * np.log(np.maximum(d2, 1e-12)), 0.0)
    mapped = U @ w_coef + np.concatenate(
        [np.ones((len(pts), 1)), pts], axis=1) @ a_coef
    sx = mapped[:, 0].reshape(H, W)
    sy = mapped[:, 1].reshape(H, W)
    x0 = np.floor(sx)
    y0 = np.floor(sy)
    fx = sx - x0
    fy = sy - y0
    img = arr.astype(np.float64)
    if img.ndim == 2:
        img = img[..., None]
    out = np.zeros((H, W, img.shape[2]), np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = (x0 + dx).astype(int)
            yi = (y0 + dy).astype(int)
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            xi = np.clip(xi, 0, W - 1)
            yi = np.clip(yi, 0, H - 1)
            out += (wgt * valid)[..., None] * img[yi, xi]
    out = np.clip(np.rint(out), 0, 255).astype(arr.dtype)
    return out[..., 0] if arr.ndim == 2 else out


class Curve(_Op):
    """Faithful port of warp.py:164 — fisheye-style TPS control-point
    bend on a square canvas, random vertical flip, crop of the curved
    half, resize back."""

    side = 224

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        W, H = img.size
        side = self.side
        if H != side or W != side:
            img = img.resize((side, side), Image.BICUBIC)
        isflip = rng.uniform(0, 1) > 0.5
        if isflip:
            img = ImageOps.flip(img)

        arr = np.asarray(img)
        w = h = side
        w_25, w_50, w_75 = 0.25 * w, 0.50 * w, 0.75 * w
        b = [1.1, .95, .8]
        index = mag if 0 <= mag < len(b) else 0
        rmin = b[index]

        r = rng.uniform(rmin, rmin + .1) * h
        x1 = (r ** 2 - w_50 ** 2) ** 0.5
        h1 = r - x1
        t = rng.uniform(0.4, 0.5) * h
        w2 = w_50 * t / r
        hi = x1 * t / r
        h2 = h1 + hi
        sinb_2 = ((1 - x1 / r) / 2) ** 0.5
        cosb_2 = ((1 + x1 / r) / 2) ** 0.5
        w3 = w_50 - r * sinb_2
        h3 = r - r * cosb_2
        w4 = w_50 - (r - t) * sinb_2
        h4 = r - (r - t) * cosb_2
        w5 = 0.5 * w2
        h5 = h1 + 0.5 * hi
        h_50 = 0.50 * h

        srcpt = [(0, 0), (w, 0), (w_50, 0), (0, h), (w, h), (w_25, 0),
                 (w_75, 0), (w_50, h), (w_25, h), (w_75, h), (0, h_50),
                 (w, h_50)]
        dstpt = [(0, h1), (w, h1), (w_50, 0), (w2, h2), (w - w2, h2),
                 (w3, h3), (w - w3, h3), (w_50, t), (w4, h4), (w - w4, h4),
                 (w5, h5), (w - w5, h5)]
        arr = _tps_backward_warp(arr, dstpt, srcpt)
        img = Image.fromarray(arr)
        if isflip:
            img = ImageOps.flip(img)
            rect = (0, side // 2, side, side)
        else:
            rect = (0, 0, side, side // 2)
        img = img.crop(rect)
        return img.resize((W, H), Image.BICUBIC)


class Distort(_Op):
    """Faithful port of warp.py:82 — 8 border control points jittered by
    frac, TPS backward warp."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        W, H = img.size
        arr = np.asarray(img)
        W_33, W_66 = 0.33 * W, 0.66 * W
        H_50 = 0.50 * H
        P = 0
        b = [.2, .3, .4]
        frac = b[mag] if 0 <= mag < len(b) else b[-1]

        srcpt, dstpt = [], []
        for (sx, sy, xlo, xhi, ylo, yhi) in [
            (P, P, 0, frac, 0, frac),
            (P + W_33, P, -frac, frac, 0, frac),
            (P + W_66, P, -frac, frac, 0, frac),
            (W - P, P, -frac, 0, 0, frac),
            (P, H - P, 0, frac, -frac, 0),
            (P + W_33, H - P, -frac, frac, -frac, 0),
            (P + W_66, H - P, -frac, frac, -frac, 0),
            (W - P, H - P, -frac, 0, -frac, 0),
        ]:
            srcpt.append([sx, sy])
            x = rng.uniform(xlo, xhi) * W_33
            y = rng.uniform(ylo, yhi) * H_50
            dstpt.append([sx + x, sy + y])
        arr = _tps_backward_warp(arr, dstpt, srcpt)
        return Image.fromarray(arr)


class Stretch(_Op):
    """Faithful port of warp.py:10 — 4 vertical anchor lines shifted
    horizontally by frac, TPS backward warp."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        W, H = img.size
        arr = np.asarray(img)
        W_33, W_66 = 0.33 * W, 0.66 * W
        H_50 = 0.50 * H
        P = 0
        b = [.2, .3, .4]
        frac = b[mag] if 0 <= mag < len(b) else b[-1]

        srcpt, dstpt = [], []
        # left-most (3 pts), two middles (2 pts each), right-most (3 pts)
        x = rng.uniform(0, frac) * W_33
        for sy in (P, H - P, H_50):
            srcpt.append([P, sy])
            dstpt.append([P + x, sy])
        x = rng.uniform(-frac, frac) * W_33
        for sy in (P, H - P):
            srcpt.append([P + W_33, sy])
            dstpt.append([P + W_33 + x, sy])
        x = rng.uniform(-frac, frac) * W_33
        for sy in (P, H - P):
            srcpt.append([P + W_66, sy])
            dstpt.append([P + W_66 + x, sy])
        x = rng.uniform(-frac, 0) * W_33
        for sy in (P, H - P, H_50):
            srcpt.append([W - P, sy])
            dstpt.append([W - P + x, sy])
        arr = _tps_backward_warp(arr, dstpt, srcpt)
        return Image.fromarray(arr)


# ---------------- geometry ----------------


class Rotate(_Op):
    """geometry.py:84 — resize to a 224 square, rotate by U[b-10, b) with
    random sign (b = 10/20/30), expand=True, resize back."""

    side = 224

    def __call__(self, img, mag=-1, rng=None, iscurve: bool = False):
        rng = _rng(rng)
        W, H = img.size
        if H != self.side or W != self.side:
            img = img.resize((self.side, self.side), Image.BICUBIC)
        b = [10.0, 20.0, 30.0][mag % 3]
        angle = float(rng.uniform(b - 10, b))
        if rng.uniform(0, 1) < 0.5:
            angle = -angle
        img = img.rotate(angle=angle, resample=Image.BICUBIC,
                         expand=not iscurve)
        return img.resize((W, H), Image.BICUBIC)


class Perspective(_Op):
    """geometry.py:118 — tilt one side: the chosen side's top corner moves
    down to U[low, low+0.1)·H and its bottom corner up to U[high-0.1,
    high)·H (low = 0.1/0.2/0.3)."""

    def __call__(self, img, mag=-1, rng=None):
        import cv2

        rng = _rng(rng)
        W, H = img.size
        low = [0.1, 0.2, 0.3][mag % 3]
        high = 1 - low
        src = np.float32([[0, 0], [W, 0], [0, H], [W, H]])
        if rng.uniform(0, 1) > 0.5:
            top = rng.uniform(low, low + 0.1) * H
            bot = rng.uniform(high - 0.1, high) * H
            dst = np.float32([[0, 0], [W, top], [0, H], [W, bot]])
        else:
            top = rng.uniform(low, low + 0.1) * H
            bot = rng.uniform(high - 0.1, high) * H
            dst = np.float32([[0, top], [W, 0], [0, bot], [W, H]])
        M = cv2.getPerspectiveTransform(src, dst)
        return Image.fromarray(
            cv2.warpPerspective(np.asarray(img), M, (W, H)))


class Shrink(_Op):
    """geometry.py:10 — TPS contraction: outer border control points move
    inward by U[frac-0.1, frac)·(W/3, H/2) (frac = 0.2/0.3/0.4), then a
    random absolute X or Y translate by U[0, x|y) with random sign."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        W, H = img.size
        arr = np.asarray(img)
        W_33, W_66 = 0.33 * W, 0.66 * W
        H_50 = 0.50 * H
        P = 0
        frac = [0.2, 0.3, 0.4][mag % 3]
        x = rng.uniform(frac - 0.1, frac) * W_33
        y = rng.uniform(frac - 0.1, frac) * H_50

        srcpt = [[P, P], [P, H - P],
                 [P + W_33, P], [P + W_33, H - P],
                 [P + W_66, P], [P + W_66, H - P],
                 [W - P, P], [W - P, H - P]]
        dstpt = [[P + x, P + y], [P + x, H - P - y],
                 [P + W_33, P + y], [P + W_33, H - P - y],
                 [P + W_66, P + y], [P + W_66, H - P - y],
                 [W - P - x, P + y], [W - P - x, H - P - y]]
        arr = _tps_backward_warp(arr, dstpt, srcpt)
        img = Image.fromarray(arr)

        if rng.uniform(0, 1) < 0.5:
            v = rng.uniform(0, x)
            if rng.uniform(0, 1) > 0.5:
                v = -v
            img = img.transform(img.size, Image.AFFINE, (1, 0, v, 0, 1, 0))
        else:
            v = rng.uniform(0, y)
            if rng.uniform(0, 1) > 0.5:
                v = -v
            img = img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v))
        return img


# ---------------- pattern ----------------
# pattern.py: PIL line grids with line_width 1 and stripe = 3 - mag
# (higher magnitude = denser pattern); Rect/Ellipse grids are concentric
# outlines stepped by the same stripe spacing.


class VGrid(_Op):
    def __call__(self, img, mag=-1, rng=None):
        from PIL import ImageDraw

        img = img.copy()
        W, H = img.size
        line_width = 1
        stripe = max(3 - (mag % 3), 1)
        n_lines = W // (line_width + stripe) + 1
        draw = ImageDraw.Draw(img)
        for i in range(1, n_lines):
            x = stripe * i + line_width * (i - 1)
            draw.line([(x, 0), (x, H)], width=line_width, fill="black")
        return img


class HGrid(_Op):
    def __call__(self, img, mag=-1, rng=None):
        from PIL import ImageDraw

        img = img.copy()
        W, H = img.size
        line_width = 1
        stripe = max(3 - (mag % 3), 1)
        n_lines = H // (line_width + stripe) + 1
        draw = ImageDraw.Draw(img)
        for i in range(1, n_lines):
            y = stripe * i + line_width * (i - 1)
            draw.line([(0, y), (W, y)], width=line_width, fill="black")
        return img


class Grid(_Op):
    def __call__(self, img, mag=-1, rng=None):
        return HGrid()(VGrid()(img, mag=mag), mag=mag)


class RectGrid(_Op):
    isellipse = False

    def __call__(self, img, mag=-1, rng=None):
        from PIL import ImageDraw

        img = img.copy()
        W, H = img.size
        line_width = 1
        stripe = max(3 - (mag % 3), 1)
        offset = 4 if self.isellipse else 1
        n_lines = ((H // 2) // (line_width + stripe)) + offset
        draw = ImageDraw.Draw(img)
        xc, yc = W // 2, H // 2
        for i in range(1, n_lines):
            d = stripe * i + line_width * (i - 1)
            box = [(xc - d * W // H, yc - d), (xc + d * W / H, yc + d)]
            if self.isellipse:
                draw.ellipse(box, width=line_width, outline="black")
            else:
                draw.rectangle(box, width=line_width, outline="black")
        return img


class EllipseGrid(RectGrid):
    isellipse = True


# ---------------- noise ----------------


class GaussianNoise(_Op):
    """noise.py:11 — scale ~ U[a, a+0.03), a in (0.08, 0.10, 0.12)."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        a = [0.08, 0.10, 0.12][mag % 3]
        c = rng.uniform(a, a + 0.03)
        x = _np(img)
        return _pil(x + rng.normal(size=x.shape, scale=c))


class ShotNoise(_Op):
    """noise.py:33 — rate ~ U[a, a+7), a in (13, 8, 3); higher mag =
    FEWER photons = more noise."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        a = [13, 8, 3][mag % 3]
        c = rng.uniform(a, a + 7)
        x = _np(img)
        return _pil(rng.poisson(x * c) / float(c))


class ImpulseNoise(_Op):
    """noise.py:55 — salt & pepper, amount ~ U[a, a+0.04),
    a in (0.03, 0.07, 0.11) (sk.util.random_noise 's&p' semantics:
    half salt, half pepper over the amount fraction)."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        a = [0.03, 0.07, 0.11][mag % 3]
        c = rng.uniform(a, a + 0.04)
        x = _np(img)
        mask = rng.uniform(size=x.shape[:2]) < c
        salt = rng.uniform(size=x.shape[:2]) < 0.5
        x[mask & salt] = 1.0
        x[mask & ~salt] = 0.0
        return _pil(x)


class SpeckleNoise(_Op):
    """noise.py:76 — multiplicative gaussian, scale ~ U[a, a+0.05),
    a in (0.15, 0.20, 0.25)."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        a = [0.15, 0.20, 0.25][mag % 3]
        c = rng.uniform(a, a + 0.05)
        x = _np(img)
        return _pil(x + x * rng.normal(size=x.shape, scale=c))


# ---------------- blur ----------------


class GaussianBlur(_Op):
    """blur.py:17 — kernel size derived from the image (min(w,h)/2//4*2+1),
    sigma in (0.5, 1, 2)."""

    def __call__(self, img, mag=-1, rng=None):
        import cv2

        sigma = [0.5, 1.0, 2.0][mag % 3]
        w, h = img.size
        ksize = (int(min(w, h) / 2) // 4) * 2 + 1
        return Image.fromarray(cv2.GaussianBlur(
            np.asarray(img), (ksize, ksize), sigma))


def _disk_kernel(radius: float, alias_blur: float = 0.1) -> np.ndarray:
    """Anti-aliased disk (reference ops.py:24 disk): binary disk mask,
    normalized, then a small gaussian to soften the rim."""
    import cv2

    if radius <= 8:
        L = np.arange(-8, 9)
        ksize = (3, 3)
    else:
        L = np.arange(-radius, radius + 1)
        ksize = (5, 5)
    X, Y = np.meshgrid(L, L)
    d = ((X ** 2 + Y ** 2) <= radius ** 2).astype(np.float32)
    d /= d.sum()
    return cv2.GaussianBlur(d, ksize=ksize, sigmaX=alias_blur)


class DefocusBlur(_Op):
    """blur.py:41 — per-channel filter with the anti-aliased disk kernel,
    radii (2, 3, 4) at alias 0.1."""

    def __call__(self, img, mag=-1, rng=None):
        import cv2

        r, alias = [(2, 0.1), (3, 0.1), (4, 0.1)][mag % 3]
        x = _np(img)
        kernel = _disk_kernel(r, alias)
        if x.ndim == 2:
            return _pil(cv2.filter2D(x, -1, kernel))
        chans = [cv2.filter2D(x[:, :, d], -1, kernel)
                 for d in range(x.shape[2])]
        return _pil(np.stack(chans, axis=2))


class MotionBlur(_Op):
    """blur.py:83 — ImageMagick-style linear motion blur (radius, sigma)
    pairs (10,3)/(12,4)/(14,5) at a random -45..45 degree angle."""

    def __call__(self, img, mag=-1, rng=None):
        import cv2

        rng = _rng(rng)
        radius, sigma = [(10, 3), (12, 4), (14, 5)][mag % 3]
        kernel = _motion_blur_kernel(radius, sigma, float(rng.uniform(-45, 45)))
        return Image.fromarray(cv2.filter2D(np.asarray(img), -1, kernel))


class GlassBlur(_Op):
    """blur.py:116 — gaussian(sigma) → c2 sweeps of sequential random
    local pixel SWAPS (reverse scan order, exactly the reference's
    in-place semantics) → gaussian again."""

    def __call__(self, img, mag=-1, rng=None):
        import cv2

        rng = _rng(rng)
        sigma, d, iters = [(0.7, 1, 2), (0.75, 1, 2), (0.8, 1, 2)][mag % 3]
        arr = np.asarray(img)
        H, W = arr.shape[:2]
        blurred = cv2.GaussianBlur(arr.astype(np.float32), (0, 0), sigma)
        arr = np.uint8(np.clip(blurred, 0, 255))
        for _ in range(iters):
            # one draw per pixel, applied in the reference's reverse scan
            dxy = rng.integers(-d, d, size=(H, W, 2))
            for h in range(H - d, d, -1):
                for w in range(W - d, d, -1):
                    dx, dy = dxy[h, w]
                    hp, wp = h + dy, w + dx
                    arr[h, w], arr[hp, wp] = arr[hp, wp].copy(), arr[h, w].copy()
        out = cv2.GaussianBlur(arr.astype(np.float32) / 255.0, (0, 0), sigma)
        return _pil(out)


class ZoomBlur(_Op):
    """blur.py:149 — average of bicubic center zooms over the magnitude's
    zoom-factor ladder plus the original."""

    def __call__(self, img, mag=-1, rng=None):
        ladders = [np.arange(1, 1.11, .01), np.arange(1, 1.16, .01),
                   np.arange(1, 1.21, .02)]
        c = ladders[mag % 3]
        W, H = img.size
        x = _np(img)
        out = np.zeros_like(x)
        for z in c:
            ZW, ZH = int(W * z), int(H * z)
            zi = img.resize((ZW, ZH), Image.BICUBIC)
            x1, y1 = (ZW - W) // 2, (ZH - H) // 2
            zi = zi.crop((x1, y1, x1 + W, y1 + H))
            out += np.asarray(zi).astype(np.float32) / 255.0
        return _pil((x + out) / (len(c) + 1))


# ---------------- camera ----------------


class Contrast(_Op):
    """camera.py:14 — scale around the per-channel spatial mean,
    c = 0.4/0.3/0.2."""

    def __call__(self, img, mag=-1, rng=None):
        c = [0.4, 0.3, 0.2][mag % 3]
        x = _np(img)
        means = np.mean(x, axis=(0, 1), keepdims=True)
        return _pil((x - means) * c + means)


class Brightness(_Op):
    """camera.py:36 — add c to the HSV value channel, c = 0.1/0.2/0.3."""

    def __call__(self, img, mag=-1, rng=None):
        import cv2
        from PIL import ImageOps

        c = [0.1, 0.2, 0.3][mag % 3]
        isgray = len(img.getbands()) == 1
        x = _np(img)
        if x.ndim == 2:
            x = np.repeat(x[..., None], 3, axis=2)
        hsv = cv2.cvtColor(x, cv2.COLOR_RGB2HSV)
        hsv[:, :, 2] = np.clip(hsv[:, :, 2] + c, 0, 1)
        x = np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0, 1)
        out = _pil(x)
        return ImageOps.grayscale(out) if isgray else out


class JpegCompression(_Op):
    """camera.py:82 — quality ladder 25/18/15."""

    def __call__(self, img, mag=-1, rng=None):
        import io

        q = [25, 18, 15][mag % 3]
        buf = io.BytesIO()
        img.convert("RGB").save(buf, "JPEG", quality=q)
        return Image.open(buf).convert(img.mode)


class Pixelate(_Op):
    def __call__(self, img, mag=-1, rng=None):
        f = [0.6, 0.5, 0.4][mag % 3]
        w, h = img.size
        small = img.resize((max(1, int(w * f)), max(1, int(h * f))), Image.BOX)
        return small.resize((w, h), Image.BOX)


# ---------------- weather ----------------


def _plasma_fractal(rng, mapsize: int = 256, wibbledecay: float = 3.0
                    ) -> np.ndarray:
    """Diamond-square heightmap in [0, 1] (reference weather.py
    plasma_fractal — the Fog texture generator). mapsize power of two."""
    assert mapsize & (mapsize - 1) == 0
    arr = np.empty((mapsize, mapsize), np.float64)
    arr[0, 0] = 0
    step = mapsize
    wibble = 100.0

    def wmean(a):
        return a / 4 + wibble * rng.uniform(-wibble, wibble, a.shape)

    while step >= 2:
        # squares: center of each step-square = corner mean + wibble
        corner = arr[0:mapsize:step, 0:mapsize:step]
        acc = corner + np.roll(corner, -1, 0)
        acc = acc + np.roll(acc, -1, 1)
        arr[step // 2:mapsize:step, step // 2:mapsize:step] = wmean(acc)
        # diamonds: the two offset grids from square+corner neighbours
        dr = arr[step // 2:mapsize:step, step // 2:mapsize:step]
        ul = arr[0:mapsize:step, 0:mapsize:step]
        ldr = dr + np.roll(dr, 1, 0)
        lul = ul + np.roll(ul, -1, 1)
        arr[0:mapsize:step, step // 2:mapsize:step] = wmean(ldr + lul)
        tdr = dr + np.roll(dr, 1, 1)
        tul = ul + np.roll(ul, -1, 0)
        arr[step // 2:mapsize:step, 0:mapsize:step] = wmean(tdr + tul)
        step //= 2
        wibble /= wibbledecay
    arr -= arr.min()
    return arr / arr.max()


def _motion_blur_kernel(radius: int, sigma: float, angle_deg: float
                        ) -> np.ndarray:
    """Linear gaussian-weighted motion kernel (Wand motion_blur analog —
    the reference blurs the Snow layer via ImageMagick)."""
    L = max(int(radius) | 1, 3)
    k = np.zeros((L, L), np.float32)
    c = L // 2
    t = np.radians(angle_deg)
    for i in range(L):
        d = i - c
        x = int(round(c + d * np.cos(t)))
        y = int(round(c + d * np.sin(t)))
        if 0 <= x < L and 0 <= y < L:
            k[y, x] += np.exp(-(d ** 2) / (2 * max(sigma, 0.5) ** 2))
    return k / k.sum()


class Fog(_Op):
    """weather.py:14 — additive plasma-fractal fog then renormalize by
    max/(max + intensity)."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        c = [(1.5, 2.0), (2.0, 2.0), (2.5, 1.7)][mag % 3]
        x = _np(img)
        H, W = x.shape[:2]
        size = 256
        while size < max(H, W):
            size *= 2
        fog = c[0] * _plasma_fractal(rng, size, c[1])[:H, :W]
        if x.ndim == 3:
            fog = fog[..., None]
        max_val = x.max()
        x = x + fog
        return _pil(np.clip(x * max_val / (max_val + c[0]), 0, 1))


class Snow(_Op):
    """weather.py:95 — gaussian snow layer, thresholded, motion-blurred at
    a random -135..-45 angle, overlaid twice (original + 180-rotated) on a
    gray-lightened image."""

    def __call__(self, img, mag=-1, rng=None):
        import cv2

        rng = _rng(rng)
        c = [(0.1, 0.3, 3, 0.5, 10, 4, 0.8),
             (0.2, 0.3, 2, 0.5, 12, 4, 0.7),
             (0.55, 0.3, 4, 0.9, 12, 8, 0.7)][mag % 3]
        x = _np(img)
        if x.ndim == 2:
            x = np.repeat(x[..., None], 3, axis=2)
        H, W = x.shape[:2]
        layer = rng.normal(loc=c[0], scale=c[1], size=(H, W))
        layer[layer < c[3]] = 0
        layer = np.clip(layer, 0, 1).astype(np.float32)
        kern = _motion_blur_kernel(c[4], c[5], rng.uniform(-135, -45))
        layer = cv2.filter2D(layer, -1, kern)[..., None]
        gray = cv2.cvtColor(x.astype(np.float32),
                            cv2.COLOR_RGB2GRAY).reshape(H, W, 1)
        x = c[6] * x + (1 - c[6]) * np.maximum(x, gray * 1.5 + 0.5)
        x = np.clip(x + layer + np.rot90(layer, k=2), 0, 1)
        return _pil(x)


class Frost(_Op):
    """weather.py:48 — blend `c0*img + c1*frost_texture`. The reference
    samples six shipped frost photos (assets this zero-egress image cannot
    vendor); the texture here is a procedural plasma-fractal crystalline
    pattern with the same blend weights."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        c = [(1.0, 0.4), (0.8, 0.6), (0.7, 0.7)][mag % 3]
        x = _np(img)
        H, W = x.shape[:2]
        size = 256
        while size < max(H, W):
            size *= 2
        tex = _plasma_fractal(rng, size, 1.8)
        # random crop, like the reference's random texture-crop
        oy = int(rng.integers(0, size - H + 1))
        ox = int(rng.integers(0, size - W + 1))
        tex = tex[oy:oy + H, ox:ox + W]
        if x.ndim == 3:
            tex = tex[..., None]
        return _pil(np.clip(c[0] * x + c[1] * tex, 0, 1))


class Rain(_Op):
    """weather.py:150 — n~U[c, c+20) slanted streaks (slant U[-60,60) deg,
    length U[5,10), width U[1,2), fill 200) drawn with PIL."""

    def __call__(self, img, mag=-1, rng=None):
        from PIL import ImageDraw

        rng = _rng(rng)
        c = [50, 70, 90][mag % 3]
        img = img.copy()
        W, H = img.size
        isgray = len(img.getbands()) == 1
        line_width = int(rng.integers(1, 2))
        n_rains = int(rng.integers(c, c + 20))
        slant = int(rng.integers(-60, 60))
        fill = 200 if isgray else (200, 200, 200)
        draw = ImageDraw.Draw(img)
        for _ in range(1, n_rains):
            length = int(rng.integers(5, 10))
            x1 = int(rng.integers(0, max(1, W - length)))
            y1 = int(rng.integers(0, max(1, H - length)))
            x2 = int(x1 + length * math.sin(slant * math.pi / 180.0))
            y2 = int(y1 + length * math.cos(slant * math.pi / 180.0))
            draw.line([(x1, y1), (x2, y2)], width=line_width, fill=fill)
        return img


class Shadow(_Op):
    """weather.py:218 — black quad (corners in left/right halves, alpha
    U[c, c+32)) alpha-composited over the image."""

    def __call__(self, img, mag=-1, rng=None):
        from PIL import ImageDraw, ImageOps

        rng = _rng(rng)
        c = [64, 96, 128][mag % 3]
        W, H = img.size
        isgray = len(img.getbands()) == 1
        base = img.convert("RGBA")
        overlay = Image.new("RGBA", base.size, (255, 255, 255, 0))
        draw = ImageDraw.Draw(overlay)
        alpha = int(rng.integers(c, c + 32))
        pts = [(int(rng.integers(0, W // 2)), 0),
               (int(rng.integers(W // 2, W)), 0),
               (int(rng.integers(W // 2, W)), H - 1),
               (int(rng.integers(0, W // 2)), H - 1)]
        draw.polygon(pts, fill=(0, 0, 0, alpha))
        out = Image.alpha_composite(base, overlay).convert("RGB")
        return ImageOps.grayscale(out) if isgray else out


# ---------------- process ----------------


class Posterize(_Op):
    """process.py:6 — bits ~ randint[c, c+2), c = 1/3/6 (note: LOWER
    magnitude index = harsher posterization in the reference)."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        c = [1, 3, 6][mag % 3]
        bits = int(rng.integers(c, c + 2))
        return ImageOps.posterize(img.convert("RGB"), bits).convert(img.mode)


class Solarize(_Op):
    """process.py:26 — threshold ~ randint[c, c+64), c = 64/128/192."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        c = [64, 128, 192][mag % 3]
        thr = int(rng.integers(c, c + 64))
        return ImageOps.solarize(img.convert("RGB"), thr).convert(img.mode)


class Invert(_Op):
    def __call__(self, img, mag=-1, rng=None):
        return ImageOps.invert(img.convert("RGB")).convert(img.mode)


class Equalize(_Op):
    def __call__(self, img, mag=-1, rng=None):
        return ImageOps.equalize(img.convert("RGB")).convert(img.mode)


class AutoContrast(_Op):
    def __call__(self, img, mag=-1, rng=None):
        return ImageOps.autocontrast(img.convert("RGB")).convert(img.mode)


class Sharpness(_Op):
    """process.py:84 — enhance factor ~ U[c, c+0.6), c = 0.1/0.7/1.3."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        c = [0.1, 0.7, 1.3][mag % 3]
        return ImageEnhance.Sharpness(img).enhance(float(rng.uniform(c, c + 0.6)))


class Color(_Op):
    """process.py:104 — enhance factor ~ U[c, c+0.6), c = 0.1/0.7/1.3."""

    def __call__(self, img, mag=-1, rng=None):
        rng = _rng(rng)
        c = [0.1, 0.7, 1.3][mag % 3]
        f = float(rng.uniform(c, c + 0.6))
        return ImageEnhance.Color(img.convert("RGB")).enhance(f).convert(img.mode)


# ---------------- selector ----------------

GROUPS = {
    "warp": [Curve(), Distort(), Stretch()],
    "geometry": [Rotate(), Perspective(), Shrink()],
    "pattern": [VGrid(), HGrid(), Grid(), RectGrid(), EllipseGrid()],
    "noise": [GaussianNoise(), ShotNoise(), ImpulseNoise(), SpeckleNoise()],
    "blur": [GaussianBlur(), DefocusBlur(), MotionBlur(), GlassBlur(), ZoomBlur()],
    "camera": [Contrast(), Brightness(), JpegCompression(), Pixelate()],
    "weather": [Fog(), Snow(), Frost(), Rain(), Shadow()],
    "process": [Posterize(), Solarize(), Invert(), Equalize(), AutoContrast(),
                Sharpness(), Color()],
}


class RandAugment:
    """rand_aug semantics (dataset.py:332-345): choose `num_groups` groups
    without replacement, one random op each, random magnitude 0..2.
    `intact_prob` leaves the image untouched (dataset.py:323)."""

    def __init__(self, num_groups: int = 2, magnitude: Optional[int] = None,
                 intact_prob: float = 0.5,
                 groups: Optional[Sequence[str]] = None, seed: int = 0):
        self.group_names = list(groups or GROUPS.keys())
        self.num_groups = min(num_groups, len(self.group_names))
        self.magnitude = magnitude
        self.intact_prob = intact_prob
        self.rng = np.random.default_rng(seed)

    def __call__(self, img):
        """img: PIL Image or HWC uint8 numpy array (returned in kind)."""
        as_np = isinstance(img, np.ndarray)
        if as_np:
            arr = img
            img = Image.fromarray(arr[..., 0] if arr.shape[-1] == 1 else arr)
        if self.rng.uniform() >= self.intact_prob:
            chosen = self.rng.choice(self.group_names, self.num_groups,
                                     replace=False)
            for g in chosen:
                ops = GROUPS[g]
                op = ops[int(self.rng.integers(0, len(ops)))]
                mag = (self.magnitude if self.magnitude is not None
                       else int(self.rng.integers(0, 3)))
                img = op(img, mag=mag, rng=self.rng)
        if as_np:
            out = np.asarray(img)
            return out[..., None] if out.ndim == 2 else out
        return img
