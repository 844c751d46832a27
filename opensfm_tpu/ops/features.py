"""Difference-of-Gaussians detector + SIFT-class descriptors in JAX.

TPU-native replacement for the reference's VLFeat HAHOG
(pyfeatures.hahog, features/src/hahog.cc:1-206): the scale-space is built
with separable Gaussian convolutions (MXU/VPU), extrema detection is
max-pooling, and per-keypoint orientation/descriptor computation is a
batched gather + reduction over fixed-size patches — all with static shapes
(fixed top-K keypoints per octave) so a single jit serves every image of a
given processing size.

v1 simplifications vs exact SIFT/HAHOG (documented, revisit for parity):
- single dominant orientation per keypoint;
- descriptor grid is axis-aligned; orientation normalization rotates the
  gradient-orientation bins only (fine for mostly-upright capture).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_SCALES = 3  # scales per octave where extrema are detected
PATCH = 16  # descriptor patch size (octave pixels)
N_ORI_BINS = 36
DESC_SPATIAL = 4
DESC_ORI = 8


def _gaussian_kernel(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _sep_blur(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur of [H, W] via two 1D convolutions."""
    k = jnp.asarray(kernel, dtype=img.dtype)
    pad = (len(kernel) - 1) // 2
    x = img[None, None, :, :]
    kx = k[None, None, None, :]
    ky = k[None, None, :, None]
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), [(0, 0), (pad, pad)])
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), [(pad, pad), (0, 0)])
    return x[0, 0]


def _maxpool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 max-pool (same size)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )


def _minpool3(x: jnp.ndarray) -> jnp.ndarray:
    return -jax.lax.reduce_window(
        -x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )


@partial(
    jax.jit,
    static_argnames=("k_per_octave", "n_octaves", "edge_threshold"),
)
def detect_and_describe(
    image: jnp.ndarray,  # [H, W] float32 grayscale in [0, 1]
    peak_threshold: float,
    k_per_octave: int,
    n_octaves: int,
    edge_threshold: float = 10.0,
):
    """Detect DoG keypoints and compute 128-d descriptors.

    Returns (points[N, 4] (x_px, y_px, size_px, angle_deg in full-image
    pixel coords), descriptors[N, 128], valid[N]) with
    N = k_per_octave * n_octaves.
    """
    dtype = image.dtype
    sigma0 = 1.6
    k_step = 2.0 ** (1.0 / N_SCALES)
    base = _sep_blur(image, _gaussian_kernel(sigma0, 4))

    all_pts = []
    all_desc = []
    all_valid = []

    octave_img = base
    for octave in range(n_octaves):
        H, W = octave_img.shape
        # Gaussian stack: N_SCALES + 3 levels.
        gauss = [octave_img]
        sig_prev = sigma0
        for s in range(1, N_SCALES + 3):
            sig_total = sigma0 * (k_step**s)
            sig_extra = float(np.sqrt(max(sig_total**2 - sig_prev**2, 1e-6)))
            radius = max(int(3.0 * sig_extra + 0.5), 1)
            gauss.append(_sep_blur(gauss[-1], _gaussian_kernel(sig_extra, radius)))
            sig_prev = sig_total
        dogs = [gauss[i + 1] - gauss[i] for i in range(N_SCALES + 2)]

        # Per-scale gradient maps for orientation/descriptor sampling.
        mags, oris = [], []
        for s in range(N_SCALES + 2):
            g = gauss[s]
            gx = jnp.gradient(g, axis=1)
            gy = jnp.gradient(g, axis=0)
            mags.append(jnp.sqrt(gx * gx + gy * gy))
            oris.append(jnp.arctan2(gy, gx))  # [-pi, pi]

        for s in range(1, N_SCALES + 1):
            mag, ori = mags[s], oris[s]
            d_prev, d_cur, d_next = dogs[s - 1], dogs[s], dogs[s + 1]
            mx = jnp.maximum(jnp.maximum(_maxpool3(d_prev), _maxpool3(d_next)),
                             _maxpool3(d_cur))
            mn = jnp.minimum(jnp.minimum(_minpool3(d_prev), _minpool3(d_next)),
                             _minpool3(d_cur))
            is_max = (d_cur >= mx) & (d_cur > peak_threshold)
            is_min = (d_cur <= mn) & (d_cur < -peak_threshold)

            # Edge rejection via the 2x2 Hessian of the DoG.
            dxx = jnp.roll(d_cur, -1, 1) + jnp.roll(d_cur, 1, 1) - 2 * d_cur
            dyy = jnp.roll(d_cur, -1, 0) + jnp.roll(d_cur, 1, 0) - 2 * d_cur
            dxy = 0.25 * (
                jnp.roll(jnp.roll(d_cur, -1, 0), -1, 1)
                + jnp.roll(jnp.roll(d_cur, 1, 0), 1, 1)
                - jnp.roll(jnp.roll(d_cur, -1, 0), 1, 1)
                - jnp.roll(jnp.roll(d_cur, 1, 0), -1, 1)
            )
            tr = dxx + dyy
            det = dxx * dyy - dxy * dxy
            r = edge_threshold
            edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)

            candidate = (is_max | is_min) & edge_ok
            # Exclude borders (descriptor patch must fit).
            border = PATCH // 2 + 1
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            inside = (
                (row_ids >= border) & (row_ids < H - border)
                & (col_ids >= border) & (col_ids < W - border)
            )
            candidate = candidate & inside

            response = jnp.where(candidate, jnp.abs(d_cur), 0.0)
            k_scale = max(k_per_octave // N_SCALES, 1)
            vals, idx = jax.lax.top_k(response.reshape(-1), k_scale)
            ys = idx // W
            xs = idx % W
            valid = vals > 0.0

            # --- patch sampling (scale-adaptive, bilinear) -------------------
            half = PATCH // 2
            m_s = float(k_step ** (s - 1))  # within-octave support scaling
            offs = (np.arange(-half, half) + 0.5) * m_s
            dyf = jnp.asarray(offs.astype(np.float32), dtype=dtype)
            gy_f = ys.astype(dtype)[:, None, None] + dyf[None, :, None]
            gx_f = xs.astype(dtype)[:, None, None] + dyf[None, None, :]
            y0 = jnp.clip(jnp.floor(gy_f).astype(jnp.int32), 0, H - 2)
            x0 = jnp.clip(jnp.floor(gx_f).astype(jnp.int32), 0, W - 2)
            fy = jnp.clip(gy_f - y0.astype(dtype), 0.0, 1.0)
            fx = jnp.clip(gx_f - x0.astype(dtype), 0.0, 1.0)

            def bilerp(img2d):
                v00 = img2d[y0, x0]
                v01 = img2d[y0, x0 + 1]
                v10 = img2d[y0 + 1, x0]
                v11 = img2d[y0 + 1, x0 + 1]
                return (
                    v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
                    + v10 * fy * (1 - fx) + v11 * fy * fx
                )

            pm = bilerp(mag)  # [K,16,16]
            # Orientation interpolated via its sin/cos (angles don't lerp).
            po = jnp.arctan2(bilerp(jnp.sin(ori)), bilerp(jnp.cos(ori)))

            # Gaussian window over the patch.
            wy = jnp.asarray(
                np.exp(-0.5 * (np.arange(-half, half) + 0.5) ** 2
                       / (0.5 * PATCH) ** 2),
                dtype=dtype,
            )
            w2d = wy[:, None] * wy[None, :]
            wmag = (pm * w2d[None]).reshape(-1, PATCH * PATCH)  # [K,256]

            # --- orientation histogram (soft binning) ------------------------
            ang = (po.reshape(-1, PATCH * PATCH) + jnp.pi) / (2 * jnp.pi) * N_ORI_BINS
            b0 = jnp.floor(ang - 0.5).astype(jnp.int32)
            w1 = ang - 0.5 - b0.astype(dtype)
            b0 = b0 % N_ORI_BINS
            b1 = (b0 + 1) % N_ORI_BINS
            hist = jax.vmap(
                lambda i0, i1, wa, wb: jnp.zeros(N_ORI_BINS, dtype=dtype)
                .at[i0].add(wa).at[i1].add(wb)
            )(b0, b1, wmag * (1 - w1), wmag * w1)
            hist = (
                hist + 0.5 * (jnp.roll(hist, 1, axis=1) + jnp.roll(hist, -1, axis=1))
            ) / 2.0
            theta_bin = jnp.argmax(hist, axis=1)
            theta = (theta_bin.astype(dtype) + 0.5) / N_ORI_BINS * 2 * jnp.pi - jnp.pi

            # --- descriptor: trilinear soft binning --------------------------
            # Fixed spatial soft-assignment [256, 16] (axis-aligned grid).
            cell_w = PATCH / DESC_SPATIAL
            pos = np.arange(PATCH) + 0.5
            cell_coord = pos / cell_w - 0.5  # in [-0.5, 3.5]
            c0 = np.floor(cell_coord).astype(np.int64)
            cw1 = cell_coord - c0
            Wsp1d = np.zeros((PATCH, DESC_SPATIAL), dtype=np.float32)
            for p in range(PATCH):
                if 0 <= c0[p] < DESC_SPATIAL:
                    Wsp1d[p, c0[p]] = 1 - cw1[p]
                if 0 <= c0[p] + 1 < DESC_SPATIAL:
                    Wsp1d[p, c0[p] + 1] = cw1[p]
            Wspatial = np.einsum("ya,xb->yxab", Wsp1d, Wsp1d).reshape(
                PATCH * PATCH, DESC_SPATIAL * DESC_SPATIAL
            )
            Wspatial = jnp.asarray(Wspatial, dtype=dtype)  # [256, 16]

            rel = (po.reshape(-1, PATCH * PATCH) - theta[:, None] + 3 * jnp.pi) % (
                2 * jnp.pi
            )
            oang = rel / (2 * jnp.pi) * DESC_ORI
            ob0 = jnp.floor(oang - 0.5).astype(jnp.int32)
            ow1 = oang - 0.5 - ob0.astype(dtype)
            ob0 = ob0 % DESC_ORI
            ob1 = (ob0 + 1) % DESC_ORI
            # Soft orientation assignment [K, 256, 8].
            Oass = jax.vmap(
                lambda i0, i1, wa, wb: jnp.zeros(
                    (PATCH * PATCH, DESC_ORI), dtype=dtype
                )
                .at[jnp.arange(PATCH * PATCH), i0].add(wa)
                .at[jnp.arange(PATCH * PATCH), i1].add(wb)
            )(ob0, ob1, wmag * (1 - ow1), wmag * ow1)
            desc = jnp.einsum("pc,kpo->kco", Wspatial, Oass).reshape(-1, 128)

            # SIFT normalization: L2, clip 0.2, renormalize.
            norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
            desc = desc / jnp.maximum(norm, 1e-12)
            desc = jnp.minimum(desc, 0.2)
            norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
            desc = desc / jnp.maximum(norm, 1e-12)

            scale_px = sigma0 * (k_step**s) * (2.0**octave) * 2.0
            pts = jnp.stack(
                [
                    xs.astype(dtype) * (2.0**octave),
                    ys.astype(dtype) * (2.0**octave),
                    jnp.full(xs.shape, scale_px, dtype=dtype),
                    jnp.degrees(theta),
                ],
                axis=1,
            )
            all_pts.append(pts)
            all_desc.append(desc)
            all_valid.append(valid)

        # Next octave: downsample the 2x-blurred level.
        octave_img = gauss[N_SCALES][::2, ::2]

    return (
        jnp.concatenate(all_pts),
        jnp.concatenate(all_desc),
        jnp.concatenate(all_valid),
    )


def extract_dog_features(
    image_gray: np.ndarray,
    peak_threshold: float = 0.01,
    target_features: int = 4000,
    upsample: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: pad to a static bucket, run the jitted detector, strip
    invalid keypoints.  Returns (points[N,4] pixel coords, desc[N,128]).

    `upsample` doubles the image first (standard SIFT -1 octave), roughly
    tripling the number of fine-scale keypoints."""
    import cv2

    img = np.asarray(image_gray, dtype=np.float32)
    if img.max() > 2.0:
        img = img / 255.0
    H0, W0 = img.shape
    factor = 2.0 if upsample else 1.0
    if upsample:
        img = cv2.resize(img, (W0 * 2, H0 * 2), interpolation=cv2.INTER_LINEAR)
    H, W = img.shape
    # Pad to multiples of 128 so a few buckets serve all images.
    H_pad = ((H + 127) // 128) * 128
    W_pad = ((W + 127) // 128) * 128
    padded = np.zeros((H_pad, W_pad), dtype=np.float32)
    padded[:H, :W] = img

    n_octaves = max(int(np.log2(min(H, W) / 32)), 1)
    n_octaves = min(n_octaves, 6)
    k_per_octave = int(target_features * 3 // n_octaves)

    pts, desc, valid = detect_and_describe(
        jnp.asarray(padded), float(peak_threshold), k_per_octave, n_octaves
    )
    pts = np.asarray(pts)
    desc = np.asarray(desc)
    valid = np.asarray(valid)
    # Drop padding-area detections and invalid slots; undo the upsampling.
    keep = valid & (pts[:, 0] < W) & (pts[:, 1] < H)
    pts = pts[keep]
    pts[:, :3] = pts[:, :3] / factor
    return pts, desc[keep]
