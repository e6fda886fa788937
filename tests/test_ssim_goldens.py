"""
SSIM golden cross-check (VERDICT r4 'Next round' #4).

Every quality headline in BENCHMARKS.md flows through
utils/evaluation.py::compute_ssim_sample, whose pure-numpy SSIM stands in
for the reference's skimage.metrics.structural_similarity
(/root/reference/src/utils/evaluation_utils.py:64-91; skimage is MISSING in
this image). These tests pin it against values derived BY HAND from the
Wang et al. (2004) formula on analytic images whose per-window statistics
are closed-form — the golden path below does no filtering at all, so a
defect in the window accumulation, the crop, the sample-covariance
normalization, or the constants cannot hide.

skimage-default conventions being certified (gaussian_weights=False):
  - 7x7 uniform windows, scores averaged over the CROPPED interior (pad =
    (win-1)//2 removed per side), so only fully-in-bounds windows count;
  - K1=0.01, K2=0.03, C = (K*data_range)^2;
  - variances/covariance use the sample correction cov_norm = NP/(NP-1)
    with NP = win^ndim (skimage's cov_norm).
"""

import numpy as np
import pytest

from fmdm_tpu.utils.evaluation import compute_ssim_sample, ssim

K1, K2 = 0.01, 0.03
WIN = 7


def wang_ssim(mu_x, mu_y, vx, vy, vxy, data_range=1.0):
    """The Wang et al. SSIM of one window from its (sample-corrected)
    statistics — the formula itself, nothing else."""
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    return ((2 * mu_x * mu_y + C1) * (2 * vxy + C2)) / (
        (mu_x**2 + mu_y**2 + C1) * (vx + vy + C2)
    )


def test_identical_images_score_one():
    rng = np.random.default_rng(0)
    im = rng.random((24, 24))
    assert ssim(im, im) == pytest.approx(1.0, abs=1e-12)


def test_constant_images_closed_form():
    """Constant a vs constant b: every window has mu_x=a, mu_y=b and zero
    variance/covariance, so SSIM = (2ab+C1)/(a^2+b^2+C1) exactly (the
    structure/contrast factor is C2/C2 = 1)."""
    a, b = 0.25, 0.75
    im1 = np.full((16, 16), a)
    im2 = np.full((16, 16), b)
    C1 = (K1 * 1.0) ** 2
    want = (2 * a * b + C1) / (a**2 + b**2 + C1)
    assert ssim(im1, im2, data_range=1.0) == pytest.approx(want, rel=1e-12)
    # 3D: the same closed form must hold voxel-wise (win^3 windows)
    v1 = np.full((9, 9, 9), a)
    v2 = np.full((9, 9, 9), b)
    assert ssim(v1, v2, data_range=1.0) == pytest.approx(want, rel=1e-12)


def _ramp_window_var(g):
    """Sample-corrected variance of a 7x7 window of a column ramp g*j:
    values g*(j+k), k=-3..3, each appearing 7 times. Population variance is
    g^2 * mean(k^2) = g^2 * (28/7) = 4 g^2; skimage's cov_norm multiplies by
    NP/(NP-1) = 49/48."""
    return (49.0 / 48.0) * 4.0 * g * g


def test_affine_ramp_closed_form():
    """im1 = g*j (column ramp), im2 = alpha*im1 + beta. Interior-window
    statistics are closed-form: mu_x = g*j at center column j,
    vx = (49/48)*4g^2, vy = alpha^2*vx, vxy = alpha*vx. The cropped mean is
    the average of the per-column Wang scores over j in [3, W-4]."""
    g, alpha, beta = 0.02, 0.8, 0.1
    H = W = 20
    j = np.arange(W, dtype=np.float64)
    im1 = np.broadcast_to(g * j, (H, W)).copy()
    im2 = alpha * im1 + beta

    vx = _ramp_window_var(g)
    scores = []
    for jc in range(3, W - 3):
        mu_x = g * jc
        mu_y = alpha * mu_x + beta
        scores.append(wang_ssim(mu_x, mu_y, vx, alpha**2 * vx, alpha * vx))
    want = float(np.mean(scores))
    assert ssim(im1, im2, data_range=1.0) == pytest.approx(want, rel=1e-10)


def test_orthogonal_ramps_closed_form():
    """im1 ramps along columns, im2 along rows: per window vxy = 0 exactly
    (k_i and k_j are independent over the 7x7 grid), variances as in the
    ramp case, means g*j and g*i — the structure term collapses to
    C2/(2v+C2)."""
    g = 0.03
    H = W = 18
    j = np.arange(W, dtype=np.float64)
    im1 = np.broadcast_to(g * j, (H, W)).copy()
    im2 = im1.T.copy()

    v = _ramp_window_var(g)
    scores = []
    for ic in range(3, H - 3):
        for jc in range(3, W - 3):
            scores.append(wang_ssim(g * jc, g * ic, v, v, 0.0))
    want = float(np.mean(scores))
    assert ssim(im1, im2, data_range=1.0) == pytest.approx(want, rel=1e-10)


def test_constant_offset_on_ramp_closed_form():
    """im2 = im1 + c on a ramp: variances and covariance all equal, so the
    structure/contrast factor is (2v+C2)/(2v+C2) = 1 and only the luminance
    term differs per column."""
    g, c = 0.01, 0.2
    H = W = 20
    j = np.arange(W, dtype=np.float64)
    im1 = np.broadcast_to(g * j, (H, W)).copy()
    im2 = im1 + c

    v = _ramp_window_var(g)
    scores = []
    for jc in range(3, W - 3):
        mu_x = g * jc
        scores.append(wang_ssim(mu_x, mu_x + c, v, v, v))
    want = float(np.mean(scores))
    assert ssim(im1, im2, data_range=1.0) == pytest.approx(want, rel=1e-10)


def test_data_range_scales_constants():
    """Doubling data_range must equal evaluating the formula with C(2.0)
    constants — checked on the constant-image closed form."""
    a, b = 0.5, 1.5
    im1 = np.full((16, 16), a)
    im2 = np.full((16, 16), b)
    C1 = (K1 * 2.0) ** 2
    want = (2 * a * b + C1) / (a**2 + b**2 + C1)
    assert ssim(im1, im2, data_range=2.0) == pytest.approx(want, rel=1e-12)


def test_compute_ssim_sample_channel_mean():
    """compute_ssim_sample averages per-channel SSIM (reference
    evaluation_utils.py:64-91 semantics): two channels with hand-derivable
    scores must average exactly."""
    a1, b1 = 0.25, 0.75   # channel 0: constants
    ch0_pred = np.full((16, 16), a1, np.float32)
    ch0_tgt = np.full((16, 16), b1, np.float32)
    ch1 = np.random.default_rng(1).random((16, 16)).astype(np.float32)

    pred = np.stack([ch0_pred, ch1])
    tgt = np.stack([ch0_tgt, ch1])
    C1 = (K1 * 1.0) ** 2
    want0 = (2 * a1 * b1 + C1) / (a1**2 + b1**2 + C1)
    got = compute_ssim_sample(pred, tgt)
    # f32 inputs: the identical channel scores 1.0, channel 0 the closed form
    assert got == pytest.approx((want0 + 1.0) / 2.0, rel=1e-5)


def test_ssim_monotone_in_noise():
    """Sanity ordering every SSIM must satisfy: more noise, lower score."""
    rng = np.random.default_rng(2)
    base = rng.random((32, 32))
    scores = [ssim(base, base + eps * rng.standard_normal(base.shape))
              for eps in (0.01, 0.05, 0.2)]
    assert scores[0] > scores[1] > scores[2]
