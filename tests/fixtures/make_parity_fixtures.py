"""Generate the committed eval-parity fixtures + float64 golden metrics.

Writes reference-layout .npy dumps (channel-first [B, T, C, H, W], the layout
gcp/evaluation/compute_metrics.py:199-226 produces and its offline FVD/LPIPS
tools consume) plus golden PSNR/SSIM/MSE values computed by an independent
float64 NumPy oracle of the published formulas (Wang et al. SSIM: 11x11
Gaussian window sigma 1.5, C1=0.01^2, C2=0.03^2 on [0, 1] images; PSNR with
peak 1.0). Run once from the repo root:

    python tests/fixtures/make_parity_fixtures.py

The goldens guard the whole metric path: if our device metrics or the
evaluator protocol (crop first/last, pad masking) drift, the parity test
fails at 1e-4.
"""
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _smooth(rng, b, t, h, w, c):
    """Piecewise-smooth video in [-1, 1] (pure noise makes SSIM degenerate)."""
    base = rng.uniform(-1, 1, size=(b, t, h // 4, w // 4, c))
    up = base.repeat(4, axis=2).repeat(4, axis=3)
    noise = 0.1 * rng.standard_normal((b, t, h, w, c))
    return np.clip(up + noise, -1, 1)


def gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def filt2d(img, kern):
    """Valid-mode 2-D correlation, float64, one channel."""
    kh, kw = kern.shape
    h, w = img.shape
    out = np.zeros((h - kh + 1, w - kw + 1))
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            out[i, j] = (img[i:i + kh, j:j + kw] * kern).sum()
    return out


def ssim_oracle(p, t):
    """[H, W, C] in [0, 1] -> scalar SSIM."""
    kern = gaussian_kernel()
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    vals = []
    for ch in range(p.shape[-1]):
        x, y = p[..., ch], t[..., ch]
        mx, my = filt2d(x, kern), filt2d(y, kern)
        vx = filt2d(x * x, kern) - mx ** 2
        vy = filt2d(y * y, kern) - my ** 2
        vxy = filt2d(x * y, kern) - mx * my
        s = ((2 * mx * my + c1) * (2 * vxy + c2)) / (
            (mx ** 2 + my ** 2 + c1) * (vx + vy + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def main():
    rng = np.random.default_rng(0)
    b, t, h, w, c = 3, 10, 16, 16, 3
    gt = _smooth(rng, b, t, h, w, c)
    # gen = corrupted gt so metrics are non-trivial
    gen = np.clip(gt + 0.2 * rng.standard_normal(gt.shape), -1, 1)
    end_ind = np.array([9, 7, 5])

    # reference channel-first dump layout
    np.save(os.path.join(HERE, "gt_seq.npy"),
            gt.transpose(0, 1, 4, 2, 3).astype(np.float32))
    np.save(os.path.join(HERE, "gen_images.npy"),
            gen.transpose(0, 1, 4, 2, 3).astype(np.float32))
    np.save(os.path.join(HERE, "end_ind.npy"), end_ind)

    # golden per-frame metrics (float64 oracle), protocol: crop first + last
    # conditioning frames, average over valid frames (compute_metrics.py:119-141)
    per_seq = {"mse": [], "psnr": [], "ssim": []}
    for i in range(b):
        ms, ps, ss = [], [], []
        for k in range(1, int(end_ind[i])):
            p01 = (gen[i, k].astype(np.float64) + 1) / 2
            t01 = (gt[i, k].astype(np.float64) + 1) / 2
            m = ((p01 - t01) ** 2).mean()
            ms.append(m)
            ps.append(-10 * np.log10(m + 1e-10))
            ss.append(ssim_oracle(p01, t01))
        per_seq["mse"].append(np.mean(ms))
        per_seq["psnr"].append(np.mean(ps))
        per_seq["ssim"].append(np.mean(ss))
    np.savez(os.path.join(HERE, "golden_metrics.npz"),
             **{k: np.array(v) for k, v in per_seq.items()})
    for k, v in per_seq.items():
        print(k, np.array(v))


if __name__ == "__main__":
    main()
