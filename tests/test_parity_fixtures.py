"""Eval-metric parity against committed reference-layout fixtures.

SURVEY §4 test plan (e): run our evaluation metric path on .npy dumps in the
reference's channel-first layout (gcp/evaluation/compute_metrics.py:199-226)
and check PSNR/SSIM/MSE against float64 golden values to 1e-4. Fixtures +
goldens are committed; tests/fixtures/make_parity_fixtures.py regenerates
them (independent NumPy oracle of the published metric formulas).
"""
import os

import numpy as np
import pytest

from video_gcp_tpu.core.metrics import mse, psnr, ssim

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def fixture_data():
    gt_cf = np.load(os.path.join(FIXDIR, "gt_seq.npy"))  # [B, T, C, H, W]
    gen_cf = np.load(os.path.join(FIXDIR, "gen_images.npy"))
    end_ind = np.load(os.path.join(FIXDIR, "end_ind.npy"))
    golden = dict(np.load(os.path.join(FIXDIR, "golden_metrics.npz")))
    # reference layout -> framework NHWC
    gt = gt_cf.transpose(0, 1, 3, 4, 2)
    gen = gen_cf.transpose(0, 1, 3, 4, 2)
    return gt, gen, end_ind, golden


def _protocol_mean(per_frame, end_ind):
    """Evaluator protocol: crop first/last (conditioning) frames, average the
    rest (compute_metrics.py:119-141 / evaluator.py eval_sample)."""
    t = per_frame.shape[1]
    t_idx = np.arange(t)[None, :]
    valid = (t_idx >= 1) & (t_idx <= end_ind[:, None] - 1)
    return (per_frame * valid).sum(1) / valid.sum(1)


@pytest.mark.parametrize("name,fn", [("mse", mse), ("psnr", psnr),
                                     ("ssim", ssim)])
def test_metric_parity(fixture_data, name, fn):
    gt, gen, end_ind, golden = fixture_data
    per_frame = np.asarray(fn(gen, gt))
    ours = _protocol_mean(per_frame, end_ind)
    np.testing.assert_allclose(ours, golden[name], atol=1e-4, rtol=1e-4)


def test_fixture_layout_is_channel_first():
    """The committed dumps must stay in the reference layout so the offline
    FVD/LPIPS tools (and the reference's own scripts) consume them as-is."""
    gt_cf = np.load(os.path.join(FIXDIR, "gt_seq.npy"))
    assert gt_cf.ndim == 5 and gt_cf.shape[2] == 3  # [B, T, C, H, W]
