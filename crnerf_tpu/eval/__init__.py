"""Evaluation protocol utilities: right-half PSNR/SSIM/LPIPS scoring
(reference eval_metric.py, SURVEY.md §2.6)."""

from crnerf_tpu.train.metrics import mse, psnr, ssim, ssim_map  # noqa: F401
