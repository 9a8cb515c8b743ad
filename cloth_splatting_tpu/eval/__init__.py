"""Evaluation: NVS metrics (PSNR/SSIM/LPIPS), tracking MTE, render sets."""
