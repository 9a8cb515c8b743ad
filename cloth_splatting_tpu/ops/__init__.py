"""Math / kernel primitives: SH evaluation, quaternions, SSIM, cameras, kNN, rasterization."""
