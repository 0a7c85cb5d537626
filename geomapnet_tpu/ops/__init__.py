"""Device-side data ops: fused image preprocessing (resize/normalize),
Bayer demosaic, undistortion."""
