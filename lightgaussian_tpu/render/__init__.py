"""Rendering drivers: camera sets, trajectory videos, pose generation."""
from lightgaussian_tpu.render.poses import (  # noqa: F401
    camera_from_w2c,
    circular_pose,
    gaussian_pose,
    generate_ellipse_path,
    generate_spherical_sample_path,
    generate_spiral_path,
)
from lightgaussian_tpu.render.sets import render_set, render_trajectory, save_png  # noqa: F401
