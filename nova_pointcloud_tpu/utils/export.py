"""Export helpers: images, videos, point clouds.

Parity with `diffnext/utils/export_utils.py:27-47` (webp/PIL image save,
mp4 writer at fps=12) plus a PLY point-cloud writer for the pc frontend
(the reference renders matplotlib previews, `demo.py:448-531`).
"""

import os
from typing import Optional, Sequence

import numpy as np


def export_to_image(image, path: str, quality: int = 95):
    """Save a uint8 array or PIL image."""
    from PIL import Image

    if not hasattr(image, "save"):
        image = Image.fromarray(np.asarray(image))
    image.save(path, quality=quality)
    return path


def export_to_video(frames: Sequence[np.ndarray], path: str, fps: int = 12):
    """Write frames (T, H, W, 3 uint8) to mp4 (imageio/ffmpeg); hosts without
    an mp4 codec fall back to an animated GIF next to ``path`` (a real
    single-file artifact, so callers always get back an existing file)."""
    try:
        import imageio.v2 as imageio

        writer = imageio.get_writer(path, fps=fps)
        for f in frames:
            writer.append_data(np.asarray(f))
        writer.close()
        return path
    except Exception:
        from PIL import Image

        base, _ = os.path.splitext(path)
        gif = base + ".gif"
        imgs = [Image.fromarray(np.asarray(f)[..., :3]) for f in frames]
        imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                     duration=max(int(1000 / fps), 1), loop=0)
        return gif


def export_to_ply(points: np.ndarray, path: str,
                  colors: Optional[np.ndarray] = None):
    """ASCII PLY writer for (N, 3) points with optional (N, 3) [0,1] colors."""
    points = np.asarray(points, np.float32)
    n = len(points)
    has_color = colors is not None
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        if has_color:
            rgb = (np.asarray(colors) * 255).clip(0, 255).astype(np.uint8)
            for p, c in zip(points, rgb):
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")
        else:
            for p in points:
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
    return path
