"""Video frame import with GPX geotagging.

Mirrors reference `opensfm/video.py:12-120` (video_orientation,
import_video_with_gpx) using OpenCV's VideoCapture.
"""

from __future__ import annotations

import datetime
import logging
import os
from typing import List, Optional

logger = logging.getLogger(__name__)


def video_orientation(video_file: str) -> int:
    """EXIF-style orientation of a video (video.py:12-33); falls back to 1
    when no rotation metadata is accessible."""
    try:
        import cv2

        cap = cv2.VideoCapture(video_file)
        rotation = cap.get(getattr(cv2, "CAP_PROP_ORIENTATION_META", -1))
        cap.release()
        mapping = {0: 1, 90: 6, 180: 3, 270: 8}
        return mapping.get(int(rotation), 1)
    except Exception:
        return 1


def import_video_with_gpx(
    video_file: str,
    gpx_file: str,
    output_path: str,
    dx: float,
    dt: Optional[float] = None,
    start_time: Optional[str] = None,
    visual: bool = False,
    image_description: Optional[str] = None,
) -> List[str]:
    """Extract frames spaced by gpx distance dx, geotagged from the track
    (video.py:36-120)."""
    import cv2

    from opensfm_tpu import geotag_from_gpx

    points = geotag_from_gpx.get_lat_lon_time(gpx_file)
    if start_time:
        video_start_time = datetime.datetime.strptime(
            start_time, "%Y-%m-%dT%H:%M:%S"
        )
    else:
        try:
            exifdate = datetime.datetime.fromtimestamp(
                os.path.getmtime(video_file)
            )
        except OSError:
            exifdate = points[0][0] if points else datetime.datetime.now()
        video_start_time = exifdate

    os.makedirs(output_path, exist_ok=True)
    cap = cv2.VideoCapture(video_file)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0

    sampled = geotag_from_gpx.sample_gpx(points, dx, dt)
    image_files = []
    for i, point in enumerate(sampled):
        dt_sec = (point[0] - video_start_time).total_seconds()
        if dt_sec < 0:
            continue
        cap.set(cv2.CAP_PROP_POS_MSEC, dt_sec * 1000.0)
        ret, frame = cap.read()
        if not ret:
            continue
        filepath = os.path.join(output_path, f"{i:06d}.jpg")
        cv2.imwrite(filepath, frame)
        image_files.append(filepath)
    cap.release()
    logger.info("Imported %d frames from %s", len(image_files), video_file)
    return image_files
