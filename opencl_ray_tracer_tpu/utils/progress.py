"""Render progress reporting.

Replaces the reference's observability stack — the ``\\r`` progress line
(``main.cpp:267``) and the full-frame BMP rewritten after every block for
the Win32 window to poll (``main.cpp:263-265``, SURVEY.md L5) — with a
callback that prints progress and optionally dumps an incremental PNG
(headless TPU hosts have no window; any image viewer can watch the file).
"""

from __future__ import annotations

import sys
import time


class ProgressReporter:
    def __init__(self, image_path: str | None = None, every_s: float = 1.0,
                 stream=None):
        self.image_path = image_path
        self.every_s = every_s
        self.stream = stream or sys.stderr
        self._last_dump = 0.0

    def __call__(self, done: int, total: int, mean_img=None) -> None:
        pct = 100.0 * done / max(total, 1)
        self.stream.write(f"\rRendered {done} / {total} samples "
                          f"({pct:.0f}%)")
        self.stream.flush()
        if done >= total:
            self.stream.write("\n")
        now = time.time()
        if (self.image_path and mean_img is not None
                and (now - self._last_dump >= self.every_s or done >= total)):
            if self.image_path.endswith(".bmp"):
                # the reference's exact progress contract: a BMP any
                # poller (or its Win32 window) can reload every second
                # (main.cpp:263-265, window_utilities.cpp:97-99)
                from ..io import write_bmp
                write_bmp(self.image_path, mean_img)
            else:
                from ..io import tonemap_u8, write_png
                write_png(self.image_path, tonemap_u8(mean_img))
            self._last_dump = now
