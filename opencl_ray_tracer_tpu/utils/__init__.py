"""Diagnostics, timing, progress (reference L5/aux subsystems, headless)."""

from .device_info import device_info, print_device_info
from .timing import PhaseTimer, rays_per_second
from .progress import ProgressReporter

__all__ = ["device_info", "print_device_info", "PhaseTimer",
           "rays_per_second", "ProgressReporter"]
